"""Plan introspection and scale audits over Catalyst physical plans."""

from chainhouse_spark.plans.audit import audit, explain_formatted, plan_facts  # noqa: F401
