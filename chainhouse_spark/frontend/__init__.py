from chainhouse_spark.frontend.ch_dialect import (  # noqa: F401
    CHTranslationError,
    ch_sql,
    translate_ch_sql,
)
