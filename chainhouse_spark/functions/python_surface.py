"""Python extension surface: UDTF and grouped-aggregate pandas UDF
(SURVEY.md §2.6 — the UDF/UDAF/UDTF row of the parity table).

These exist to prove the full extension API works end-to-end, with the usual
caveat stated in each docstring: anything SQL can express natively should be
(the UDTF here is deliberately also SQL-expressible so it can be
oracle-checked; the grouped UDAF is the genuinely-custom case).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="token: string, n: int")
class TokenCounts:
    """UDTF: one (token, count) row per distinct token of the input text.

    Lateral-joinable: `SELECT doc_id, t.* FROM docs, LATERAL token_counts(text) t`.
    SQL could express this (explode + groupBy) — which is exactly why it is
    used for the oracle-checked UDTF query: the API is proven against the
    declarative equivalent.
    """

    def eval(self, text: str):
        if text is None:
            return
        counts: dict[str, int] = {}
        for tok in text.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
        for tok in sorted(counts):
            yield tok, counts[tok]


@pandas_udf(DoubleType())
def gmean_value(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (the Python UDAF form): geometric mean
    of positive values. Values are sorted before the log-sum so the float
    reduction order is deterministic across partitionings/retries."""
    import numpy as np

    x = np.sort(v.to_numpy(dtype="float64"))
    x = x[x > 0]
    if x.size == 0:
        return float("nan")
    return float(np.exp(np.log(x).sum() / x.size))
