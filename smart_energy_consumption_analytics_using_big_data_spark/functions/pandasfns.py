"""Arrow-batched Pandas UDF surface (SURVEY.md SS2.11 D2).

The reference has no UDAF/UDTF; these demonstrate the engine's escape
hatch for semantics the built-ins can't express: a GROUPED_AGG pandas
UDF (vectorized aggregate) and a grouped applyInPandas transform.
Both move data via Arrow record batches - never row-at-a-time Python.

Use sparingly: every built-in expression in this engine beats these by
10-100x; they exist for genuinely custom math.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    total = float(weights.sum())
    if total == 0.0:
        return float("nan")
    return float((values * weights).sum() / total)


# DoubleType() (not a DDL string) so module import needs no active session
from pyspark.sql.functions import PandasUDFType  # noqa: E402

weighted_mean_udaf = pandas_udf(
    _weighted_mean, returnType=DoubleType(), functionType=PandasUDFType.GROUPED_AGG
)


def grouped_weighted_mean(
    df: DataFrame, key: str, value: str, weight: str, out: str = "wmean"
) -> DataFrame:
    """groupBy + vectorized UDAF; partial aggregation happens per Arrow
    batch, then per group - same shuffle shape as a built-in agg."""
    return df.groupBy(key).agg(weighted_mean_udaf(F.col(value), F.col(weight)).alias(out))


def normalize_per_group(
    df: DataFrame, key: str, value: str, out_schema: str
) -> DataFrame:
    """applyInPandas: per-group min-max normalization - the grouped-map
    shape (one pandas frame per group, Arrow both ways). Groups must
    fit in executor memory; partition by a bounded-cardinality key."""

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value].min(), pdf[value].max()
        span = (hi - lo) or 1.0
        pdf = pdf.copy()
        pdf["normalized"] = (pdf[value] - lo) / span
        return pdf

    return df.groupBy(key).applyInPandas(_norm, schema=out_schema)


def sentence_split_udtf():
    """Python UDTF (Spark 4 table function): text -> one row per
    sentence with its index and whitespace token count — the
    row-EXPANDING escape hatch (pandas UDFs are 1:1, applyInPandas is
    per-group; a UDTF yields arbitrarily many rows per input). Returns
    the decorated class; register with spark.udtf.register or call
    directly over a column.

    Scale note: UDTFs execute per input PARTITION with Arrow transfer
    like any Python UDF — fine for a bounded expansion like sentence
    splitting, but prefer native explode(split(...)) when the split
    rule is expressible (this one exists for the '.'/'?'/'!' +
    abbreviation-guard logic regexes can't cleanly do in one pass).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_tokens int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            buf, idx = [], 0
            for ch in text:
                buf.append(ch)
                if ch in ".?!":
                    s = "".join(buf).strip()
                    if s:
                        yield idx, s, len(s.split())
                        idx += 1
                    buf = []
            tail = "".join(buf).strip()
            if tail:
                yield idx, tail, len(tail.split())

    return SentenceSplit
