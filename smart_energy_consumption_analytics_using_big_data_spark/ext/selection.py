"""Importance-based training-data selection (DSIR-style).

Implements the hashed n-gram importance-resampling recipe of
"Data Selection for Language Models via Importance Resampling"
(Xie et al., 2023): score every raw document by how target-like its
hashed token distribution is — sum over tokens of
log( p_target(bucket) / p_raw(bucket) ) with Laplace smoothing — then
keep the highest-weight documents.

Scale design (100 TB corpus):

* bucket counts are ONE scan + one B-row aggregate (B = n_buckets,
  e.g. 1024) with map-side partial aggregation absorbing the token
  blowup; the resulting log-ratio table is dimension-sized and
  broadcast;
* document scores are a second scan joined map-side against the
  broadcast ratio table — no shuffle of the token stream at all; the
  only full shuffle is the final per-document sum keyed by doc id;
* everything is JVM column math (split/explode/md5/conv); the md5
  bucket hash is portable to the SQL oracle
  (`CAST(concat('0x', substr(md5(token),1,8)) AS BIGINT)` in DuckDB).

The reference has no data-selection surface; this extends SURVEY.md
SS7's LLM-pipeline family alongside quality filtering and mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(token: Column, n_buckets: int) -> Column:
    """Deterministic md5 hash bucket in [0, n_buckets) — oracle-portable."""
    h = F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def dsir_log_ratios(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket smoothed log( p_target / p_raw ) over hashed tokens.

    One scan: explode whitespace tokens, bucket them, count target vs
    all occurrences per bucket, then Laplace-smooth both distributions
    ((c+1)/(total+B)). Output is at most `n_buckets` rows — broadcast
    it into the scoring join.
    """
    toks = docs.select(
        is_target.cast("int").alias("__t"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    )
    counts = toks.groupBy(_bucket(F.col("__tok"), n_buckets).alias("bucket")).agg(
        F.sum("__t").alias("n_target"), F.count(F.lit(1)).alias("n_raw")
    )
    totals = counts.agg(
        F.sum("n_target").alias("__T"), F.sum("n_raw").alias("__R")
    )
    b = float(n_buckets)
    # round to 12 dp before any cross-row summation: ln() may differ in
    # the last ulp across engines, and downstream sums must be
    # order-independent (same trick as q_text_logprob).
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("n_target") + 1) / (F.col("__T") + b))
            - F.log((F.col("n_raw") + 1) / (F.col("__R") + b)),
            12,
        ).alias("log_ratio"),
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight.

    Weight(doc) = MEAN over its tokens of the bucket log-ratio (the
    per-token normalization removes the length bias a raw sum has:
    common-token mass makes every log-ratio slightly negative, so
    longer documents would always lose). Ties break on the document id
    so selection is deterministic. The log-ratio table broadcasts; the
    per-document aggregate is the only shuffle; TakeOrdered picks k
    without a global sort.
    """
    ratios = dsir_log_ratios(docs, is_target, n_buckets, text_col)
    scored = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
        .withColumn("bucket", _bucket(F.col("__tok"), n_buckets))
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("log_ratio").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dsir_weight")
        )
    )
    return scored.orderBy(F.desc("dsir_weight"), F.asc(id_col)).limit(k)
