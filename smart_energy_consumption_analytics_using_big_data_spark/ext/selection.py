"""Importance-based training-data selection (DSIR-style).

Implements the hashed n-gram importance-resampling recipe of
"Data Selection for Language Models via Importance Resampling"
(Xie et al., 2023): score every raw document by how target-like its
hashed token distribution is — sum over tokens of
log( p_target(bucket) / p_raw(bucket) ) with Laplace smoothing — then
keep the highest-weight documents.

Scale design (100 TB corpus):

* the token stream is exploded ONCE and immediately compacted to
  per-(document, bucket) counts — at most min(n_tokens, B) rows per
  document (B = n_buckets, e.g. 1024) — with map-side partial
  aggregation absorbing the token blowup; both the ratio estimate and
  the scoring read this compacted table (persisted), never the raw
  token stream again;
* the log-ratio table is B rows — dimension-sized — and broadcast
  into the scoring join; the only full shuffles key on (doc, bucket)
  and doc;
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


def doc_bucket_counts(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, __t, bucket, n): the ONE token-level pass, compacted.

    Explode whitespace tokens, bucket them, count per (document,
    bucket). Every downstream DSIR stage reads this table instead of
    re-exploding the corpus; its size is bounded by
    sum_over_docs(min(n_tokens, n_buckets)) rows.
    """
    return (
        docs.select(
            F.col(id_col),
            is_target.cast("int").alias("__t"),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .groupBy(id_col, "__t", _bucket(F.col("__tok"), n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_ratios(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket smoothed log( p_target / p_raw ) over hashed tokens.

    Aggregates the compacted (doc, bucket) counts to per-bucket target
    vs raw totals, then Laplace-smooths both distributions
    ((c+1)/(total+B)). Output is at most `n_buckets` rows — broadcast
    it into the scoring join. Pass `counts` to reuse an existing
    doc_bucket_counts table (dsir_select does).
    """
    if counts is None:
        counts = doc_bucket_counts(docs, is_target, n_buckets, text_col, id_col)
    per_bucket = counts.groupBy("bucket").agg(
        F.sum(F.col("n") * F.col("__t")).alias("n_target"),
        F.sum("n").alias("n_raw"),
    )
    totals = per_bucket.agg(
        F.sum("n_target").alias("__T"), F.sum("n_raw").alias("__R")
    )
    b = float(n_buckets)
    # round to 12 dp before any cross-row summation: ln() may differ in
    # the last ulp across engines, and downstream sums must be
    # order-independent (same trick as q_text_logprob).
    return per_bucket.crossJoin(F.broadcast(totals)).select(
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
    counts: DataFrame | None = None,
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight.

    Weight(doc) = MEAN over its tokens of the bucket log-ratio (the
    per-token normalization removes the length bias a raw sum has:
    common-token mass makes every log-ratio slightly negative, so
    longer documents would always lose). Ties break on the document id
    so selection is deterministic.

    The compacted counts table is built once and materialized via an
    eager ``localCheckpoint`` (it feeds both the ratio estimate and the
    scoring — without materialization the corpus would be re-exploded
    per consumer). Unlike ``persist()``, the checkpoint blocks are NOT
    registered in the session cache manager: the ContextCleaner frees
    them once the returned plan is dropped, so repeated invocations in
    a long session (bench loops, the oracle gate) don't accumulate
    cached tables (ADVICE r3). Callers that already hold a counts table
    pass it via ``counts`` and own its lifecycle. The weighted mean
    sum(n * log_ratio) / sum(n) over buckets equals the token-level
    mean exactly, in exact decimal so partition order can't change the
    answer. TakeOrdered picks k without a global sort.
    """
    if counts is None:
        counts = doc_bucket_counts(
            docs, is_target, n_buckets, text_col, id_col
        ).localCheckpoint(eager=True)
    ratios = dsir_log_ratios(docs, is_target, n_buckets, text_col, id_col, counts=counts)
    scored = (
        counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(
                # multiply in DOUBLE (IEEE-identical across engines),
                # round to 12 dp, then exact decimal sum — decimal*int
                # precision-widening rules differ between engines.
                F.sum(
                    F.round(F.col("log_ratio") * F.col("n"), 12).cast("decimal(28,12)")
                ).cast("double")
                / F.sum("n"),
                6,
            ).alias("dsir_weight")
        )
    )
    return scored.orderBy(F.desc("dsir_weight"), F.asc(id_col)).limit(k)
