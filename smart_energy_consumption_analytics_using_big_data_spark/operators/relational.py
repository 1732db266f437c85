"""Relational core: projection, filtering, casts, dedup, set ops.

Maps SURVEY.md SS2.2 (P1-P12) and SS2.7 (U1-U3) onto built-in Catalyst
expressions. Everything here stays inside whole-stage codegen; filters
and projections push down to the Parquet scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window, functions as F


def project(df: DataFrame, columns: dict[str, str | Column]) -> DataFrame:
    """Projection with renames (P1/P2): {output_name: input_col_or_expr}.

    Reference: select at `anomaly_detection.py:85`, renames at
    `data_preprocessing.py:119,123`.
    """
    return df.select(
        *[
            (F.col(src) if isinstance(src, str) else src).alias(out)
            for out, src in columns.items()
        ]
    )


def drop_null_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """NOT NULL predicate (P3/P4; `data_preprocessing.py:111,141`)."""
    return df.na.drop(subset=subset)


def sentinel_to_null(df: DataFrame, column: str, sentinel: str, cast_to: str | None = None) -> DataFrame:
    """Rewrite a literal sentinel string to NULL, optionally retyping (P5).

    Reference: `data_preprocessing.py:132-137`. Uses `nullif` +
    `try_cast` so it is safe under ANSI mode even if other garbage
    strings appear.
    """
    col = F.nullif(F.col(column), F.lit(sentinel))
    if cast_to is not None:
        col = col.try_cast(cast_to)
    return df.withColumn(column, col)


def filter_range(df: DataFrame, column: str, lower=None, upper=None) -> DataFrame:
    """Half-open range predicate on a typed column (P6).

    Reference compares *string* dates lexicographically
    (`forecasting_model.py:186-188`); on typed columns Catalyst can push
    the predicate into the scan and prune partitions.
    """
    if lower is not None:
        df = df.filter(F.col(column) >= F.lit(lower))
    if upper is not None:
        df = df.filter(F.col(column) < F.lit(upper))
    return df


def filter_in(df: DataFrame, column: str, values: Iterable) -> DataFrame:
    """IN-list predicate (P7; `feature_engineering.py:127,315`)."""
    return df.filter(F.col(column).isin(list(values)))


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact row-level dedup (P12 analog): hash-shuffle on the key
    columns; at scale prefer a subset of low-cardinality-safe keys."""
    return df.dropDuplicates(subset=subset)


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL by column name (U1).

    The reference chains 168 binary unions in a loop
    (`data_ingestion.py:100-103`); unionByName over the list keeps the
    plan balanced, but the real fix is a single multi-path read
    (sources/readers.py).
    """
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other)
    return out


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """SQL MERGE (upsert) semantics over plain DataFrames: matched rows
    take the update row WHOLESALE (including columns the update sets to
    NULL), unmatched target rows pass through, unmatched update rows are
    inserts - one full outer join on the key plus a row-level matched
    indicator choosing which side each value column comes from.

    This is the snapshot-merge primitive for incremental pipelines
    without a table format; with Delta/Iceberg the same call becomes
    MERGE INTO and gains file-level pruning. Both sides shuffle on the
    key - pre-bucket target and updates on it to make the merge
    co-located and shuffle-free.
    """
    value_cols = [c for c in target.columns if c not in key_cols]
    # Row-level matched indicator, not per-column coalesce: MERGE takes
    # the update row WHOLESALE when the key matches, including columns
    # the update legitimately sets to NULL. coalesce(u.c, t.c) silently
    # resurrected the target's old value under a NULL update — a
    # semantics bug no NULL-free test corpus could see.
    t_, u_ = target.alias("t"), updates.withColumn("__u", F.lit(True)).alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
    joined = t_.join(u_, cond, "full_outer")
    matched = F.col("u.__u").isNotNull()
    out_cols = [
        F.coalesce(F.col(f"u.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols
    ] + [
        (
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            if c in updates.columns
            else F.col(f"t.{c}").alias(c)
        )
        for c in value_cols
    ]
    return joined.select(*out_cols)


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: per key, collapse consecutive identical attribute values into
    one versioned row with [valid_from, valid_to) bounds; the open
    (valid_to IS NULL) row is the current version.

    The warehouse-dimension counterpart of merge_upsert: instead of
    overwriting, every attribute change closes the previous version
    and opens a new one — the shape a 100 TB CDC feed materializes
    into. One shuffle on the key serves BOTH windows (change detection
    via lag, interval close via lead); everything stays in whole-stage
    codegen. Ties on ts_col are broken by `tiebreak_cols` so the
    version sequence — and therefore the SQL oracle — is deterministic.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # row_number()==1 keeps a key's first version even when its
    # attribute is NULL (eqNullSafe(NULL, lag=NULL) would collapse it).
    changed = (F.row_number().over(w) == 1) | ~F.col(attr_col).eqNullSafe(
        F.lag(attr_col).over(w)
    )
    versions = changes.withColumn("__new", changed).filter("__new")
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .select(
            *key_cols,
            attr_col,
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
