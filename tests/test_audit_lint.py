"""Plan-audit lint guarantees (VERDICT r3 item 4).

The correctness driver's order-insensitive hash comparator cannot hash
array/map/struct values (pandas ``TypeError: unhashable type: 'list'``
— the r3 q_emb_pq_codebook failure), and the LOCAL gate stringifies
them, so only the audit lint can catch the class before the driver
does. These tests pin that the lint (a) flags an injected array-output
oracled query and (b) stays quiet on scalar outputs and on rows-only
queries (whose outputs never reach the hash comparator).
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from audit_plans import (
    ALLOWED_DECIMAL_ORACLE,
    audit_one,
    formatted_plan,
    nested_output_fields,
    oracle_type_findings,
    single_task_windows,
)


def test_lint_flags_injected_array_output(spark):
    df = spark.range(3).select("id", F.array(F.lit(1), F.lit(2)).alias("centroid"))
    assert nested_output_fields(df) == ["centroid"]
    row = audit_one("q_injected", df, formatted_plan(df), oracled=True)
    assert any("non-atomic oracled output" in b for b in row["bad_nodes"])
    assert not row["allowed"]


def test_lint_flags_struct_and_map_too(spark):
    df = spark.range(1).select(
        F.struct(F.lit(1).alias("a")).alias("s"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
    )
    assert nested_output_fields(df) == ["s", "m"]


def test_lint_quiet_on_scalar_and_rows_only(spark):
    scalar = spark.range(3).select("id", F.lit("x").alias("tag"))
    assert nested_output_fields(scalar) == []
    assert audit_one("q_s", scalar, formatted_plan(scalar), oracled=True)["bad_nodes"] == []
    # rows-only queries may emit arrays (never hashed by the driver)
    arr = spark.range(1).select(F.array(F.lit(1)).alias("v"))
    assert audit_one("q_a", arr, formatted_plan(arr), oracled=False)["bad_nodes"] == []


def test_oracle_type_lint_catches_uncast_sum():
    """The r6 driver-red class: DuckDB sum(BIGINT) is HUGEINT, which the
    driver's pandas-path hasher renders '6.0' against Spark's '6'. The
    lint must catch the seeded regression at BIND time and stay quiet
    once the cast lands."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW v AS SELECT unnest([1, 2, 3])::BIGINT AS x")
    bad = oracle_type_findings(con, "q_seeded", "SELECT sum(x) AS n FROM v")
    assert len(bad) == 1 and "HUGEINT" in bad[0] and "'n'" in bad[0]
    assert oracle_type_findings(
        con, "q_seeded", "SELECT CAST(sum(x) AS BIGINT) AS n FROM v"
    ) == []
    # first-appearance DECIMAL fails until allowlisted with driver evidence
    dec = oracle_type_findings(con, "q_new_decimal", "SELECT 0.5 AS t FROM v")
    assert len(dec) == 1 and "DECIMAL" in dec[0]
    allowed = next(iter(ALLOWED_DECIMAL_ORACLE))
    assert oracle_type_findings(con, allowed, "SELECT 0.5 AS t FROM v") == []
    # binding errors surface as findings, not crashes
    err = oracle_type_findings(con, "q_bad", "SELECT nope FROM missing_tbl")
    assert len(err) == 1 and "bind error" in err[0]


def test_driver_sim_hashes_oracle_physical_types():
    """driver_sim's oracle canonicalization must reproduce the driver's
    HUGEINT rendering (the pre-fix BPE red) instead of collapsing it to
    Python int like fetchall() did."""
    import duckdb

    from driver_sim import canon, canon_duck

    con = duckdb.connect()
    con.execute("CREATE VIEW v AS SELECT unnest([1, 2, 3])::BIGINT AS x")
    # Spark side of an uncast-sum query: BIGINT 6
    spark_side = canon(["n"], [(6,)])
    _, hugeint_canon, warn = canon_duck(con.sql("SELECT sum(x) AS n FROM v"))
    assert warn == ["n"]
    assert hugeint_canon != spark_side  # '6.0' vs '6' — the driver's red
    _, cast_canon, warn2 = canon_duck(
        con.sql("SELECT CAST(sum(x) AS BIGINT) AS n FROM v")
    )
    assert warn2 == [] and cast_canon == spark_side


def test_single_task_window_walker(spark):
    """The formatted-plan walker (r7 rewrite: the r6 lint matched the
    simple-plan `Window [` spelling that never occurs in formatted
    output — a silent no-op) flags data-sized global windows even with
    interposed partition-preserving nodes, and exempts only windows
    ordering on __slice alone (the two-pass family's offsets pass)."""
    from pyspark.sql import Window as W

    df = spark.range(100).select("id", (F.col("id") % 7).alias("v"))
    flagged = df.select(F.row_number().over(W.orderBy("v")).alias("rn"))
    assert single_task_windows(formatted_plan(flagged)) == 1
    # Project + Filter between the Window and its SinglePartition exchange
    interposed = (
        df.select("id", (F.col("v") * 2).alias("v2"))
        .filter(F.col("v2") > 3)
        .select(F.row_number().over(W.orderBy("v2")).alias("rn"), "id")
    )
    assert single_task_windows(formatted_plan(interposed)) == 1
    partitioned = df.select(
        F.row_number().over(W.partitionBy("v").orderBy("id")).alias("rn")
    )
    assert single_task_windows(formatted_plan(partitioned)) == 0
    # offsets pass: slice-count-bounded, ordered on __slice alone -> exempt
    sliced = df.select("id", (F.col("id") % 4).alias("__slice"))
    offsets = (
        sliced.groupBy("__slice")
        .agg(F.count("*").alias("c"))
        .select("__slice", F.sum("c").over(W.orderBy("__slice")).alias("off"))
    )
    assert single_task_windows(formatted_plan(offsets)) == 0
    # mentioning __slice does NOT exempt a data-sized ordering
    mixed = sliced.select(
        F.row_number().over(W.orderBy("id", "__slice")).alias("rn")
    )
    assert single_task_windows(formatted_plan(mixed)) == 1


def test_single_task_window_sees_through_reused_exchange(spark):
    """ADVICE r8: with exchange reuse (static planner, AQE off), the
    second global window sits on a `ReusedExchange [Reuses operator
    id: N]` whose own detail has no Arguments — the walker must resolve
    the aliased Exchange's SinglePartition instead of treating the node
    as a walk-terminating stranger (the old false-negative)."""
    from pyspark.sql import Window as W

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(100).select("id", (F.col("id") % 7).alias("v"))
        left = df.select(F.row_number().over(W.orderBy("v")).alias("rn"), "id")
        right = left.select("rn", F.col("id").alias("id2"))
        plan = formatted_plan(left.join(right, "rn"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan, "construction no longer reuses — update test"
    assert single_task_windows(plan) == 2


def test_registry_has_no_nested_oracled_outputs(spark):
    """Every ORACLED query's registered output schema is atomic — the
    full-plan audit enforces this at sf0.001; here we pin the one query
    that regressed in r3 (q_emb_pq_codebook) cheaply per-test-run."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES

    assert "q_emb_pq_codebook" in ORACLE
    df = QUERIES["q_emb_pq_codebook"](spark, "/root/testdata/sf0.001")
    assert nested_output_fields(df) == []
