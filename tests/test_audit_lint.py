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

from audit_plans import audit_one, formatted_plan, nested_output_fields


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


def test_registry_has_no_nested_oracled_outputs(spark):
    """Every ORACLED query's registered output schema is atomic — the
    full-plan audit enforces this at sf0.001; here we pin the one query
    that regressed in r3 (q_emb_pq_codebook) cheaply per-test-run."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES

    assert "q_emb_pq_codebook" in ORACLE
    df = QUERIES["q_emb_pq_codebook"](spark, "/root/testdata/sf0.001")
    assert nested_output_fields(df) == []
