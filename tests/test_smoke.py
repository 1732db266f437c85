"""Fast cross-family smoke gate (`pytest -m smoke`).

One representative query per family, each differentially checked
against its DuckDB oracle at sf0.001 — the cheap invariant to run
before any snapshot commit (VERDICT r2 item 4: r2 shipped with red
tests that exactly predicted the driver failures; this makes that
state impossible to miss in under two minutes).
"""

from __future__ import annotations

import duckdb
import pytest

from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import TESTDATA_TABLES

from tests.conftest import SF_SMOKE

# One per family: scan, SQL text, agg/rollup, window, join, set-op,
# sessionization (epoch arithmetic), streaming (event time), dedup,
# similarity, text, multimodal, pipeline.
SMOKE_QUERIES = [
    "q_scan_parquet",
    "q_sql_pricing_summary",
    "q_flagship",
    "q_agg_multikey",
    "q_window_zscore",
    "q_join_left_dim",
    "q_join_range",
    "q_union_all",
    "q_sessionize",
    "q_stream_rollup",
    "q_dedup_minhash_lsh",
    "q_sim_cosine_topk",
    "q_text_quality",
    "q_mm_meta",
    "q_pack_sequences",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'")
    yield con
    con.close()


@pytest.mark.smoke
@pytest.mark.parametrize("name", SMOKE_QUERIES)
def test_smoke_family(spark, duck, name):
    import sys

    sys.path.insert(0, "scripts")
    from check_oracle import canon_rows

    assert name in QUERIES, f"{name} not registered"
    sdf = QUERIES[name](spark, SF_SMOKE)
    srows = sdf.collect()
    if name not in ORACLE:
        # rows-only op: no SQL analog — non-emptiness is the smoke bar
        assert srows, f"{name} returned no rows"
        return
    res = duck.execute(ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    _, s_canon = canon_rows(sdf.columns, srows)
    _, d_canon = canon_rows(dcols, drows)
    assert len(s_canon) == len(d_canon)
    assert s_canon == d_canon
