"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import TESTDATA_TABLES

from tests._parity import assert_df_matches_oracle
from tests.conftest import SF_SMOKE

# ML queries are rows-only AND slow; exercised in test_ml.py instead.
_SKIP_ROWS_ONLY = {"q_ml_forecast_linear", "q_ml_forecast_rf", "q_ml_anomaly_kmeans"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    assert_df_matches_oracle(sdf, duck, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE) - _SKIP_ROWS_ONLY))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert len(df.columns) > 0
    assert df.count() > 0
