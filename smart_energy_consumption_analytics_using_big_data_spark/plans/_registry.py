"""Query registry plumbing shared by the plans modules.

Every operator claimed in SURVEY.md SS2 registers a named query
(spark, sf_dir) -> DataFrame plus, when SQL-expressible, a DuckDB
oracle string over the same tables. Column names are aliased
identically on both sides (the correctness driver sorts columns by
name before hashing values).

Cross-engine determinism rules used throughout:

* DOUBLE sums accumulate in DECIMAL (order-independent), see
  operators/aggregates.sum_exact; oracle mirrors with
  ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
* everything float-valued is rounded to 6 decimals on both sides;
* window/order clauses always carry a unique tiebreak column;
* DuckDB returns BIGINT where Spark returns INT for date parts - the
  oracle casts to INTEGER; DuckDB SUM(BIGINT) returns HUGEINT - the
  oracle casts to BIGINT.
* pow() differs between JVM Math.pow and DuckDB at the ulp level, and
  geometric-weight sums over few-decimal data are FINITE decimals that
  land on round-half boundaries (seen live in q_ts_croston at sf0.01).
  When the true weight is a finite decimal, recover it exactly with a
  DECIMAL(16,14)-class cast of the double pow and accumulate terms in
  exact DECIMAL (q_ts_holt / q_ts_croston); double folds are only safe
  for normalized ratios (q_window_ewma) or non-terminating results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle=None` marks it rows-only."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


t = load_table

# Oracle SQL fragment: order-independent double sum (see sum_exact).
def DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
