"""In-row basket-pair enumeration vs the fact self-join it replaced.

`ext.graph.copurchase_pairs` rebuilds the co-occurrence pair relation
(`fact JOIN fact ON group AND a < b`) from per-group item-set arrays —
one fact shuffle instead of two join exchanges. These tests pin exact
multiset parity with the join shape (the r7 migration gate for
q_graph_bfs / q_graph_triangles / q_graph_clustering /
q_rec_item_sim / q_rec_assoc_rules), the directed variant, and the
within-group dedup that `collect_set` must provide because the old
shape ran on a `distinct()`-ed basket.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
    basket_pairs,
    copurchase_pairs,
    order_baskets,
)

SF = "/root/testdata/sf0.001"


def _join_pairs(df, group_col, item_col, directed=False):
    a, b = df.alias("a"), df.alias("b")
    cmp = (
        F.col(f"a.{item_col}") != F.col(f"b.{item_col}")
        if directed
        else F.col(f"a.{item_col}") < F.col(f"b.{item_col}")
    )
    return a.join(
        b, (F.col(f"a.{group_col}") == F.col(f"b.{group_col}")) & cmp
    ).select(
        F.col(f"a.{item_col}").alias("id_a"), F.col(f"b.{item_col}").alias("id_b")
    )


def _multiset(df):
    return sorted(map(tuple, df.collect()))


def test_basket_pairs_match_self_join_on_lineitem(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    got = _multiset(copurchase_pairs(li, "l_orderkey", "l_partkey"))
    # the join runs on the distinct'd basket to mirror collect_set
    want = _multiset(_join_pairs(li.distinct(), "l_orderkey", "l_partkey"))
    assert got == want and len(got) > 0


def test_directed_pairs_match_neq_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    got = _multiset(copurchase_pairs(li, "l_orderkey", "l_partkey", directed=True))
    want = _multiset(
        _join_pairs(li.distinct(), "l_orderkey", "l_partkey", directed=True)
    )
    assert got == want


def test_within_group_duplicates_collapse(spark):
    # (g1: [1,1,2,3]) -> pairs of the SET {1,2,3}; (g2: [5]) -> none
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (1, 3), (2, 5)], ["g", "i"]
    )
    got = _multiset(copurchase_pairs(df, "g", "i"))
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_order_baskets_sorted_and_deduped(spark):
    df = spark.createDataFrame([(1, 3), (1, 1), (1, 3), (2, 7)], ["g", "i"])
    rows = {r["g"]: r["__items"] for r in order_baskets(df, "g", "i").collect()}
    assert rows == {1: [1, 3], 2: [7]}
    # singleton baskets yield no pairs rather than erroring on slice()
    assert basket_pairs(order_baskets(df, "g", "i")).filter("id_a = 7").count() == 0


def test_property_random_multisets_match_join(spark):
    """Hypothesis: random (group, item) multisets — with duplicate rows,
    singleton groups, and shared items across groups — always match the
    distinct'd self-join, both undirected and directed."""
    from hypothesis import given, settings, strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 8)), min_size=1, max_size=40
    )

    @settings(max_examples=8, deadline=None)
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, ["g", "i"])
        for directed in (False, True):
            got = _multiset(copurchase_pairs(df, "g", "i", directed=directed))
            want = _multiset(_join_pairs(df.distinct(), "g", "i", directed=directed))
            assert got == want

    check()


def test_pair_build_plan_has_no_join(spark):
    """The whole point of the in-row build: the pair relation's plan is
    scan -> one aggregation -> generate, with NO join operator — pin it
    so a refactor can't silently reintroduce the fact self-join."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    df = copurchase_pairs(li, "l_orderkey", "l_partkey")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert "Join" not in plan and "CartesianProduct" not in plan
    # exactly one exchange node: the basket aggregation shuffle
    # (formatted output repeats each node in the details section, so
    # count distinct "(id) Exchange" headers, not substring hits)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Generate" in plan  # the in-row explode
