"""Unit/property checks for the operator layer."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators import (
    aggregates as A,
    joins as J,
    relational as R,
    windows as W,
)


def test_sum_exact_is_order_independent(spark):
    # 10k values whose plain-double sum depends on order; the decimal
    # accumulation must equal the exact decimal result regardless of
    # partitioning.
    from decimal import ROUND_HALF_UP, Decimal

    pdf = pd.DataFrame({"v": [0.1 + i * 1e-7 for i in range(10_000)]})
    # Spark's double->decimal cast parses the *shortest decimal repr*
    # (Java Double.toString) then rounds HALF_UP - mirror with repr().
    expected = float(
        sum(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP) for v in pdf.v)
    )
    for parts in (1, 7):
        got = (
            spark.createDataFrame(pdf)
            .repartition(parts)
            .agg(A.sum_exact("v").alias("s"))
            .collect()[0]["s"]
        )
        assert abs(got - expected) < 1e-6


def test_trailing_frame_excludes_current_row(spark):
    pdf = pd.DataFrame({"e": ["a"] * 10, "t": range(10), "v": [float(i) for i in range(10)]})
    w = W.entity_window("e", "t")
    out = (
        W.with_trailing_stats(spark.createDataFrame(pdf), "v", w, 3, stats=("avg", "sum"))
        .orderBy("t")
        .collect()
    )
    # row 0 has an empty frame
    assert out[0]["rolling_avg_3r"] is None
    # row 5: frame = rows 2,3,4 -> avg 3.0, sum 9.0 (current row 5 excluded)
    assert out[5]["rolling_avg_3r"] == 3.0
    assert out[5]["rolling_sum_3r"] == 9.0


def test_partition_zscore_null_on_zero_std(spark):
    pdf = pd.DataFrame({"g": ["a", "a", "b", "b"], "v": [1.0, 3.0, 5.0, 5.0]})
    out = {
        (r["g"], r["v"]): r["z"]
        for r in W.with_partition_zscore(spark.createDataFrame(pdf), "v", "g", out="z").collect()
    }
    assert out[("a", 1.0)] == -0.707107 and out[("a", 3.0)] == 0.707107
    assert out[("b", 5.0)] is None  # stddev 0 -> try_divide NULL, not error


def test_asof_join_grid_floors_to_bucket(spark):
    fact = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "ts": pd.to_datetime(["2024-01-01 00:17:00", "2024-01-01 00:44:00"]),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "grid_ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:30:00"]),
                "tariff": ["Low", "High"],
            }
        )
    )
    out = {
        r["id"]: r["tariff"]
        for r in J.asof_join_grid(fact, dim, "ts", "grid_ts", "30 minutes").collect()
    }
    assert out == {1: "Low", 2: "High"}


def test_sentinel_to_null_and_cast(spark):
    pdf = pd.DataFrame({"x": ["1.5", "Null", "2.0", "garbage"]})
    out = [
        r["x"]
        for r in R.sentinel_to_null(spark.createDataFrame(pdf), "x", "Null", "double")
        .orderBy(F.col("x").asc_nulls_last())
        .collect()
    ]
    assert out == [1.5, 2.0, None, None]  # try_cast: garbage -> NULL, no ANSI error


def test_top_k_groups_deterministic_under_ties(spark):
    pdf = pd.DataFrame({"k": ["b", "b", "a", "a", "c"]})
    out = A.top_k_groups(spark.createDataFrame(pdf), "k", 2).collect()
    assert [(r["k"], r["n"]) for r in out] == [("a", 2), ("b", 2)]


def test_union_all_by_name(spark):
    df1 = spark.createDataFrame(pd.DataFrame({"a": [1], "b": ["x"]}))
    df2 = spark.createDataFrame(pd.DataFrame({"b": ["y"], "a": [2]}))  # swapped order
    out = R.union_all([df1, df2]).orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, "x"), (2, "y")]


def test_hierarchy_rollup_totals(spark):
    pdf = pd.DataFrame({"l1": ["x", "x", "y"], "l2": ["p", "q", "p"], "v": [1.0, 2.0, 4.0]})
    rows = A.hierarchy_rollup(spark.createDataFrame(pdf), ["l1", "l2"], "v").collect()
    by_key = {(r["l1"], r["l2"]): r["total_v"] for r in rows}
    assert by_key[(None, None)] == 7.0  # grand total
    assert by_key[("x", None)] == 3.0
    assert by_key[("y", "p")] == 4.0


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:05", "2024-01-01 00:10", "2024-01-01 00:20", "2024-01-01 09:00"]
                ),
                "lv": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "ts": pd.to_datetime(
                    # 00:10 == an exact left timestamp: must match (>= semantics);
                    # b's quote is AFTER b's only left row: must stay null.
                    ["2024-01-01 00:01", "2024-01-01 00:10", "2024-01-01 10:00"]
                ),
                "quote": [10.0, 20.0, 30.0],
            }
        )
    )
    out = {
        (r["k"], r["lv"]): r["quote"]
        for r in J.asof_join(left, right, key="k", right_cols=["quote"]).collect()
    }
    assert out == {("a", 1.0): 10.0, ("a", 2.0): 20.0, ("a", 3.0): 20.0, ("b", 4.0): None}


def test_ivf_ann_recall(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext import similarity as S
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    query = emb.orderBy("vec_id").limit(1)
    n_cells = emb.select("label").distinct().count()
    exact = [r["vec_id"] for r in S.cosine_topk(emb, query, k=10).collect()]
    # nprobe = all cells degenerates to exact search - identical ranking
    full = [r["vec_id"] for r in S.ann_topk_ivf(emb, query, k=10, nprobe=n_cells).collect()]
    assert full == exact
    # a partial probe keeps a useful fraction of the true top-k
    part = {r["vec_id"] for r in S.ann_topk_ivf(emb, query, k=10, nprobe=2).collect()}
    assert len(part & set(exact)) >= 2


def test_connected_components_path_and_islands(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        connected_components,
    )

    # 5-node path (diameter > 1 forces several propagation rounds),
    # plus a separate 2-node island.
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": [10, 20, 30, 40, 100], "id_b": [20, 30, 40, 50, 200]})
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {10: 10, 20: 10, 30: 10, 40: 10, 50: 10, 100: 100, 200: 100}


def test_stratified_sample_respects_fractions(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    out = QUERIES["q_sample_stratified"](spark, "/root/testdata/sf0.01")
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    full = {
        r["event_type"]: r["count"]
        for r in load_table(spark, "/root/testdata/sf0.01", "events").groupBy("event_type").count().collect()
    }
    # kept-whole classes are exact; thinned classes land near 10%
    assert got["purchase"] == full["purchase"]
    assert got["signup"] == full["signup"]
    for et in ("click", "view"):
        assert 0.03 * full[et] < got[et] < 0.25 * full[et]


def test_asof_join_wide_payload_single_window(spark):
    # The whole right payload rides one struct through one
    # last(ignorenulls) window expression - payload width must not add
    # window functions to the plan.
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 02:00"]), "lv": [1.0, 2.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"],
                "ts": pd.to_datetime(["2024-01-01 00:30"]),
                "p1": [10.0],
                "p2": ["x"],
                "p3": [7],
            }
        )
    )
    out = J.asof_join(left, right, key="k", right_cols=["p1", "p2", "p3"])
    rows = {(r["k"], r["lv"]): (r["p1"], r["p2"], r["p3"]) for r in out.collect()}
    assert rows == {("a", 1.0): (10.0, "x", 7), ("a", 2.0): (10.0, "x", 7)}
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # formatted explain prints each node twice (tree + details): one
    # window expression == 2 textual hits; the per-column form would be 6.
    assert plan.count("last(") == 2


def test_range_join_inverted_interval_yields_no_match(spark):
    # end < start must mean "matches nothing", not a sequence() error.
    points = spark.createDataFrame(pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 01:00"]) , "pv": [1]}))
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "start_ts": pd.to_datetime(["2024-01-01 02:00", "2024-01-01 00:00"]),
                "end_ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 02:00"]),
                "iv": [99, 7],
            }
        )
    )
    rows = J.range_join_bucketed(points, intervals, "ts", "start_ts", "end_ts").collect()
    assert [(r["pv"], r["iv"]) for r in rows] == [(1, 7)]


def test_robust_stats_join_fallback_matches_literal_path(spark):
    # High-cardinality groups must take the distributed join path and
    # produce exactly what the literal-map path produces.
    import numpy as np

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": [f"g{i % 40}" for i in range(4000)],
            "v": rng.lognormal(0, 1, 4000).round(4),
        }
    )
    df = spark.createDataFrame(pdf)
    literal = A.robust_group_stats(df, "g", "v", max_literal_groups=10_000)
    joined = A.robust_group_stats(df, "g", "v", max_literal_groups=5)  # forces fallback
    as_rows = lambda d: sorted(
        (r["g"], r["median"], r["mad"], r["n_outliers"]) for r in d.collect()
    )
    assert as_rows(literal) == as_rows(joined)
    # the fallback stays distributed: stats attach via joins, and no
    # literal create_map of collected group stats appears in the plan
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" in plan
    assert "map_from" not in plan and "map(keys" not in plan


def test_connected_components_long_path_log_rounds(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        connected_components,
    )

    # 61-node chain: diameter 60. Plain min-propagation needs ~60
    # rounds; pointer doubling must converge in O(log d) - pinned
    # well below the old linear count.
    ids = list(range(100, 161))
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    )
    rounds: list[int] = []
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iter=15, rounds_out=rounds).collect()
    }
    assert out == {i: 100 for i in ids}
    assert rounds[0] <= 9, rounds


def test_operators_handle_empty_inputs(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        connected_components,
    )

    empty_edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty_edges).count() == 0

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "lv": [1.0]})
    )
    empty_right = spark.createDataFrame([], "k string, ts timestamp, quote double")
    rows = J.asof_join(left, empty_right, key="k", right_cols=["quote"]).collect()
    assert [(r["k"], r["lv"], r["quote"]) for r in rows] == [("a", 1.0, None)]

    empty_r = spark.createDataFrame([], "k string, w bigint")
    got = J.salted_join(left.select("k", "lv"), empty_r, "k", "left").collect()
    assert [(r["k"], r["lv"], r["w"]) for r in got] == [("a", 1.0, None)]


def test_winnow_guarantee_shared_substring_detected(spark):
    # Schleimer et al.'s guarantee: any shared substring of length
    # >= w + k - 1 (= 23 here) must produce a common fingerprint.
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import winnow_pairs

    shared = "zqxjkvwpyhgfdnmbltrcse!"  # 23 chars, appears in both docs
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "aaaa bbbb cccc dddd eeee ffff " + shared + " gggg hhhh iiii",
                    shared + " totally different tail content here xyz",
                    "no overlap with the others at all - plain filler words only",
                ],
            }
        )
    )
    pairs = winnow_pairs(docs, min_shared=1).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_winnow_pairs_fused_shape_matches_self_join(spark):
    """The r15 group-and-enumerate rewrite (ext/dedup.winnow_pairs):
    the pair plan must contain NO join (one aggregation replaces the
    fingerprint self-join and the window df-prune), and its output
    must equal the reference self-join formulation on a fixture whose
    boilerplate fingerprints (shared by all 5 docs > max_df=4) are
    pruned — without the prune every doc would pair with every other
    through the common header; with it only the true shared-run pairs
    survive."""
    from pyspark.sql import Window, functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    boiler = "commonboilerplateheaderthateverydocumentshares!!"
    body_ab = "zqxjkvwpyhgfdnmbltrcse##uniqueduplicatedrunhere"
    body_cd = "anotherlongsharedrunof~textthatonlycdcontain%%"
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + body_ab + " one tail"),
            (2, boiler + " " + body_ab + " two tail"),
            (3, boiler + " " + body_cd + " three t"),
            (4, boiler + " " + body_cd + " four ta"),
            (5, boiler + " standalone five filler content"),
        ],
        "doc_id long, text string",
    )
    got = winnow_pairs(docs, max_df=4, min_shared=2)
    assert "Join" not in got._jdf.queryExecution().executedPlan().toString()

    fps = winnow_fingerprints(docs)
    pruned = (
        fps.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("__df") <= 4)
        .drop("__df")
    )
    ref = (
        pruned.select(F.col("doc_id").alias("doc_a"), "fp")
        .join(pruned.select(F.col("doc_id").alias("doc_b"), "fp"), "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    surviving = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    assert (1, 2) in surviving and (3, 4) in surviving
    assert not any(5 in p for p in surviving)  # boilerplate-only doc pairs with no one


def test_fuzzy_join_blocks_without_all_pairs(spark):
    # deletion-neighborhood completeness at distance 1: substitution,
    # insertion, deletion, and identity all matched; distance-2 not.
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import (
        fuzzy_join_ed1,
    )

    names = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "name": ["site_042", "site_043", "site_42", "Xsite_042", "plant_99"],
        }
    )
    df = spark.createDataFrame(names)
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_join_ed1(df, df, "id", "name", "id", "name").collect()
    }
    assert pairs[(1, 2)] == 1  # substitution
    assert pairs[(1, 3)] == 1  # deletion
    assert pairs[(1, 4)] == 1  # insertion
    assert (2, 3) not in pairs  # distance 2
    assert all(5 not in p for p in pairs)


def test_bloom_join_guards_oversized_build_side(spark):
    import pytest

    from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import (
        bloom_filtered_join,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    with pytest.raises(ValueError, match="max_dim_rows"):
        bloom_filtered_join(li, o, "l_orderkey", "o_orderkey", max_dim_rows=10)
    # bloom prune must not change the join result (false positives are
    # swallowed by the exact join; false negatives are impossible)
    import pyspark.sql.functions as F

    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    got = bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey").count()
    want = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"]).count()
    assert got == want


def test_pagerank_star_graph_hub_dominates(spark):
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import pagerank

    # undirected star: hub 0 <-> leaves 1..5
    leaves = list(range(1, 6))
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": [0] * 5 + leaves, "dst": leaves + [0] * 5}
        )
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert ranks[0] > max(ranks[i] for i in leaves)
    leaf_ranks = {ranks[i] for i in leaves}
    assert len(leaf_ranks) == 1  # symmetry
    # no dangling nodes -> total mass stays ~1
    assert abs(sum(ranks.values()) - 1.0) < 1e-5  # each rank rounded at 1e-6


def test_range_join_left_keeps_unmatched_points(spark):
    # how="left": a point outside every interval must survive with NULL
    # interval columns. The pre-r11 post-join containment filter
    # evaluated NULL on those rows and silently degraded left to inner.
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-05 01:00"]),
                "pv": [1, 2],
            }
        )
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "start_ts": pd.to_datetime(["2024-01-01 00:00"]),
                "end_ts": pd.to_datetime(["2024-01-01 02:00"]),
                "iv": [7],
            }
        )
    )
    rows = J.range_join_bucketed(
        points, intervals, "ts", "start_ts", "end_ts", how="left"
    ).collect()
    got = sorted((r["pv"], r["iv"]) for r in rows)
    assert got == [(1, 7), (2, None)]


def test_range_join_random_differential_vs_bruteforce(spark):
    # seeded random points/intervals straddling bucket boundaries, both
    # inner and left, vs a pandas brute force — exercises the bucket
    # explode (intervals longer and shorter than bucket_s) and the
    # join-condition containment.
    import random as _random

    rng = _random.Random(7)
    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=rng.randint(0, 400_000)) for _ in range(60)],
            "pv": list(range(60)),
        }
    )
    s = [base + pd.Timedelta(seconds=rng.randint(0, 380_000)) for _ in range(25)]
    ivs = pd.DataFrame(
        {
            "start_ts": s,
            "end_ts": [t + pd.Timedelta(seconds=rng.randint(0, 30_000)) for t in s],
            "iv": list(range(25)),
        }
    )
    expect_inner = sorted(
        (int(p.pv), int(i.iv))
        for p in pts.itertuples()
        for i in ivs.itertuples()
        if i.start_ts <= p.ts <= i.end_ts
    )
    matched = {a for a, _ in expect_inner}
    expect_left = sorted(
        expect_inner + [(int(p.pv), None) for p in pts.itertuples() if int(p.pv) not in matched],
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    got_inner = sorted(
        (r["pv"], r["iv"])
        for r in J.range_join_bucketed(pdf, idf, "ts", "start_ts", "end_ts").collect()
    )
    assert got_inner == expect_inner
    got_left = sorted(
        ((r["pv"], r["iv"]) for r in J.range_join_bucketed(
            pdf, idf, "ts", "start_ts", "end_ts", how="left"
        ).collect()),
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    assert got_left == expect_left


def test_range_join_rejects_interval_outer_hows(spark):
    # an unmatched interval exploded to N buckets would come back as N
    # null-extended rows with its key columns dropped — right/full are
    # refused, not silently wrong (same contract style as bloom join)
    import pytest

    points = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:30"]), "pv": [1]})
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "start_ts": pd.to_datetime(["2024-01-02 00:00"]),
                "end_ts": pd.to_datetime(["2024-01-02 03:00"]),
                "iv": [7],
            }
        )
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="range_join_bucketed supports"):
            J.range_join_bucketed(points, intervals, "ts", "start_ts", "end_ts", how=how)


def test_bloom_join_rejects_lossy_how(spark):
    # the bloom pre-prune has no false negatives but outer/anti joins
    # must KEEP provably-unmatched fact rows — those hows are refused,
    # not silently degraded (left would lose null-extended rows;
    # left_anti would return only the bloom's false positives)
    import pytest

    fact = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    dim = spark.createDataFrame(pd.DataFrame({"dk": [1], "d": ["x"]}))
    for how in ("left", "full", "left_anti"):
        with pytest.raises(ValueError, match="bloom_filtered_join supports"):
            J.bloom_filtered_join(fact, dim, "k", "dk", how=how)
    # the lossless hows still work and match the plain join
    got = sorted(
        (r["k"], r["d"])
        for r in J.bloom_filtered_join(fact, dim, "k", "dk", how="inner").collect()
    )
    assert got == [(1, "x")]
    semi = sorted(r["k"] for r in J.bloom_filtered_join(fact, dim, "k", "dk", how="left_semi").collect())
    assert semi == [1]
