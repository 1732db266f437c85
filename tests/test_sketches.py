"""Sketch-aggregate accuracy: estimates must land near exact answers
(the estimates themselves are engine-specific, hence rows-only in the
oracle harness - accuracy is asserted here instead)."""

import pytest

from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def test_hll_and_approx_distinct_within_5pct(spark):
    rows = QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        assert abs(r["approx_users"] - r["exact_users"]) <= 0.05 * r["exact_users"]
        assert abs(r["hll_users"] - r["exact_users"]) <= 0.05 * r["exact_users"]


def test_hll_merge_matches_direct_sketch(spark):
    merged = {
        r["event_type"]: r["merged_users"]
        for r in QUERIES["q_approx_distinct_merge"](spark, SF_DIR).collect()
    }
    direct = {
        r["event_type"]: r["hll_users"]
        for r in QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    }
    # merging per-hour sketches must give EXACTLY the direct sketch's
    # estimate (HLL union is lossless at equal lgK)
    assert merged == direct


def test_approx_quantile_brackets_exact(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"])
        for r in QUERIES["q_approx_quantile"](spark, SF_DIR).collect()
    }
    for et, (p50, p95) in exact.items():
        assert approx[et][0] == pytest.approx(p50, rel=0.02)
        assert approx[et][1] == pytest.approx(p95, rel=0.02)


def test_approx_topk_exact_at_low_cardinality(spark):
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = QUERIES["q_approx_topk"](spark, SF_SMOKE).collect()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = {r["item"]: r["est_count"] for r in rows}
    assert sorted(r["rank"] for r in rows) == [1, 2, 3]
    # 5 distinct values << 10k tracked: the sketch must be exact
    assert got == dict(want)


def test_histogram_quantile_merge_within_bin_width(spark):
    """The mergeable-histogram quantile estimate must land within two
    bin widths (10.0) of the exact interpolated percentile: the
    estimate is confined to its selected bin, but the exact value can
    interpolate between order statistics that straddle a bin edge."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    from tests.conftest import SF_SMOKE

    est = {
        r.event_type: (r.p50_est, r.p95_est)
        for r in QUERIES["q_approx_quantile_merge"](spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for et in exact:
        assert abs(est[et][0] - exact[et][0]) <= 10.0, (et, "p50")
        assert abs(est[et][1] - exact[et][1]) <= 10.0, (et, "p95")


def test_weighted_sample_overrepresents_long_docs_and_is_stable(spark):
    """ES weighted sampling: deterministic across invocations, and the
    length-weighted sample's mean n_chars exceeds the corpus mean."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    from tests.conftest import SF_SMOKE

    s1 = QUERIES["q_sample_weighted"](spark, SF_SMOKE).collect()
    s2 = QUERIES["q_sample_weighted"](spark, SF_SMOKE).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]
    sample_mean = sum(r.n_chars for r in s1) / len(s1)
    corpus_mean = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_kmv_estimate_accuracy_and_mergeability(spark):
    """KMV: estimate within the ~2/sqrt(k) relative-error envelope of
    exact distinct, and the sketch MERGES: union of two halves'
    bottom-64 re-bottom-64'd equals the whole-corpus bottom-64."""
    from pyspark.sql import Window, functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    from tests.conftest import SF_SMOKE

    rows = QUERIES["q_approx_distinct_kmv"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.n_exact >= 64:
            assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.5, r
        else:
            assert r.kmv_estimate == float(r.n_exact), r

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    hashed = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint"),
        )
    )

    def bottomk(df):
        w = Window.partitionBy("event_type").orderBy("h", "user_id")
        return df.withColumn("rk", F.row_number().over(w)).filter("rk <= 64").drop("rk")

    whole = bottomk(hashed)
    halves = bottomk(hashed.filter("user_id % 2 = 0")).unionByName(
        bottomk(hashed.filter("user_id % 2 = 1"))
    )
    merged = bottomk(halves)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmv_overlap_tracks_exact_jaccard(spark):
    """KMV pairwise overlap: jaccard_est within the bottom-k error
    envelope of the exact user-set Jaccard for every type pair."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    from tests.conftest import SF_SMOKE

    est = {
        (r.ta, r.tb): (r.union_exact, r.union_est, r.jaccard_est)
        for r in QUERIES["q_approx_overlap_kmv"](spark, SF_SMOKE).collect()
    }
    assert len(est) == 10  # C(5,2) type pairs
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    users = {
        r.event_type: {u.user_id for u in ev.filter(F.col("event_type") == r.event_type)
                       .select("user_id").distinct().collect()}
        for r in ev.select("event_type").distinct().collect()
    }
    for (ta, tb), (u_exact, u_est, j_est) in est.items():
        a, b = users[ta], users[tb]
        assert u_exact == len(a | b)
        exact_j = len(a & b) / len(a | b)
        # k=64 bottom-k: generous envelope, but must track direction
        assert abs(j_est - exact_j) < 0.35, ((ta, tb), j_est, exact_j)
        assert abs(u_est - u_exact) / u_exact < 0.5, ((ta, tb), u_est, u_exact)
