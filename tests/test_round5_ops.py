"""Semantic checks for the round-5 operators — the oracle gate proves
Spark == DuckDB; these prove both equal the FORMULA (or an independent
implementation) on hand-computable fixtures."""

from __future__ import annotations

import datetime as dt

from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
    q_attribution,
    q_feature_quantile_norm,
    q_graph_bfs,
    q_ml_isotonic,
    q_text_rake,
    q_text_textrank,
    q_ts_croston,
    q_ts_holt,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans.mlq import q_ml_als

SF_SMOKE = "/root/testdata/sf0.001"


def _r(x: float, n: int) -> float:
    """Round-half-UP on the double's SHORTEST decimal repr — what
    Spark's round does (BigDecimal.valueOf goes through
    Double.toString, not the exact binary expansion) and DuckDB
    matches; Python's built-in round is banker's on the exact
    expansion and disagrees on .5 boundaries."""
    import decimal

    q = decimal.Decimal(1).scaleb(-n)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def test_bfs_hop_distances_on_path_graph(spark):
    # path 10-11-12-13-14 plus a second component 20-21, symmetric
    # edges; node 15 is isolated (no edges -> absent from the graph).
    # Seeds = node ids % 10 == 0, i.e. 10 and 20. Node 14 sits at
    # exactly max_hops; a longer path would be truncated by design.
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        bfs_hops,
    )

    und = [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {r.id: r.dist for r in bfs_hops(edges, seed_mod=10, max_hops=4).collect()}
    assert out == {10: 0, 11: 1, 12: 2, 13: 3, 14: 4, 20: 0, 21: 1}


def test_bfs_query_reaches_copurchase_neighborhood(spark):
    # on the real co-purchase graph every returned distance is within
    # the hop bound and every seed part reports distance zero
    rows = q_graph_bfs(spark, SF_SMOKE).collect()
    assert rows and all(0 <= r.dist <= 4 for r in rows)
    assert all(r.dist == 0 for r in rows if r.id % 10 == 0)


def test_attribution_conserves_credit(spark):
    rows = q_attribution(spark, SF_SMOKE).collect()
    n_conv = 202  # purchases at sf0.001
    assert sum(r.first_touch for r in rows) == n_conv
    assert sum(r.last_touch for r in rows) == n_conv
    # linear credit splits each conversion into fractions that sum
    # back to exactly one conversion (up to the 1e-12 credit rounding)
    assert abs(sum(r.linear for r in rows) - n_conv) < 1e-4
    assert {r.channel for r in rows} >= {"ch0", "ch1", "ch2", "ch3"}


def test_isotonic_matches_mllib_pav(spark):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    rows = q_ml_isotonic(spark, SF_SMOKE).collect()
    pts = spark.createDataFrame(
        [(float(r.bin), r.pos / r.n, float(r.n)) for r in rows],
        "x double, y double, w double",
    )
    feats = VectorAssembler(inputCols=["x"], outputCol="features").transform(pts)
    model = IsotonicRegression(
        featuresCol="features", labelCol="y", weightCol="w"
    ).fit(feats)
    pred = {
        int(r.x): r.prediction for r in model.transform(feats).collect()
    }
    for r in rows:
        assert abs(r.fitted - pred[r.bin]) < 1e-6, (r.bin, r.fitted, pred[r.bin])
    # monotone non-decreasing in bin order
    fitted = [r.fitted for r in sorted(rows, key=lambda r: r.bin)]
    assert fitted == sorted(fitted)


def test_holt_equals_sequential_recurrence(spark, tmp_path):
    # 10 days (< the 14-row frame) so the truncated closed form equals
    # the untruncated zero-init recurrence exactly.
    base = dt.datetime(2024, 1, 1)
    xs = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 21.0, 20.0, 24.0]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "view", x, "{}")
        for i, x in enumerate(xs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.date: (r.level, r.trend, r.forecast_next)
        for r in q_ts_holt(spark, str(tmp_path)).collect()
    }
    a = 0.4
    s1 = s2 = 0.0
    for i, x in enumerate(xs):
        s1 = a * x + (1 - a) * s1
        s2 = a * s1 + (1 - a) * s2
        level, trend = 2 * s1 - s2, a / (1 - a) * (s1 - s2)
        got = out[(base + dt.timedelta(days=i)).date()]
        assert abs(got[0] - level) < 1e-6
        assert abs(got[1] - trend) < 1e-6
        assert abs(got[2] - (level + trend)) < 1e-6


def test_quantile_norm_aligns_source_distributions(spark):
    rows = q_feature_quantile_norm(spark, SF_SMOKE).collect()
    by_source: dict[str, list[float]] = {}
    lo = min(r.n_chars for r in rows)
    hi = max(r.n_chars for r in rows)
    for r in rows:
        by_source.setdefault(r.source, []).append(r.qnorm)
    # equal-sized sources (25 docs each at sf0.001) must map onto the
    # IDENTICAL set of global inverse-CDF values after normalization
    dists = {src: tuple(sorted(v)) for src, v in by_source.items()}
    assert len(set(dists.values())) == 1
    # endpoints pin to the global extrema
    some = next(iter(dists.values()))
    assert some[0] == float(lo) and some[-1] == float(hi)


def test_textrank_path_graph_matches_hand_iteration(spark, tmp_path):
    # docs "a b" and "b c" -> path graph a-b-c; replicate the
    # fixed-iteration damped recurrence independently in Python.
    rows = [(1, "a b", "en", "s0", 3), (2, "b c", "en", "s0", 3)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.id: r.rank for r in q_text_textrank(spark, str(tmp_path)).collect()}

    edges = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
    nodes = sorted({s for s, _ in edges})
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    n = len(nodes)
    rank = {v: _r(1.0 / n, 12) for v in nodes}
    for _ in range(3):
        recv = {v: 0.0 for v in nodes}
        for s, d in edges:
            recv[d] += _r(rank[s] / deg[s], 12)
        rank = {v: _r(0.15 / n + 0.85 * recv[v], 12) for v in nodes}
    assert out == {v: _r(r, 6) for v, r in rank.items()}
    assert out["b"] > out["a"] == out["c"]


def test_croston_equals_sequential_recurrence(spark, tmp_path):
    # One user, purchases on days 0, 2, 3, 7, 8 -> gaps 2, 1, 4, 1;
    # fewer than the 8-row frame so truncation never bites.
    base = dt.datetime(2024, 1, 1)
    days_vals = [(0, 10.0), (2, 6.0), (3, 8.0), (7, 12.0), (8, 4.0)]
    rows = [
        (i, base + dt.timedelta(days=day), 1, "purchase", v, "{}")
        for i, (day, v) in enumerate(days_vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.date: (r.demand_ewma, r.interval_ewma, r.croston_rate)
        for r in q_ts_croston(spark, str(tmp_path)).collect()
    }
    a = 0.3
    sz = sp = 0.0
    gaps = [2.0, 1.0, 4.0, 1.0]
    for (day, v), gap in zip(days_vals[1:], gaps):
        sz = a * v + (1 - a) * sz
        sp = a * gap + (1 - a) * sp
        got = out[(base + dt.timedelta(days=day)).date()]
        assert abs(got[0] - sz) < 1e-6
        assert abs(got[1] - sp) < 1e-6
        assert abs(got[2] - sz / sp) < 1e-6
    assert len(out) == 4  # the first spike has no gap and is excluded


def test_rake_textbook_phrase_scores(spark, tmp_path):
    # "the fast join the fast join scan" -> phrases [fast join],
    # [fast join scan]; deg/freq: fast 5/2, join 5/2, scan 3/1.
    rows = [(1, "the fast join the fast join scan", "en", "s0", 32)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.phrase: (r.len_tokens, r.n_occurrences, r.rake_score)
        for r in q_text_rake(spark, str(tmp_path)).collect()
    }
    assert out == {
        "fast join": (2, 1, 5.0),
        "fast join scan": (3, 1, 8.0),
    }


def test_als_recommendations_shape_and_order(spark):
    rows = q_ml_als(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    # 3 ranked recs per customer with non-increasing scores
    for recs in by_user.values():
        recs.sort(key=lambda r: r.rec_rank)
        assert [r.rec_rank for r in recs] == [1, 2, 3]
        assert recs[0].score >= recs[1].score >= recs[2].score
    # recommended items come from the observed catalog
    import duckdb

    parts = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT l_partkey FROM '{SF_SMOKE}/lineitem.parquet'"
        ).fetchall()
    }
    assert {r.part_id for r in rows} <= parts


def test_hampel_flags_spike_not_neighbors(spark, tmp_path):
    # constant 5.0 series with one 50.0 spike: the spike deviates from
    # its frame median (5.0) by 45 with MAD 0 -> flagged; every other
    # row has deviation 0 -> not flagged (MAD=0 frames flag only
    # strict deviations)
    base = dt.datetime(2024, 1, 1)
    vals = [5.0] * 6 + [50.0] + [5.0] * 6
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
        q_ts_hampel,
    )

    out = {r.event_id: r for r in q_ts_hampel(spark, str(tmp_path)).collect()}
    assert out[6].is_outlier and out[6].med7 == 5.0 and out[6].mad7 == 0.0
    assert not any(out[i].is_outlier for i in range(len(vals)) if i != 6)


def test_graph_jaccard_matches_bruteforce_sets(spark, tmp_path):
    # each edge is co-bought in two orders (the >= 2 support prune
    # keeps it): edges (1,3),(1,4),(2,3),(2,4) -> neighborhoods
    # 1:{3,4} 2:{3,4} 3:{1,2} 4:{1,2}; the single-order pair (5,6)
    # is pruned as noise. jaccard(1,2)=jaccard(3,4)=1.0, c=2.
    orders = [
        (100, [1, 3]), (101, [1, 3]),
        (102, [1, 4]), (103, [1, 4]),
        (104, [2, 3]), (105, [2, 3]),
        (106, [2, 4]), (107, [2, 4]),
        (108, [5, 6]),
    ]
    rows = []
    for ok, parts in orders:
        for i, p in enumerate(parts):
            rows.append((ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
        q_graph_jaccard,
    )

    got = {
        (r.node, r.nbr): (r.n_common, r.jaccard, r.rk)
        for r in q_graph_jaccard(spark, str(tmp_path)).collect()
    }
    # pairs with >= 2 common neighbors: (1,2) share {3,4}, (3,4)
    # share {1,2}; symmetrized, each is its endpoint's rank-1 (and
    # only) kNN entry; parts 5/6 are absent entirely
    nbrs = {1: {3, 4}, 2: {3, 4}, 3: {1, 2}, 4: {1, 2}}
    want = {}
    for a, b in ((1, 2), (2, 1), (3, 4), (4, 3)):
        c = len(nbrs[a] & nbrs[b])
        want[(a, b)] = (c, round(c / len(nbrs[a] | nbrs[b]), 6), 1)
    assert got == want


def test_ldiversity_min_distinct_sensitive(spark, tmp_path):
    # one QI class with a single user (l=1, risky), one with three
    base = dt.datetime(2024, 1, 1, 5)  # hour=5 for all rows
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base, 7, "view", 2.0, "{}"),
        (3, base, 11, "click", 1.0, "{}"),
        (4, base, 12, "click", 2.0, "{}"),
        (5, base, 13, "click", 3.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
        q_dq_ldiversity,
    )

    r = q_dq_ldiversity(spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.l_diversity, r.n_risky_groups, r.n_risky_rows) == (
        2,
        1,
        1,
        2,
    )


def test_downsample_keeps_spike_and_breaks_ties_low_id(spark, tmp_path):
    # one 6h bucket, values [1,1,1,10]: mean 3.25 -> spike wins;
    # second bucket [0,10]: equidistant from mean 5 -> lower id wins
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base + dt.timedelta(hours=1), 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(hours=2), 1, "view", 1.0, "{}"),
        (3, base + dt.timedelta(hours=3), 1, "view", 10.0, "{}"),
        (4, base + dt.timedelta(hours=6), 1, "view", 0.0, "{}"),
        (5, base + dt.timedelta(hours=7), 1, "view", 10.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
        q_ts_downsample,
    )

    out = {
        r.bucket_start: (r.rep_event_id, r.rep_value, r.n_in_bucket)
        for r in q_ts_downsample(spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01 00:00:00"] == (3, 10.0, 4)
    assert out["2024-01-01 06:00:00"] == (4, 0.0, 2)


def test_personalized_pagerank_matches_hand_iteration(spark):
    # path 10-11-12-13 (symmetric), single seed 10: replicate the
    # damped seeded recurrence independently in Python.
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        personalized_pagerank,
    )

    und = [(10, 11), (11, 12), (12, 13)]
    edges_df = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {
        r.id: r.rank
        for r in personalized_pagerank(edges_df, seed_mod=10, iters=3).collect()
    }

    edges = und + [(b, a) for a, b in und]
    nodes = sorted({v for e in edges for v in e})
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    seeds = [v for v in nodes if v % 10 == 0]
    rank = {v: _r(1.0 / len(seeds), 12) if v in seeds else 0.0 for v in nodes}
    for _ in range(3):
        recv = {v: 0.0 for v in nodes}
        for s, d in edges:
            recv[d] += _r(rank[s] / deg[s], 12)
        rank = {
            v: _r(
                (0.15 / len(seeds) if v in seeds else 0.0) + 0.85 * recv[v], 12
            )
            for v in nodes
        }
    assert out == {v: _r(r, 6) for v, r in rank.items()}
    # beyond the seed's immediate neighbor (which soaks up the seed's
    # whole donated mass on a degree-1 path), relatedness decays with
    # distance, and everything stays non-negative
    assert out[11] > out[12] and out[11] > out[10] > out[13] >= 0.0


def test_chunk_dedup_reconstructs_unique_remainder(spark, tmp_path):
    # doc1 = w0..w24 (chunks [w0..w19], [w20..w24]); doc2 copies
    # doc1's first chunk then adds x1..x5 -> its copied chunk drops,
    # reconstruction keeps only "x1 .. x5"; doc3 is untouched.
    import hashlib

    w = [f"w{i}" for i in range(25)]
    doc1 = " ".join(w)
    doc2 = " ".join(w[:20] + ["x1", "x2", "x3", "x4", "x5"])
    doc3 = "u1 u2 u3"
    rows = [(1, doc1, "en", "s0", len(doc1)),
            (2, doc2, "en", "s0", len(doc2)),
            (3, doc3, "en", "s0", len(doc3))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
        q_dedup_chunks,
    )

    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.cleaned_hash)
        for r in q_dedup_chunks(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1] == (2, 2, md5(doc1))
    assert out[2] == (2, 1, md5("x1 x2 x3 x4 x5"))
    assert out[3] == (1, 1, md5(doc3))


def test_forget_subject_rewrites_only_affected_partitions(spark, tmp_path):
    # user 7 appears only on days 1 and 3 of 4; erasure must rewrite
    # exactly those two partition dirs, leave days 2/4's files
    # byte-identical, remove user 7 completely, and keep everyone else.
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.sources.writers import (
        forget_subject,
        write_parquet,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(4):
        for uid in ([7, 1, 2] if day in (0, 2) else [1, 2, 3]):
            rows.append(
                (eid, base + dt.timedelta(days=day), uid, "view", 1.0 * uid, "{}")
            )
            eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("date", F.to_date("ts"))
    path = str(tmp_path / "events_table")
    write_parquet(df, path, partition_by=["date"])

    def file_index(p):
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    fp = os.path.join(root, f)
                    out[fp] = os.path.getmtime(fp)
        return out

    before_files = file_index(path)
    report = {
        r.date: (r.rows_before, r.rows_after)
        for r in forget_subject(spark, path, "user_id", [7]).collect()
    }
    after_files = file_index(path)

    assert report == {"2024-01-01": (3, 2), "2024-01-03": (3, 2)}
    # untouched partitions: identical file paths AND mtimes
    keep = {f: m for f, m in before_files.items() if "date=2024-01-02" in f or "date=2024-01-04" in f}
    assert {f: after_files.get(f) for f in keep} == keep
    # affected partitions actually rewritten (old files gone)
    gone = [f for f in before_files if "date=2024-01-01" in f or "date=2024-01-03" in f]
    assert not any(f in after_files for f in gone)
    final = spark.read.parquet(path)
    assert final.filter(F.col("user_id") == 7).count() == 0
    assert final.count() == len(rows) - 2


def test_forget_subject_clears_partition_of_only_subject_rows(spark, tmp_path):
    # Day 2 consists ENTIRELY of user 7's rows. Dynamic partition
    # overwrite cannot swap in an empty partition (nothing to write),
    # so forget_subject must delete that directory explicitly — the
    # silent-no-op here was the erasure-contract violation flagged in
    # round 5's advice.
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.sources.writers import (
        forget_subject,
        write_parquet,
    )
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day, uids in enumerate([[7, 1], [7, 7, 7], [2, 3]]):
        for uid in uids:
            rows.append(
                (eid, base + dt.timedelta(days=day), uid, "view", 1.0 * uid, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("date", F.to_date("ts"))
    path = str(tmp_path / "events_poisoned")
    write_parquet(df, path, partition_by=["date"])

    report = {
        r.date: (r.rows_before, r.rows_after)
        for r in forget_subject(spark, path, "user_id", [7]).collect()
    }
    # the all-subject partition reports 3 -> 0, not 3 -> 3
    assert report == {"2024-03-01": (2, 1), "2024-03-02": (3, 0)}
    # its directory is gone from disk — no orphaned PII files
    assert not os.path.exists(os.path.join(path, "date=2024-03-02"))
    final = spark.read.parquet(path)
    assert final.filter(F.col("user_id") == 7).count() == 0
    assert sorted(r.date.isoformat() for r in final.select("date").distinct().collect()) == [
        "2024-03-01",
        "2024-03-03",
    ]
    # untouched partition still readable and complete
    assert final.filter(F.col("date") == "2024-03-03").count() == 2


def test_forget_subject_verifies_outcome_not_computed_path(
    spark, tmp_path, monkeypatch
):
    # r6 advice: if _hive_part_value ever diverges from Spark's actual
    # directory rendering, fs.delete/fs.exists both hit a nonexistent
    # path, no error is raised, and the pure-PII partition silently
    # survives. The outcome re-scan must catch this: with a sabotaged
    # renderer, forget_subject now RAISES instead of reporting success.
    import pytest
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.sources import writers

    base = dt.datetime(2024, 5, 1)
    rows = [
        (0, base, 7, "view", 1.0, "{}"),
        (1, base, 7, "view", 2.0, "{}"),  # day 1: all subject rows
        (2, base + dt.timedelta(days=1), 1, "view", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("date", F.to_date("ts"))
    path = str(tmp_path / "events_diverged")
    writers.write_parquet(df, path, partition_by=["date"])

    monkeypatch.setattr(
        writers, "_hive_part_value", lambda v: f"WRONG_{v}"
    )
    with pytest.raises(RuntimeError, match="survive"):
        writers.forget_subject(spark, path, "user_id", [7])
    # the orphaned PII rows are still on disk — the raise is honest
    assert (
        spark.read.parquet(path).filter(F.col("user_id") == 7).count() > 0
    )


def test_forget_subject_clears_every_partition(spark, tmp_path):
    # degenerate erasure: the subject owns the ENTIRE table. All
    # partition dirs are deleted and the report shows rows_after=0
    # without the post-rewrite scan blowing up on an empty path.
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.sources.writers import (
        forget_subject,
        write_parquet,
    )
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 4, 1)
    rows = [
        (i, base + dt.timedelta(days=i % 2), 9, "view", 1.0, "{}")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("date", F.to_date("ts"))
    path = str(tmp_path / "events_all_subject")
    write_parquet(df, path, partition_by=["date"])

    report = {
        r.date: (r.rows_before, r.rows_after)
        for r in forget_subject(spark, path, "user_id", [9]).collect()
    }
    assert report == {"2024-04-01": (2, 0), "2024-04-02": (2, 0)}
    assert not any(
        d.startswith("date=") for d in os.listdir(path)
    ), "all-subject partitions must be deleted"
