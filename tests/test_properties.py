"""Property-based checks (hypothesis) for aggregation/window algebra
(SURVEY.md SS5 strategy 3)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators import windows as W
from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import sum_exact

values = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(values)
def test_hourly_sums_regroup_to_total(spark, vs):
    # data_preprocessing.py:250-252 invariant: two-level rollup total
    # equals one-level total (decimal accumulation makes it exact)
    pdf = pd.DataFrame({"g": [i % 3 for i in range(len(vs))], "v": vs})
    df = spark.createDataFrame(pdf)
    two_level = (
        df.groupBy("g").agg(sum_exact("v").alias("s"))
        .agg(sum_exact("s").alias("total")).collect()[0]["total"]
    )
    one_level = df.agg(sum_exact("v").alias("total")).collect()[0]["total"]
    assert abs(two_level - one_level) < 1e-5


@settings(max_examples=10, deadline=None)
@given(values)
def test_rolling_sum_equals_sum_of_lags(spark, vs):
    # rolling_sum over (-3,-1) == lag1+lag2+lag3 where all lags exist
    pdf = pd.DataFrame({"e": ["x"] * len(vs), "t": range(len(vs)), "v": vs})
    w = W.entity_window("e", "t")
    df = spark.createDataFrame(pdf)
    df = W.with_trailing_stats(df, "v", w, 3, stats=("sum",))
    df = W.with_lags(df, "v", w, [1, 2, 3], prefix="lag_")
    rows = df.filter(F.col("lag_3").isNotNull()).collect()
    for r in rows:
        expected = r["lag_1"] + r["lag_2"] + r["lag_3"]
        assert abs((r["rolling_sum_3r"] or 0.0) - round(expected, 6)) < 1e-4


def test_approx_aggregates_near_exact(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.percentile("value", 0.5).alias("p50_exact"),
        F.percentile_approx("value", 0.5, 10_000).alias("p50_approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["p50_approx"] - row["p50_exact"]) / abs(row["p50_exact"]) < 0.05


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=80))
def test_rolling_hash_matches_python_reference(spark, s):
    from smart_energy_consumption_analytics_using_big_data_spark.functions.textfns import (
        rolling_hash,
    )

    df = spark.createDataFrame(pd.DataFrame({"text": [s]}))
    got = df.select(rolling_hash(F.col("text")).alias("h")).collect()[0]["h"]
    ref = 0
    for ch in s:
        ref = (ref * 257 + ord(ch)) % 2147483647
    assert got == ref


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_endpoints_agree(spark, es):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        connected_components,
    )

    es = [(a, b) for a, b in es if a != b]
    pdf = pd.DataFrame({"id_a": [a for a, _ in es], "id_b": [b for _, b in es]})
    labels = {
        r["id"]: r["component"]
        for r in connected_components(spark.createDataFrame(pdf)).collect()
    }
    # every edge's endpoints land in the same component, and each
    # component is labeled by its minimum member
    for a, b in es:
        assert labels[a] == labels[b]
    comp_members: dict = {}
    for node, comp in labels.items():
        comp_members.setdefault(comp, []).append(node)
    for comp, members in comp_members.items():
        assert comp == min(members)


def test_merge_upsert_is_idempotent(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.operators.relational import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0], "tag": ["a", "b", "c"]})
    )
    updates = spark.createDataFrame(pd.DataFrame({"k": [2, 9], "v": [99.0, 9.0], "tag": ["B", "I"]}))
    once = merge_upsert(target, updates, ["k"])
    twice = merge_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    got = {r["k"]: (r["v"], r["tag"]) for r in once.collect()}
    assert got == {1: (10.0, "a"), 2: (99.0, "B"), 3: (30.0, "c"), 9: (9.0, "I")}


def test_pack_sequences_conserves_tokens_and_docs(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.functions import textfns as TX
    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    packs = QUERIES["q_pack_sequences"](spark, sf)
    docs = load_table(spark, sf, "documents")
    n_docs = docs.count()
    total_tok = docs.select(
        F.sum(TX.token_count_bpeish(F.col("text"))).alias("s")
    ).collect()[0]["s"]
    agg = packs.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("tok")
    ).collect()[0]
    # packing is a partition of the corpus: nothing dropped, nothing doubled
    assert agg["docs"] == n_docs
    assert agg["tok"] == total_tok
    # chunking invariant: within a shard, the cumulative token count
    # through any non-last pack reaches that pack's upper boundary
    # (otherwise a later doc would have started in this pack instead)
    from pyspark.sql import Window

    w = Window.partitionBy("shard")
    wcum = w.orderBy("pack_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    violations = (
        packs.withColumn("last_pack", F.max("pack_id").over(w))
        .withColumn("cum_tok", F.sum("total_tokens").over(wcum))
        .filter(
            (F.col("pack_id") != F.col("last_pack"))
            & (F.col("cum_tok") < (F.col("pack_id") + 1) * 512)
        )
        .count()
    )
    assert violations == 0


def test_scd2_null_attribute_transitions(spark):
    """NULL attribute values through the SCD2 builder: a key whose
    FIRST version is NULL must still open a version (the documented
    row_number guard — eqNullSafe(NULL, lag=NULL) would collapse it),
    NULL->value and value->NULL are real transitions, and consecutive
    NULLs collapse into one version."""
    import datetime as dt

    from smart_energy_consumption_analytics_using_big_data_spark.operators.relational import (
        scd2_from_changelog,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: NULL, NULL (collapse), "x", NULL -> 3 versions
        (1, None, base, 1),
        (1, None, base + dt.timedelta(days=1), 2),
        (1, "x", base + dt.timedelta(days=2), 3),
        (1, None, base + dt.timedelta(days=3), 4),
        # key 2: value -> NULL -> same value again -> 3 versions
        (2, "y", base, 1),
        (2, None, base + dt.timedelta(days=1), 2),
        (2, "y", base + dt.timedelta(days=2), 3),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, seq int")
    hist = {
        k: sorted(
            [(r["attr"], r["valid_from"], r["valid_to"]) for r in rs],
            key=lambda t: t[1],
        )
        for k, rs in (
            (k, [r for r in scd2_from_changelog(df, ["k"], "attr", "ts", ["seq"]).collect() if r["k"] == k])
            for k in (1, 2)
        )
    }
    assert [a for a, *_ in hist[1]] == [None, "x", None]
    assert [a for a, *_ in hist[2]] == ["y", None, "y"]
    for versions in hist.values():
        # intervals chain and the last is open
        for (_, _, to_a), (_, frm_b, _) in zip(versions, versions[1:]):
            assert to_a == frm_b
        assert versions[-1][2] is None


def test_fuzzy_join_degenerate_and_unicode_strings(spark):
    """The axes the random strategy never generates: empty strings
    (deletion neighborhood is just {''}; ed('', single-char) = 1 must
    still be found through the shared '' variant), multi-byte unicode
    (Spark length/substring count CHARACTERS — a byte-based blocking
    would split codepoints), and strings differing only by a diacritic
    (ed 1 at character level)."""
    import itertools

    from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import (
        fuzzy_join_ed1,
    )

    names = ["", "a", "ab", "café", "cafe", "cafés", "日本", "日本語", "独本"]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pdf = pd.DataFrame({"id": range(len(names)), "name": names})
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_join_ed1(
            spark.createDataFrame(pdf), spark.createDataFrame(pdf),
            "id", "name", "id", "name",
        ).collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want
    # the load-bearing cases, by name
    byname = {n: i for i, n in enumerate(names)}
    assert (byname[""], byname["a"]) in got
    assert (byname["café"], byname["cafe"]) in got
    assert (byname["日本"], byname["日本語"]) in got
    assert (byname["日本"], byname["独本"]) in got


name_strings = st.lists(
    st.text(alphabet="abc01", min_size=1, max_size=6),
    min_size=2,
    max_size=12,
    unique=True,
)


@settings(max_examples=10, deadline=None)
@given(name_strings)
def test_fuzzy_join_matches_bruteforce_levenshtein(spark, names):
    # FastSS blocking must find EXACTLY the edit-distance<=1 pairs the
    # quadratic brute force finds - no false negatives from blocking,
    # no false positives surviving the verify step
    import itertools

    from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import (
        fuzzy_join_ed1,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pdf = pd.DataFrame({"id": range(len(names)), "name": names})
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_join_ed1(
            spark.createDataFrame(pdf), spark.createDataFrame(pdf),
            "id", "name", "id", "name",
        ).collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want


_changelog = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # ts (seconds offset)
        st.sampled_from(["A", "B", "C"]),        # attr
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(_changelog)
def test_scd2_reconstructs_changelog_state(spark, rows):
    """For every probe instant, the SCD2 version covering it must carry
    exactly the changelog's most recent attribute at/before it (ties on
    ts broken by sequence number, matching the operator's tiebreak)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.operators.relational import (
        scd2_from_changelog,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(seconds=ts), attr, i)
        for i, (k, ts, attr) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k int, ts timestamp, attr string, seq int")
    hist = scd2_from_changelog(df, ["k"], "attr", "ts", ["seq"]).collect()

    # brute-force truth: last (ts, seq) <= probe per key
    by_key = {}
    for k, ts, attr, seq in data:
        by_key.setdefault(k, []).append((ts, seq, attr))
    for vals in by_key.values():
        vals.sort()

    probes = sorted({ts for _, ts, _, _ in data})
    for k, vals in by_key.items():
        versions = sorted(
            (r for r in hist if r["k"] == k), key=lambda r: r["valid_from"]
        )
        # versions tile the key's lifetime: contiguous, last one open
        assert versions[-1]["valid_to"] is None and versions[-1]["is_current"]
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]
        for probe in probes:
            want = None
            for ts, seq, attr in vals:
                if ts <= probe:
                    want = attr
            covering = [
                r
                for r in versions
                if r["valid_from"] <= probe
                and (r["valid_to"] is None or probe < r["valid_to"])
            ]
            if want is None:
                assert covering == []
            else:
                assert len(covering) == 1 and covering[0]["attr"] == want


@settings(max_examples=10, deadline=None)
@given(_changelog, _changelog)
def test_asof_join_equals_bruteforce_both_directions(spark, lrows, rrows):
    import datetime as dt

    from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    left = [
        (k, base + dt.timedelta(seconds=ts), i)
        for i, (k, ts, _) in enumerate(lrows)
    ]
    # right unique per (key, ts): keep the first attr seen
    seen = {}
    for k, ts, attr in rrows:
        seen.setdefault((k, base + dt.timedelta(seconds=ts)), attr)
    right = [(k, ts, attr) for (k, ts), attr in seen.items()]

    ldf = spark.createDataFrame(left, "k int, ts timestamp, lid int")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, v string")

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["v"]
            for r in asof_join(ldf, rdf, "k", direction=direction).collect()
        }
        for k, lts, lid in left:
            if direction == "backward":
                cands = [(ts, v) for (kk, ts, v) in right if kk == k and ts <= lts]
                want = max(cands)[1] if cands else None
            else:
                cands = [(ts, v) for (kk, ts, v) in right if kk == k and ts >= lts]
                want = min(cands)[1] if cands else None
            assert got[lid] == want, (direction, lid)

    # nearest: closest |ts diff|, ties -> earlier right row (backward)
    got = {
        r["lid"]: r["v"] for r in asof_join(ldf, rdf, "k", direction="nearest").collect()
    }
    for k, lts, lid in left:
        cands = [(abs((ts - lts).total_seconds()), ts, v) for (kk, ts, v) in right if kk == k]
        want = min(cands)[2] if cands else None
        assert got[lid] == want, ("nearest", lid)

    # tolerance axis (unexercised by every registered consumer): the
    # directional match must also lie within tolerance_s — pandas
    # merge_asof semantics (the nearest candidate is the ONLY
    # candidate; outside tolerance means NO match, never a farther one)
    for tol in (0, 7, 20):
        for direction in ("backward", "forward", "nearest"):
            got = {
                r["lid"]: r["v"]
                for r in asof_join(
                    ldf, rdf, "k", direction=direction, tolerance_s=tol
                ).collect()
            }
            for k, lts, lid in left:
                if direction == "backward":
                    cands = [
                        (ts, v)
                        for (kk, ts, v) in right
                        if kk == k and ts <= lts and (lts - ts).total_seconds() <= tol
                    ]
                    want = max(cands)[1] if cands else None
                elif direction == "forward":
                    cands = [
                        (ts, v)
                        for (kk, ts, v) in right
                        if kk == k and ts >= lts and (ts - lts).total_seconds() <= tol
                    ]
                    want = min(cands)[1] if cands else None
                else:
                    cands = [
                        (abs((ts - lts).total_seconds()), ts, v)
                        for (kk, ts, v) in right
                        if kk == k and abs((ts - lts).total_seconds()) <= tol
                    ]
                    want = min(cands)[2] if cands else None
                assert got[lid] == want, (direction, tol, lid)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_pair_counts_equal_bruteforce(spark, texts):
    from collections import Counter

    from smart_energy_consumption_analytics_using_big_data_spark.functions.textfns import bpe_pair_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(docs).collect()}
    want: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    want[w[i : i + 2]] += 1
    assert got == dict(want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=2, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_merge_rounds_equal_bruteforce(spark, texts):
    """The declarative 3-round merge DAG == a sequential Python BPE
    trainer (word-freq compaction, TOKEN-DELIMITED greedy left-to-right
    merge apply per Sennrich 2016, ties broken lexicographically)."""
    from collections import Counter

    from smart_energy_consumption_analytics_using_big_data_spark.functions.textfns import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["merge_round"]: (r["pair"], r["n"])
        for r in bpe_learn_merges(docs, n_merges=3).collect()
    }

    def apply_merge(sym: str, left: str, right: str) -> str:
        # whole-symbol greedy non-overlapping merge — a substring
        # replace would also fire where `left` is the suffix of a
        # longer symbol (the pre-r9 engine bug this test now rejects)
        parts = sym.split(" ")
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == left and parts[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        return " ".join(out)

    # reference: same vocab-compacted greedy trainer in plain Python
    wf = Counter(w for t in texts for w in t.split(" ") if len(w) >= 2)
    state = {(" ".join(w)): n for w, n in wf.items()}
    # identical words collapse to one symbol string; counts merge
    merged_state: Counter = Counter()
    for sym, n in state.items():
        merged_state[sym] += n
    want = {}
    for rnd in range(1, 4):
        pc: Counter = Counter()
        for sym, n in merged_state.items():
            parts = sym.split(" ")
            for i in range(len(parts) - 1):
                pc[parts[i] + " " + parts[i + 1]] += n
        if not pc:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[rnd] = top
        lft, rgt = top[0].split(" ")
        nxt: Counter = Counter()
        for sym, n in merged_state.items():
            nxt[apply_merge(sym, lft, rgt)] += n
        merged_state = nxt
    assert got == want


def test_merge_upsert_null_update_overwrites(spark):
    # MERGE takes the matched update row wholesale: an update that sets
    # a column to NULL must overwrite, not resurrect the target value
    # (the coalesce-per-column shape could never express this)
    from smart_energy_consumption_analytics_using_big_data_spark.operators.relational import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0], "tag": ["a", "b"]})
    )
    updates = spark.createDataFrame([(2, None, "B")], "k long, v double, tag string")
    out = {r["k"]: (r["v"], r["tag"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: (10.0, "a"), 2: (None, "B")}
