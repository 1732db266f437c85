"""Prefix-filtered set-similarity join (AllPairs/PPJoin).

The operator claims EXACT equality with the all-pairs threshold join,
so the tests are differential: same pairs, same jaccard values, on
(a) a crafted corpus containing a boundary pair with J == 0.6 exactly
(the case a float ceil(0.6*5)=4 prefix bound silently drops) and
(b) the sf0.001 documents corpus with and without df pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
    jaccard_pairs,
    prefix_filtered_pairs,
    shingle_table,
)


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_boundary_pair_at_exact_threshold_is_kept(spark):
    # doc 1: 5 distinct 3-gram shingles; doc 2: its first 3 tokens'
    # worth (3 shingles), all shared -> o=3, union=5, J=3/5=0.6 exactly.
    t1 = "a b c d e f g"  # shingles: abc bcd cde def efg (n=5)
    t2 = "a b c d e"  # shingles: abc bcd cde (n=3)
    docs = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    sh = shingle_table(docs, max_df=None)
    got = _pairs(prefix_filtered_pairs(sh, t_num=3, t_den=5))
    assert got == {(1, 2): 0.6}, got


def test_below_threshold_pair_is_dropped(spark):
    t1 = "a b c d e f g h"  # 6 shingles
    t2 = "a b c x y z"  # 4 shingles, 1 shared (abc) -> J = 1/9
    docs = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    got = _pairs(prefix_filtered_pairs(shingle_table(docs, max_df=None)))
    assert got == {}, got


def test_matches_all_pairs_join_on_corpus(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    for max_df in (None, 100):
        sh = shingle_table(docs, max_df=max_df)
        got = _pairs(prefix_filtered_pairs(sh, t_num=3, t_den=5))
        want = _pairs(jaccard_pairs(sh).filter(F.col("jaccard") >= 0.6))
        assert got == want, (max_df, len(got), len(want))
        assert got, "corpus has >=0.6 near-dups by construction"


def test_prefix_filter_threshold_sweep(spark):
    """Unexercised-parameter sweep (the r11 differential discipline):
    every registered consumer runs t=3/5, so the threshold axis itself
    was never exercised. Seeded random corpora from a tiny alphabet vs
    a pure-Python exact-Fraction oracle computed from the SAME shingle
    table, across thresholds including the degenerate ends (1/1 = exact
    set equality, alpha = n, prefix length 1; 1/10 = near-all-pairs
    prefixes)."""
    import random
    from fractions import Fraction

    rng = random.Random(97)
    tokens = "a b c d e f".split()
    for t_num, t_den in ((1, 2), (4, 5), (9, 10), (1, 1), (1, 10), (2, 3)):
        texts = [
            " ".join(rng.choice(tokens) for _ in range(rng.randint(3, 14)))
            for _ in range(10)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        sh = shingle_table(docs, max_df=None)
        got = _pairs(prefix_filtered_pairs(sh, t_num=t_num, t_den=t_den))
        # exact oracle: Fraction jaccard over the same shingle sets
        by_doc: dict[int, set] = {}
        for r in sh.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
        want = {}
        ids = sorted(by_doc)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                o = len(by_doc[a] & by_doc[b])
                if not o:
                    continue
                u = len(by_doc[a] | by_doc[b])
                if Fraction(o, u) >= Fraction(t_num, t_den):
                    want[(a, b)] = round(o / u, 6)
        assert got == want, (t_num, t_den, got, want)


def test_prefix_filter_equals_all_pairs_on_random_corpora(spark):
    """Property check: on randomized small corpora from a tiny token
    alphabet (forcing heavy shingle collisions and boundary jaccards),
    the prefix-filtered join equals the all-pairs threshold join."""
    from hypothesis import given, settings, strategies as st

    tokens = "a b c d e".split()
    doc = st.lists(st.sampled_from(tokens), min_size=3, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=2, max_size=8))
    def run(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        sh = shingle_table(docs, max_df=None)
        got = _pairs(prefix_filtered_pairs(sh, t_num=3, t_den=5))
        want = _pairs(jaccard_pairs(sh).filter(F.col("jaccard") >= 0.6))
        assert got == want, (texts, got, want)

    run()
