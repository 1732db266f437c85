"""Arrow-path MinHash pipeline (PERFORMANCE.md round 4).

The hash family differs from the oracled md5 path, so correctness
splits into (a) MinHash invariants that hold for any family — exact
duplicates get identical signatures, disjoint docs get disjoint-ish
ones, banding finds exact dups with probability 1 — and (b) the
verify stage's exact Jaccard, which is hash-independent and must equal
the oracled `jaccard_pairs` values for the same pairs.
"""

from __future__ import annotations

from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
    jaccard_pairs,
    minhash_lsh_arrow,
    minhash_signatures_arrow,
    shingle_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog and keeps on running through the field"


def test_signatures_deterministic_and_duplicate_invariant(spark):
    rows = [(1, BASE), (2, BASE), (3, "completely different words entirely " * 5)]
    sigs1 = {r.doc_id: tuple(r)[1:] for r in minhash_signatures_arrow(_docs(spark, rows)).collect()}
    sigs2 = {r.doc_id: tuple(r)[1:] for r in minhash_signatures_arrow(_docs(spark, rows)).collect()}
    assert sigs1 == sigs2, "signatures must be deterministic across runs"
    assert sigs1[1] == sigs1[2], "exact duplicates must share every component"
    assert sigs1[1] != sigs1[3]


def test_lsh_arrow_finds_duplicates_and_verifies_exact_jaccard(spark):
    near = BASE + " with a small tail change"
    rows = [(1, BASE), (2, BASE), (3, near), (4, "unrelated text about completely other topics " * 4)]
    docs = _docs(spark, rows)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_arrow(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    # verify-stage jaccard equals the oracle-path exact jaccard for the
    # same pairs (hash-family-independent): compare on unpruned shingles
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(shingle_table(docs, max_df=None)).collect()
    }
    for pair, j in got.items():
        assert exact[pair] == j, (pair, exact[pair], j)


def test_lsh_arrow_on_corpus_jaccard_matches_oracle_path(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_arrow(docs).collect()}
    assert got, "corpus has near-dups by construction"
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(shingle_table(docs, max_df=None)).collect()
    }
    for pair, j in got.items():
        assert exact[pair] == j, (pair, exact[pair], j)


def test_max_bucket_caps_hub_buckets_but_keeps_small_groups(spark):
    """A B-doc duplicate family emits B^2/2 pairs; max_bucket drops the
    hub bucket while small groups survive untouched."""
    hub = "identical boilerplate text repeated across many documents here"
    pair = "a rare shared passage that only these two documents contain ok"
    rows = [(i, hub) for i in range(10)] + [(100, pair), (101, pair)]
    docs = _docs(spark, rows)
    uncapped = minhash_lsh_arrow(docs).collect()
    capped = minhash_lsh_arrow(docs, max_bucket=5).collect()
    un_pairs = {(r.doc_a, r.doc_b) for r in uncapped}
    cap_pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert (100, 101) in un_pairs and (100, 101) in cap_pairs
    assert any(a < 10 and b < 10 for a, b in un_pairs)
    assert not any(a < 10 and b < 10 for a, b in cap_pairs)


def test_simhash_arrow_invariants(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import simhash_arrow

    near = BASE + " tail"
    rows = [(1, BASE), (2, BASE), (3, near), (4, "zq wx kj vb nm pl io uy " * 4)]
    docs = _docs(spark, rows)
    a = {r.doc_id: r.simhash for r in simhash_arrow(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash_arrow(docs).collect()}
    assert a == b and all(len(v) == 32 and set(v) <= {"0", "1"} for v in a.values())
    assert a[1] == a[2], "exact duplicates share the fingerprint"

    def ham(x, y):
        return sum(c1 != c2 for c1, c2 in zip(x, y))

    assert ham(a[1], a[3]) < ham(a[1], a[4]), "near-dup closer than unrelated"


def test_simhash_pairs_bitcount_equals_string_hamming_and_cap(spark):
    """The int-xor bit_count hamming must equal the definitional
    per-character hamming on the same fingerprints, and max_bucket
    must drop hub-block buckets while keeping small groups."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        simhash,
        simhash_candidate_pairs,
    )

    hub = "identical boilerplate text repeated across many documents here"
    rows = [(i, hub) for i in range(10)] + [
        (100, BASE),
        (101, BASE + " tail"),
        (200, "zq wx kj vb nm pl io uy " * 4),
    ]
    fps = simhash(_docs(spark, rows))
    fp_str = {r.doc_id: r.simhash for r in fps.collect()}
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_candidate_pairs(fps).collect()}
    assert got, "hub family guarantees candidate pairs"
    for (a, b), h in got.items():
        expect = sum(c1 != c2 for c1, c2 in zip(fp_str[a], fp_str[b]))
        assert h == expect, ((a, b), h, expect)
    assert (100, 101) in got, "near-dup pair found"

    capped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_candidate_pairs(fps, max_bucket=5).collect()
    }
    assert (100, 101) in capped, "small group survives the cap"
    assert not any(a < 10 and b < 10 for a, b in capped), "hub bucket dropped"


def test_stateful_v2_gated_on_protobuf(spark):
    """transformWithStateInPandas needs google.protobuf; without it the
    operator must fail fast with a clear error (and with it, match the
    batch aggregate exactly)."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful_v2 import (
        HAS_TWS_DEPS,
        stream_user_typed_stats,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    if not HAS_TWS_DEPS:
        import pytest

        with pytest.raises(RuntimeError, match="protobuf"):
            stream_user_typed_stats(spark, path)
        return
    updates = stream_user_typed_stats(spark, path)
    final = updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
        F.max("n_types").alias("n_types"),
    )
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    truth = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
    assert final.exceptAll(truth).count() == 0
    assert truth.exceptAll(final).count() == 0
