"""Deterministic per-epoch corpus shuffle (pipeline/corpus.shuffle_order)."""

from __future__ import annotations

from smart_energy_consumption_analytics_using_big_data_spark.pipeline.corpus import shuffle_order


def _order(df):
    return {r.doc_id: (r.shard, r.pos) for r in df.collect()}


def test_partition_layout_invariant_and_seed_sensitivity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    base = _order(shuffle_order(docs, seed=1))
    assert _order(shuffle_order(docs.repartition(13), seed=1)) == base
    other = _order(shuffle_order(docs, seed=2))
    assert other != base, "a new epoch seed must re-permute the corpus"
    assert set(other) == set(base), "every doc keeps exactly one slot"


def test_slots_are_dense_per_shard(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    out = shuffle_order(docs, seed=3, shards=4).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_kcenter_radius_sequence_and_determinism(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import kcenter_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = sorted(
        ((r.sel_rank, r.vec_id, r.radius) for r in kcenter_select(emb, k=5).collect())
    )
    assert [r for r, _, _ in out] == [1, 2, 3, 4, 5]
    assert len({v for _, v, _ in out}) == 5, "centers must be distinct"
    radii = [rad for _, _, rad in out][1:]  # rank-1 radius is 0 by convention
    assert all(a >= b for a, b in zip(radii, radii[1:])), (
        "greedy coverage radius must be non-increasing: " + str(radii)
    )
    out2 = sorted(
        ((r.sel_rank, r.vec_id, r.radius) for r in kcenter_select(emb, k=5).collect())
    )
    assert out == out2
