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


def test_curate_cli_chain(spark, tmp_path):
    """End-to-end curation chain on sf0.001 embeddings: monotone stage
    counts, complete artifacts, dense training slots, determinism."""
    import json

    from smart_energy_consumption_analytics_using_big_data_spark.pipeline.curate import (
        curate_embeddings,
    )

    out = tmp_path / "curated"
    s = curate_embeddings(
        spark, "/root/testdata/sf0.001", str(out), coreset_k=4, shards=4
    )
    assert s["n_raw"] >= s["n_after_integrity"] >= s["n_after_semantic_dedup"] > 0
    curated = spark.read.parquet(str(out / "curated.parquet"))
    assert curated.count() == s["n_after_semantic_dedup"]
    assert {"vec_id", "embedding", "shard", "pos"} <= set(curated.columns)
    coreset = spark.read.parquet(str(out / "coreset.parquet"))
    assert coreset.count() == 4
    # coreset representatives must come from the curated survivors
    kept_ids = {r.vec_id for r in curated.select("vec_id").collect()}
    assert {r.vec_id for r in coreset.collect()} <= kept_ids
    assert json.loads((out / "summary.json").read_text()) == s
    s2 = curate_embeddings(
        spark, "/root/testdata/sf0.001", str(tmp_path / "c2"), coreset_k=4, shards=4
    )
    assert s2 == s
