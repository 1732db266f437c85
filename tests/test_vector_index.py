"""Persisted IVF index (ext/vector_index.py): search parity with the
train-inline path (exact, including the cell column's dtype), and the
partition-pruning property that makes the artifact worth having — a
probe must physically scan only the probed cells' partitions."""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import ann_topk_ivf
from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
    append_ivf_index,
    build_ivf_index,
    search_ivf_index,
)
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

from tests.conftest import SF_SMOKE


def test_ivf_index_build_search_parity_and_pruning(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_index")
    meta = build_ivf_index(emb, idx)
    assert meta["n_vectors"] == emb.count()
    assert meta["n_cells"] == emb.select("label").distinct().count()
    assert meta["n_nonempty_cells"] <= meta["n_cells"]
    disk = json.loads(open(f"{idx}/index_meta.json").read())
    assert disk == meta

    for qid, k, nprobe in ((3, 10, 2), (77, 5, 1), (123, 8, meta["n_cells"])):
        query = emb.filter(F.col("vec_id") == qid)
        want_df = ann_topk_ivf(emb, query, k=k, nprobe=nprobe)
        got_df = search_ivf_index(spark, idx, query, k=k, nprobe=nprobe)
        # exact parity INCLUDING the cell dtype (the partition round
        # trip must not retype the cell — it rides as a data column)
        assert dict(got_df.dtypes)["cell"] == dict(want_df.dtypes)["cell"]
        want = [(r["vec_id"], r["cell"], r["cosine"]) for r in want_df.collect()]
        got = [(r["vec_id"], r["cell"], r["cosine"]) for r in got_df.collect()]
        assert got == want, (qid, k, nprobe)

    # nprobe = n_cells (the CENTROID count) degenerates to exact
    # search: the query vector itself must be rank 1 at cosine 1.0
    full = search_ivf_index(
        spark, idx, emb.filter("vec_id = 3"), k=1, nprobe=meta["n_cells"]
    ).collect()
    assert full[0]["vec_id"] == 3 and full[0]["cosine"] == 1.0


def test_ivf_search_rejects_bad_queries(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_badq")
    meta = build_ivf_index(emb, idx)
    # empty query set -> clear error, not silently empty hits
    with pytest.raises(ValueError, match="query has no rows"):
        search_ivf_index(spark, idx, emb.filter("vec_id = -1"), k=3)
    # wrong-dimension query -> clear error, not NULL cosines
    bad = emb.limit(1).select(
        "vec_id", F.slice("embedding", 1, meta["dim"] - 1).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        search_ivf_index(spark, idx, bad, k=3)
    # empty corpus -> build refuses before any write work
    with pytest.raises(ValueError, match="empty"):
        build_ivf_index(emb.filter("vec_id < 0"), str(tmp_path / "never"))


def test_cli_vector_index_and_search(spark, tmp_path, capsys):
    from smart_energy_consumption_analytics_using_big_data_spark import cli

    idx = str(tmp_path / "cli_idx")
    capsys.readouterr()
    cli.main(["vector-index", "--embeddings", SF_SMOKE, "--out", idx])
    built = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert built["stage"] == "vector-index" and built["n_vectors"] == 500
    cli.main(
        ["vector-search", "--embeddings", SF_SMOKE, "--index", idx,
         "--query-id", "3", "--k", "5", "--nprobe", "2"]
    )
    res = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert len(res["hits"]) == 5
    assert res["hits"][0]["vec_id"] == 3 and res["hits"][0]["cosine"] == 1.0
    assert res["hits"] == sorted(res["hits"], key=lambda h: (-h["cosine"], h["vec_id"]))
    # a typo'd id errors out instead of printing empty hits
    with pytest.raises(SystemExit):
        cli.main(
            ["vector-search", "--embeddings", SF_SMOKE, "--index", idx,
             "--query-id", "999999", "--k", "5"]
        )


def test_ivf_index_append_parity(spark, tmp_path):
    """build(A) + append(B) with the frozen quantizer must produce the
    EXACT artifact a one-shot pack of A∪B with the same centroids
    yields — rowset-identical lists, updated meta, pruning intact —
    and exact search (nprobe = n_cells) over the appended index must
    match brute-force cosine over the full corpus."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import ivf_assign

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base, delta = emb.filter("vec_id < 350"), emb.filter("vec_id >= 350")
    idx = str(tmp_path / "ivf_append")
    meta0 = build_ivf_index(base, idx)
    meta1 = append_ivf_index(delta, idx)
    assert meta1["n_vectors"] == emb.count()
    assert meta1["n_cells"] == meta0["n_cells"], "append must not retrain"
    assert meta1["n_nonempty_cells"] >= meta0["n_nonempty_cells"]
    assert json.loads(open(f"{idx}/index_meta.json").read()) == meta1

    # rowset parity vs a one-shot pack with the SAME frozen centroids
    cents = spark.read.parquet(f"{idx}/centroids.parquet")
    want = {
        (r["vec_id"], r["cell"])
        for r in ivf_assign(emb, cents).select("vec_id", "cell").collect()
    }
    lists = spark.read.parquet(f"{idx}/lists.parquet")
    got = {(r["vec_id"], r["cell"]) for r in lists.select("vec_id", "cell").collect()}
    assert got == want

    # exact search over an APPENDED vector: self at rank 1, and the
    # (vec_id, cosine) top-k equals a full brute-force scan (at
    # nprobe = n_cells the frozen-vs-retrained assignment split cannot
    # matter — every cell is scanned)
    query = emb.filter("vec_id = 400")
    full = search_ivf_index(spark, idx, query, k=5, nprobe=meta1["n_cells"])
    got_top = [(r["vec_id"], r["cosine"]) for r in full.collect()]
    assert got_top[0] == (400, 1.0)
    brute = ann_topk_ivf(emb, query, k=5, nprobe=meta1["n_cells"])
    assert got_top == [(r["vec_id"], r["cosine"]) for r in brute.collect()]

    # partition pruning survives the append (appended files land
    # INSIDE hive partitions, never beside them)
    out = search_ivf_index(spark, idx, query, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell_part", plan), plan[:2000]

    # guards: empty batch and wrong-dim batch refuse before writing
    with pytest.raises(ValueError, match="empty"):
        append_ivf_index(emb.filter("vec_id < 0"), idx)
    bad = delta.limit(1).select(
        "vec_id", F.slice("embedding", 1, meta1["dim"] - 1).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        append_ivf_index(bad, idx)
    # a MIXED-dimension batch must refuse too — first-row-only checks
    # would pass it and permanently write NULL-cosine rows
    mixed = emb.filter("vec_id IN (400, 401)").select(
        "vec_id",
        F.when(
            F.col("vec_id") == 401,
            F.slice("embedding", 1, meta1["dim"] - 1),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    with pytest.raises(ValueError, match="mixed"):
        append_ivf_index(mixed, idx)
    assert json.loads(open(f"{idx}/index_meta.json").read()) == meta1


def test_cli_vector_index_append(spark, tmp_path, capsys):
    from smart_energy_consumption_analytics_using_big_data_spark import cli

    idx = str(tmp_path / "cli_idx_append")
    capsys.readouterr()
    cli.main(["vector-index", "--embeddings", SF_SMOKE, "--out", idx, "--max-id", "350"])
    built = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert built["stage"] == "vector-index" and built["n_vectors"] == 350
    cli.main(
        ["vector-index", "--embeddings", SF_SMOKE, "--out", idx, "--append", "--min-id", "350"]
    )
    appended = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert appended["stage"] == "vector-index-append"
    assert appended["n_vectors"] == 500 and appended["n_cells"] == built["n_cells"]
    cli.main(
        ["vector-search", "--embeddings", SF_SMOKE, "--index", idx,
         "--query-id", "400", "--k", "3", "--nprobe", "2"]
    )
    res = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert res["hits"][0]["vec_id"] == 400 and res["hits"][0]["cosine"] == 1.0


def test_ivf_index_compact_after_appends(spark, tmp_path):
    """compact_ivf_index: after several appends the cells hold many
    small files; compaction shrinks the file count to ~one per cell
    while the ROWSET, meta, search results and the probe's partition
    pruning are all invariant."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        compact_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_compact")
    build_ivf_index(emb.filter("vec_id < 200"), idx)
    for lo, hi in ((200, 300), (300, 400), (400, 500)):
        append_ivf_index(emb.filter(f"vec_id >= {lo} AND vec_id < {hi}"), idx)
    lists = spark.read.parquet(f"{idx}/lists.parquet")
    before_rows = {(r["vec_id"], r["cell"]) for r in lists.select("vec_id", "cell").collect()}
    before_hits = [
        (r["vec_id"], r["cosine"])
        for r in search_ivf_index(spark, idx, emb.filter("vec_id = 450"), k=5, nprobe=2).collect()
    ]
    out = compact_ivf_index(spark, idx)
    assert out["files_after"] < out["files_before"], out
    assert out["files_after"] <= out["n_nonempty_cells"], out
    assert out["n_vectors"] == 500
    # staging dir swapped away, no leftovers
    import os
    assert not os.path.exists(f"{idx}/lists.parquet.compacting")
    after = spark.read.parquet(f"{idx}/lists.parquet")
    after_rows = {(r["vec_id"], r["cell"]) for r in after.select("vec_id", "cell").collect()}
    assert after_rows == before_rows
    got = search_ivf_index(spark, idx, emb.filter("vec_id = 450"), k=5, nprobe=2)
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == before_hits
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell_part", plan), plan[:2000]
    # oversized-cell path: a tiny target forces ceil(rows/target) > 1
    # buckets per cell — several writer tasks, several files, rowset
    # still invariant (the multi-bucket branch the default-target run
    # never touches)
    out2 = compact_ivf_index(spark, idx, target_rows_per_file=20)
    assert out2["files_after"] > out2["n_nonempty_cells"], out2
    after2 = spark.read.parquet(f"{idx}/lists.parquet")
    assert {
        (r["vec_id"], r["cell"]) for r in after2.select("vec_id", "cell").collect()
    } == before_rows
    # CLI path (also restores ~one file per cell after the split above)
    from smart_energy_consumption_analytics_using_big_data_spark import cli

    cli.main(["vector-index", "--out", idx, "--compact"])
    # --embeddings still required for build/append
    with pytest.raises(SystemExit, match="required unless"):
        cli.main(["vector-index", "--out", idx])


def test_ivf_index_probe_prunes_partitions(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_index2")
    meta = build_ivf_index(emb, idx)
    assert meta["n_cells"] >= 3, "need multiple cells for pruning to mean anything"
    query = emb.filter("vec_id = 9")
    out = search_ivf_index(spark, idx, query, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probed-cell filter must land INSIDE the PartitionFilters
    # bracket of the lists scan (an empty 'PartitionFilters: []' with a
    # post-scan row filter would read every partition)
    assert re.search(r"PartitionFilters: \[[^\]]*cell_part", plan), plan[:2000]
    assert out.count() == 5
    # direct evidence: lists are genuinely split across partitions
    lists = spark.read.parquet(f"{idx}/lists.parquet")
    per_cell = {
        r["cell_part"]: r["n"]
        for r in lists.groupBy("cell_part").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per_cell.values()) == meta["n_vectors"]
    assert min(per_cell.values()) < meta["n_vectors"]


def test_ivf_index_delete_lifecycle(spark, tmp_path):
    """delete_from_ivf_index: tombstoned ids vanish from every probe
    immediately (logical), survive an append, and are physically
    reclaimed by compaction — after which the lists are rowset-equal to
    packing the surviving corpus with the same frozen centroids and the
    tombstone table is gone. Repeat/absent-id deletes are no-ops."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import ivf_assign
    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        compact_ivf_index,
        delete_from_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_delete")
    meta0 = build_ivf_index(emb.filter("vec_id < 400"), idx)

    # exact search (nprobe = n_cells) before/after the delete: the
    # victims are the query's own id and its top neighbours, so rank 1
    # must CHANGE, not just shrink
    query = emb.filter("vec_id = 9")
    before = [
        (r["vec_id"], r["cosine"])
        for r in search_ivf_index(spark, idx, query, k=5, nprobe=meta0["n_cells"]).collect()
    ]
    victims = [vid for vid, _ in before[:2]]  # includes vec_id 9 itself
    meta1 = delete_from_ivf_index(spark, idx, victims)
    assert meta1["n_tombstones"] == 2
    assert meta1["n_vectors"] == 400, "logical delete must not rewrite lists"
    after = [
        (r["vec_id"], r["cosine"])
        for r in search_ivf_index(spark, idx, query, k=5, nprobe=meta0["n_cells"]).collect()
    ]
    survivors_of_before = [t for t in before if t[0] not in set(victims)]
    assert all(t[0] not in set(victims) for t in after)
    # exact search: the surviving prefix of the old ranking must hold
    assert after[: len(survivors_of_before)] == survivors_of_before
    # pruning survives the tombstone anti-join
    out = search_ivf_index(spark, idx, query, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell_part", plan), plan[:2000]

    # deletes survive an append; re-delete + absent ids are no-ops
    append_ivf_index(emb.filter("vec_id >= 400"), idx)
    meta2 = delete_from_ivf_index(spark, idx, [victims[0], 999_999])
    assert meta2["n_tombstones"] == 3  # victims + the absent id
    hits = {
        r["vec_id"]
        for r in search_ivf_index(spark, idx, query, k=50, nprobe=meta0["n_cells"]).collect()
    }
    assert not hits & set(victims)

    # compaction reclaims: rowset == one-shot pack of corpus-minus-
    # victims with the SAME frozen centroids; tombstones cleared
    out = compact_ivf_index(spark, idx)
    assert out["n_tombstones"] == 0
    assert out["n_vectors"] == 500 - 2
    import os

    assert not os.path.exists(f"{idx}/tombstones.parquet")
    cents = spark.read.parquet(f"{idx}/centroids.parquet")
    survivors = emb.filter(~F.col("vec_id").isin(victims))
    want = {
        (r["vec_id"], r["cell"])
        for r in ivf_assign(survivors, cents).select("vec_id", "cell").collect()
    }
    lists = spark.read.parquet(f"{idx}/lists.parquet")
    got = {(r["vec_id"], r["cell"]) for r in lists.select("vec_id", "cell").collect()}
    assert got == want
    # post-compact exact search == exact ANN over the surviving corpus
    # (nprobe = n_cells scans every cell on both sides, so the frozen-
    # vs-inline-trained centroid split cannot matter): delete+compact
    # and rebuild-without cannot diverge
    got_hits = [
        (r["vec_id"], r["cosine"])
        for r in search_ivf_index(spark, idx, query, k=5, nprobe=meta0["n_cells"]).collect()
    ]
    brute = [
        (r["vec_id"], r["cosine"])
        for r in ann_topk_ivf(survivors, query, k=5, nprobe=meta0["n_cells"]).collect()
    ]
    assert got_hits == brute

    # guards
    with pytest.raises(ValueError, match="no ids"):
        delete_from_ivf_index(spark, idx, [])
    with pytest.raises(ValueError, match="NULL id"):
        delete_from_ivf_index(
            spark, idx, spark.createDataFrame([(None,)], "vec_id bigint")
        )
    with pytest.raises(ValueError, match="exactly one column"):
        delete_from_ivf_index(spark, idx, emb.select("vec_id", "label"))


def test_ivf_compact_crash_recovery(spark, tmp_path):
    """recover_ivf_index heals every state the rename-aside swap can
    crash in: (1) live renamed aside, staged complete -> staged is
    promoted; (2) only .old remains -> restored; (3) leftovers beside a
    live copy -> dropped. compact_ivf_index runs recovery automatically
    and the healed index compacts/probes normally."""
    import os
    import shutil

    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        compact_ivf_index,
        recover_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_crash")
    build_ivf_index(emb, idx)
    live = f"{idx}/lists.parquet"
    rows = lambda: {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(live).select("vec_id", "cell").collect()
    }
    want = rows()

    # state 1: crash between rename-aside and promote (live missing,
    # .old = old copy, .compacting = verified new copy) -> promote staged
    shutil.copytree(live, f"{live}.compacting")
    os.rename(live, f"{live}.old")
    out = recover_ivf_index(spark, idx)
    assert out["actions"] == ["promoted_staged", "dropped_old"]
    assert rows() == want and not os.path.exists(f"{live}.old")

    # state 2: only .old survives -> restored
    os.rename(live, f"{live}.old")
    assert recover_ivf_index(spark, idx)["actions"] == ["restored_old"]
    assert rows() == want

    # state 3: stale leftovers beside a live copy -> dropped (and a
    # compact on the healed index works end to end, running recovery
    # itself first)
    shutil.copytree(live, f"{live}.compacting")
    shutil.copytree(live, f"{live}.old")
    meta = compact_ivf_index(spark, idx)
    assert meta["n_vectors"] == len(want)
    assert rows() == want
    assert not os.path.exists(f"{live}.compacting") and not os.path.exists(f"{live}.old")

    # nothing left at all -> explicit error, not a silent empty index
    shutil.rmtree(live)
    with pytest.raises(IOError, match="rebuild"):
        recover_ivf_index(spark, idx)


def test_cli_vector_index_delete(spark, tmp_path, capsys):
    from smart_energy_consumption_analytics_using_big_data_spark import cli

    idx = str(tmp_path / "cli_idx_del")
    capsys.readouterr()
    cli.main(["vector-index", "--embeddings", SF_SMOKE, "--out", idx])
    capsys.readouterr()
    cli.main(["vector-index", "--out", idx, "--delete", "3,4"])
    out = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert out["stage"] == "vector-index-delete" and out["n_tombstones"] == 2
    # the query vector still comes from the corpus table, but the
    # deleted ids no longer rank — id 3 is not even its own top hit
    cli.main(
        ["vector-search", "--embeddings", SF_SMOKE, "--index", idx,
         "--query-id", "3", "--k", "5", "--nprobe", "2"]
    )
    res = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert res["hits"] and all(h["vec_id"] not in (3, 4) for h in res["hits"])
    cli.main(["vector-index", "--out", idx, "--compact"])
    compacted = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert compacted["n_vectors"] == 498 and compacted["n_tombstones"] == 0


def test_ivf_rebuild_clears_stale_tombstones(spark, tmp_path):
    """A REBUILD into an existing index dir must not inherit the old
    index's tombstones (code-review r14): the new index can legally
    reuse deleted ids, and stale tombstones would silently hide them
    from every probe and then physically destroy them on compact."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_rebuild")
    build_ivf_index(emb, idx)
    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        delete_from_ivf_index,
    )

    meta = delete_from_ivf_index(spark, idx, [3, 4])
    assert meta["n_tombstones"] == 2
    meta2 = build_ivf_index(emb, idx)  # rebuild, same dir, same ids
    assert meta2["n_tombstones"] == 0
    import os

    assert not os.path.exists(f"{idx}/tombstones.parquet")
    hits = search_ivf_index(
        spark, idx, emb.filter("vec_id = 3"), k=1, nprobe=meta2["n_cells"]
    ).collect()
    assert hits[0]["vec_id"] == 3 and hits[0]["cosine"] == 1.0


def test_cli_vector_index_flag_conflicts(spark, tmp_path, capsys):
    """Mode flags are mutually exclusive (code-review r14): silent
    precedence would drop an operation the user asked for. Bad --delete
    ids exit cleanly instead of raising a raw ValueError."""
    from smart_energy_consumption_analytics_using_big_data_spark import cli

    idx = str(tmp_path / "cli_idx_conflict")
    capsys.readouterr()
    cli.main(["vector-index", "--embeddings", SF_SMOKE, "--out", idx])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(["vector-index", "--out", idx, "--delete", "3", "--compact"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(
            ["vector-index", "--embeddings", SF_SMOKE, "--out", idx,
             "--append", "--delete", "3"]
        )
    with pytest.raises(SystemExit, match="bad --delete"):
        cli.main(["vector-index", "--out", idx, "--delete", "3,x"])
    # none of the refused invocations tombstoned anything
    import os

    assert not os.path.exists(f"{idx}/tombstones.parquet")


def test_ivf_recover_prefers_staged_and_is_idempotent(spark, tmp_path):
    """Mid-swap state with BOTH copies present: the verified staged
    copy wins (it is the compaction's output), .old is dropped, and a
    second recover on the healed index is a no-op. (The
    promote-rename-FAILS fallback to .old is code-reviewed but not
    forceable in this suite: tests run as root, so permission-based
    rename failures cannot be simulated; the branch is plain
    sequential logic over the same rename primitive pinned here.)"""
    import os
    import shutil

    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        recover_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_fallback")
    build_ivf_index(emb, idx)
    live = f"{idx}/lists.parquet"
    want = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(live).select("vec_id", "cell").collect()
    }
    # mid-swap crash state: live missing, .old + verified .compacting
    os.rename(live, f"{live}.old")
    shutil.copytree(f"{live}.old", f"{live}.compacting")
    out = recover_ivf_index(spark, idx)
    assert out["actions"] == ["promoted_staged", "dropped_old"]
    assert recover_ivf_index(spark, idx)["actions"] == []
    got = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(live).select("vec_id", "cell").collect()
    }
    assert got == want


def test_ivf_delete_empties_probed_cell(spark, tmp_path):
    """Degenerate-input edges of the delete path (differential-sweep
    doctrine: bugs live in the parameters no oracled query exercises):
    tombstoning EVERY vector of the probed cell leaves the probe empty
    but well-formed (no crash, zero rows at nprobe=1); compaction then
    drops the cell directory entirely while other probes stay intact;
    deleting ids via a single-column DataFrame (the non-list input
    form) works end to end; compacting an all-tombstoned index refuses
    with the rebuild message instead of writing an empty artifact."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        compact_ivf_index,
        delete_from_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_cellkill")
    meta = build_ivf_index(emb, idx)
    assert meta["n_cells"] >= 3
    # find the cell of vec 9 and tombstone that ENTIRE cell, passing
    # the ids as a DataFrame (exercises the DataFrame input form)
    lists = spark.read.parquet(f"{idx}/lists.parquet")
    cell9 = lists.filter("vec_id = 9").first()["cell"]
    victims = lists.filter(F.col("cell") == cell9).select("vec_id")
    n_victims = victims.count()
    meta1 = delete_from_ivf_index(spark, idx, victims)
    assert meta1["n_tombstones"] == n_victims
    # nprobe=1 with vec 9's own vector probes exactly the emptied cell
    out = search_ivf_index(spark, idx, emb.filter("vec_id = 9"), k=5, nprobe=1)
    assert out.count() == 0  # empty, not an error
    # exact search still ranks the other cells' vectors
    full = search_ivf_index(
        spark, idx, emb.filter("vec_id = 9"), k=5, nprobe=meta["n_cells"]
    ).collect()
    assert full and all(r["cell"] != cell9 for r in full)
    # compaction drops the emptied cell's partition entirely — pin the
    # rendered name POSITIVELY first, so a cell-dtype rendering change
    # (the _cell_part ADVICE-r12 hazard) cannot make the absence check
    # pass vacuously
    import os

    part_name = f"cell_part=c_{cell9}"
    list_parts = lambda: [
        p for p in os.listdir(f"{idx}/lists.parquet") if p.startswith("cell_part=")
    ]
    assert part_name in list_parts(), (part_name, list_parts())
    out2 = compact_ivf_index(spark, idx)
    assert out2["n_vectors"] == meta["n_vectors"] - n_victims
    assert out2["n_nonempty_cells"] == meta1["n_nonempty_cells"] - 1
    assert part_name not in list_parts()
    again = search_ivf_index(spark, idx, emb.filter("vec_id = 9"), k=5, nprobe=1)
    assert again.count() == 0
    # all-tombstoned index: compact refuses before writing
    rest = spark.read.parquet(f"{idx}/lists.parquet").select("vec_id")
    delete_from_ivf_index(spark, idx, rest)
    with pytest.raises(ValueError, match="rebuild instead"):
        compact_ivf_index(spark, idx)
    # and the refused compact left the live lists probe-able
    assert spark.read.parquet(f"{idx}/lists.parquet").count() > 0


def test_ivf_recover_swap_marker_states(spark, tmp_path):
    """The swap_pending marker protocol (ADVICE r14): while a swap is
    in flight, "live exists" is not trusted as "live is complete" —
    recovery verifies the live row count against the marker, which on
    object stores (copy+delete renames) is what distinguishes a torn
    live copy from a complete one, and tells applied tombstones from
    unapplied ones."""
    import os
    import shutil

    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        delete_from_ivf_index,
        recover_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_marker")
    meta = build_ivf_index(emb, idx)
    live = f"{idx}/lists.parquet"
    rows = lambda: {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(live).select("vec_id", "cell").collect()
    }
    all_rows = rows()
    delete_from_ivf_index(spark, idx, [3, 4])
    filtered = {t for t in all_rows if t[0] not in (3, 4)}
    marker = f"{idx}/swap_pending.json"
    write_marker = lambda: open(marker, "w").write(
        json.dumps({"expected_rows": len(filtered)})
    )

    # state A (post-swap crash before the tombstone delete): live IS
    # the compacted copy, tombstones still on disk. Recovery must
    # confirm live and CLEAR the tombstones — leaving them would hide,
    # then destroy, rows re-appended by failed-append recovery.
    staged_src = str(tmp_path / "staged_src")
    spark.read.parquet(live).filter(~F.col("vec_id").isin(3, 4)).write.mode(
        "overwrite"
    ).partitionBy("cell_part").parquet(staged_src)
    shutil.rmtree(live)
    shutil.copytree(staged_src, live)
    write_marker()
    out = recover_ivf_index(spark, idx)
    assert out["actions"] == ["confirmed_live", "cleared_applied_tombstones",
                              "cleared_swap_marker"]
    assert not os.path.exists(f"{idx}/tombstones.parquet")
    assert not os.path.exists(marker)
    assert rows() == filtered

    # state B (torn staged->live copy on an object store): live is a
    # PARTIAL directory, .old and .compacting are complete. The old
    # recovery kept the truncated live and deleted both complete
    # copies; marker recovery must replace live with the staged copy
    # and clear the (applied) tombstones.
    build_ivf_index(emb, idx)
    delete_from_ivf_index(spark, idx, [3, 4])
    spark.read.parquet(live).filter(~F.col("vec_id").isin(3, 4)).write.mode(
        "overwrite"
    ).partitionBy("cell_part").parquet(f"{live}.compacting")
    os.rename(live, f"{live}.old")
    shutil.copytree(f"{live}.old", live)
    # tear the live copy: drop all but one cell directory
    cells = sorted(p for p in os.listdir(live) if p.startswith("cell_part="))
    for c in cells[1:]:
        shutil.rmtree(os.path.join(live, c))
    write_marker()
    out = recover_ivf_index(spark, idx)
    assert "dropped_partial_live" in out["actions"]
    assert "promoted_staged" in out["actions"]
    assert "cleared_applied_tombstones" in out["actions"]
    assert rows() == filtered
    assert not os.path.exists(f"{live}.old") and not os.path.exists(marker)

    # state C (crash mid live->.old copy): live is the complete
    # PRE-swap copy (count mismatches the marker), .old is partial,
    # staged never existed. Live must be KEPT and the tombstones kept
    # too (they were never applied).
    build_ivf_index(emb, idx)
    delete_from_ivf_index(spark, idx, [3, 4])
    shutil.copytree(live, f"{live}.old")
    oldcells = sorted(
        p for p in os.listdir(f"{live}.old") if p.startswith("cell_part=")
    )
    for c in oldcells[1:]:
        shutil.rmtree(os.path.join(f"{live}.old", c))
    write_marker()
    out = recover_ivf_index(spark, idx)
    assert out["actions"] == ["kept_preswap_live", "dropped_old",
                              "cleared_swap_marker"]
    assert rows() == all_rows
    assert os.path.exists(f"{idx}/tombstones.parquet")
    # the kept tombstones still hide the deleted ids from probes
    hits = search_ivf_index(
        spark, idx, emb.filter("vec_id = 3"), k=5, nprobe=2
    ).collect()
    assert all(h["vec_id"] not in (3, 4) for h in hits)


def test_ivf_search_retries_through_swap_window(spark, tmp_path):
    """A probe that lands in the swap's missing-path window retries
    transparently (bounded backoff) instead of surfacing the race:
    the live lists vanish for ~1.5 s mid-search and the search still
    returns exactly the pre-swap result."""
    import os
    import threading

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_retry")
    build_ivf_index(emb, idx)
    live = f"{idx}/lists.parquet"
    query = emb.filter(F.col("vec_id") == 3)
    want = [
        (r["vec_id"], r["cosine"])
        for r in search_ivf_index(spark, idx, query, k=5, nprobe=2).collect()
    ]

    os.rename(live, f"{live}.swapping")  # enter the two-rename window
    restored = threading.Timer(
        1.5, lambda: os.rename(f"{live}.swapping", live)
    )
    restored.start()
    try:
        got_df = search_ivf_index(spark, idx, query, k=5, nprobe=2)
    finally:
        restored.join()
    got = [(r["vec_id"], r["cosine"]) for r in got_df.collect()]
    assert got == want


def test_ivf_swap_marker_hardening(spark, tmp_path):
    """Code-review r15 follow-ups on the marker protocol: (1) a torn/
    empty marker (crash between marker create and write — strictly
    pre-swap) heals instead of wedging recovery; (2) a tombstone added
    AFTER a post-swap crash survives the healing (delete runs recovery
    first, so the clear-applied-tombstones step cannot wipe it);
    (3) a probe against a torn live copy with a pending swap refuses
    with an instructive error rather than silently ranking over a
    fraction of the corpus, while a complete pre-swap live (count >
    marker) still probes fine."""
    import os
    import shutil

    import pytest

    from smart_energy_consumption_analytics_using_big_data_spark.ext.vector_index import (
        delete_from_ivf_index,
        recover_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivf_hard")
    live = f"{idx}/lists.parquet"
    marker = f"{idx}/swap_pending.json"

    # (1) corrupt marker: live intact, staged leftover — recovery
    # drops the marker and proceeds on the trusted no-swap path
    build_ivf_index(emb, idx)
    shutil.copytree(live, f"{live}.compacting")
    open(marker, "w").close()  # zero-byte marker
    out = recover_ivf_index(spark, idx)
    assert "dropped_corrupt_marker" in out["actions"]
    assert "dropped_staged" in out["actions"]
    assert not os.path.exists(marker)

    # (2) post-swap crash (live already compacted, tombstones [3,4]
    # applied but not yet cleared, marker present), then a NEW delete
    # of id 7 arrives: the delete must heal first, then tombstone 7 —
    # 7 stays hidden, 3/4 stay physically gone
    delete_from_ivf_index(spark, idx, [3, 4])
    filtered_rows = spark.read.parquet(live).filter(
        ~F.col("vec_id").isin(3, 4)
    )
    staged_src = str(tmp_path / "hard_staged")
    filtered_rows.write.mode("overwrite").partitionBy("cell_part").parquet(staged_src)
    n_expected = filtered_rows.count()
    shutil.rmtree(live)
    shutil.copytree(staged_src, live)
    open(marker, "w").write(json.dumps({"expected_rows": n_expected}))
    meta = delete_from_ivf_index(spark, idx, [7])
    assert not os.path.exists(marker)
    assert meta["n_tombstones"] == 1  # only the new delete survives
    hits = search_ivf_index(
        spark, idx, emb.filter("vec_id = 7"), k=5, nprobe=2
    ).collect()
    assert all(h["vec_id"] not in (3, 4, 7) for h in hits)

    # (3a) torn live + pending marker: probe refuses with the fix named
    cells = sorted(p for p in os.listdir(live) if p.startswith("cell_part="))
    torn = str(tmp_path / "hard_torn_backup")
    shutil.copytree(live, torn)
    for c in cells[1:]:
        shutil.rmtree(os.path.join(live, c))
    open(marker, "w").write(json.dumps({"expected_rows": n_expected}))
    with pytest.raises(IOError, match="recover_ivf_index"):
        search_ivf_index(spark, idx, emb.filter("vec_id = 10"), k=3, nprobe=2)
    # (3b) complete pre-swap live (count >= marker): probe proceeds
    shutil.rmtree(live)
    shutil.copytree(torn, live)
    open(marker, "w").write(json.dumps({"expected_rows": n_expected - 5}))
    got = search_ivf_index(
        spark, idx, emb.filter("vec_id = 10"), k=3, nprobe=2
    ).collect()
    assert len(got) == 3
    os.remove(marker)
