"""O(n) Arrow winnowing prototype (VERDICT r3 item 8).

The winnowing guarantee holds for any hash family, so the Arrow path
is verified against (a) a brute-force pure-Python reimplementation of
its own rolling hash + window min on small docs, and (b) the MOSS
selection invariants — exact duplicates share every fingerprint, a
shared substring of length >= w + k - 1 yields a shared fingerprint.
"""

from __future__ import annotations

import numpy as np

from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
    winnow_fingerprints,
    winnow_fingerprints_arrow,
)

K, W = 8, 16


def _brute_fps(text: str, k: int = K, w: int = W) -> set[int]:
    """Reference: same polynomial rolling hash, naive O(n*w) min."""
    base = np.uint64(1099511628211)
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(raw) < w + k - 1:
        return set()
    with np.errstate(over="ignore"):
        hashes = []
        for i in range(len(raw) - k + 1):
            h = np.uint64(0)
            for j in range(k):
                h += raw[i + j] * base ** np.uint64(k - 1 - j)
            hashes.append(np.int64(h))
    return {int(min(hashes[i : i + w])) for i in range(len(hashes) - w + 1)}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_arrow_winnow_matches_brute_force(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz",
        "unicode café naïve über text with some repeated repeated words",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = winnow_fingerprints_arrow(_docs(spark, rows), K, W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert by_doc[i] == _brute_fps(t), f"doc {i} mismatch"


def test_arrow_winnow_guarantee_and_short_doc_filter(spark):
    shared = "this exact shared passage is certainly long enough to fingerprint"
    rows = [
        (1, "PREFIX A " + shared + " SUFFIX ONE"),
        (2, "totally different lead-in text " + shared),
        (3, "no overlap with the others at all, completely disjoint words"),
        (4, "short"),  # < w + k - 1: must produce no fingerprints
    ]
    fps = winnow_fingerprints_arrow(_docs(spark, rows), K, W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must yield a shared fingerprint"
    assert 4 not in by_doc
    # exact duplicates share every fingerprint
    dup = _docs(spark, [(10, shared * 2), (11, shared * 2)])
    dd = {}
    for r in winnow_fingerprints_arrow(dup, K, W).collect():
        dd.setdefault(r.doc_id, set()).add(r.fp)
    assert dd[10] == dd[11]


def test_arrow_winnow_density_tracks_native(spark):
    """Both paths sample ~1/w of gram positions (hash-family-agnostic
    density): on real corpus text the per-doc fingerprint counts should
    be within 2x of each other."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    native = winnow_fingerprints(docs, K, W).groupBy("doc_id").count().collect()
    arrow = winnow_fingerprints_arrow(docs, K, W).groupBy("doc_id").count().collect()
    n = {r.doc_id: r["count"] for r in native}
    a = {r.doc_id: r["count"] for r in arrow}
    assert set(n) == set(a)
    for d in n:
        assert 0.5 <= a[d] / n[d] <= 2.0, (d, n[d], a[d])
