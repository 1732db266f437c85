"""BPE encoder (`functions/textfns.bpe_encode_vocab`) invariants.

The encoder applies the same merge iteration as the trainer
(`bpe_learn_merges`) while carrying the word through, so its output is
checked against an in-test Python reference that replicates the ENGINE
mechanics exactly: space-joined symbols, frequency-weighted adjacent
pair counts with lexicographic tie-break, and left-to-right
non-overlapping string replace per merge (the same `replace()` both
Spark and the DuckDB oracle run — parity with the oracle is the
query-level gate; this pins the function against a second independent
implementation plus the reconstruction invariant).
"""

from __future__ import annotations

from smart_energy_consumption_analytics_using_big_data_spark.functions.textfns import (
    bpe_encode_vocab,
    bpe_learn_merges,
)

CORPUS = [
    "low low low low lower lower",
    "newest newest newest widest widest",
    "low newest it it it",
]


def _py_bpe_encode(docs, n_merges):
    """Engine-mechanics reference: same compaction, same tie-break,
    same string-replace merge application."""
    freq: dict[str, int] = {}
    for line in docs:
        for w in line.split(" "):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    state = {w: " ".join(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        counts: dict[str, int] = {}
        for w, n in freq.items():
            syms = state[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                p = f"{a} {b}"
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(top)
        state = {w: s.replace(top, top.replace(" ", "")) for w, s in state.items()}
    return freq, state, merges


def test_encoder_matches_python_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    got = {
        r["w"]: (r["encoded"], r["n_tokens"], r["n_w"])
        for r in bpe_encode_vocab(docs, n_merges=3, top_n=100).collect()
    }
    freq, state, _ = _py_bpe_encode(CORPUS, 3)
    want = {w: (s, len(s.split(" ")), freq[w]) for w, s in state.items()}
    assert got == want


def test_encoder_applies_the_trainers_merges(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    learned = [r["pair"] for r in bpe_learn_merges(docs, n_merges=3).collect()]
    _, _, merges = _py_bpe_encode(CORPUS, 3)
    assert learned == merges and len(merges) == 3


def test_encoding_reconstructs_word_and_counts_tokens(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    for r in bpe_encode_vocab(docs, n_merges=2, top_n=100).collect():
        assert r["encoded"].replace(" ", "") == r["w"]
        assert r["n_tokens"] == len(r["encoded"].split(" "))
        assert r["n_tokens"] >= 1
