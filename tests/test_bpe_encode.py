"""BPE trainer/encoder (`functions/textfns`) invariants.

The engine's merge application is TOKEN-DELIMITED greedy left-to-right
(Sennrich et al. 2016): a merge rule (l, r) fires only where l and r
are whole adjacent SYMBOLS, never where the pattern happens to occur
as a substring of a longer symbol. The in-test Python reference below
is a textbook implementation over symbol lists — deliberately NOT the
engine's fold mechanics — so the Spark expression is pinned against an
independent formulation (parity with the DuckDB oracle is the
query-level gate; this file is the second witness).

Regression anchors:
- r9 boundary-collision corpus: a merged symbol whose SUFFIX equals a
  later merge's left side ("xa" then pair "a b") must NOT re-fire —
  the pre-r9 substring `replace()` wrongly merged state "xa b".
- adjacent repeats ("a b a b") must BOTH merge — the naive
  sentinel-padded replace loses the second occurrence to the shared
  delimiter.
- pair exhaustion (every word a single symbol) must be a no-op for
  any surplus merge rounds, on trainer and encoder alike.

r11: the lazy one-DAG execution path was retired (two parity bugs,
no measured win — VERDICT r10 item 6); the materialized
localCheckpoint ladder is the single path, so the old lazy-vs-ladder
A/B tests collapsed into direct reference-parity checks.
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

# Engineered so merge 1 = ("x", "a") -> symbol "xa", and merge 2 =
# ("a", "b") whose pattern is a SUFFIX-substring of the state "xa b"
# for word "xab": whole-symbol semantics must leave "xa b" alone.
#   "xa" x10  -> (x a):10
#   "cab" x6  -> (c a):6, (a b):6
#   "xab" x3  -> (x a):3, (a b):3
# round 1: (x a):13 wins; round 2: (a b):6 ties (c a):6, lexicographic
# tie-break picks "a b"; round 3: (c ab):6.
BOUNDARY_CORPUS = ["xa " * 10 + "cab " * 6 + "xab " * 3]


def _merge_syms(syms: list[str], left: str, right: str) -> list[str]:
    """Textbook greedy left-to-right non-overlapping symbol merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe_encode(docs, n_merges):
    """Independent Sennrich-style reference: symbol-list state,
    frequency-weighted whole-symbol pair counts, lexicographic
    tie-break, token-delimited greedy merge application."""
    freq: dict[str, int] = {}
    for line in docs:
        for w in line.split(" "):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    state = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        counts: dict[str, int] = {}
        for w, n in freq.items():
            syms = state[w]
            for a, b in zip(syms, syms[1:]):
                p = f"{a} {b}"
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(top)
        left, right = top.split(" ")
        state = {w: _merge_syms(s, left, right) for w, s in state.items()}
    return freq, {w: " ".join(s) for w, s in state.items()}, merges


def _docs(spark, corpus):
    return spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )


def test_encoder_matches_python_reference(spark):
    got = {
        r["w"]: (r["encoded"], r["n_tokens"], r["n_w"])
        for r in bpe_encode_vocab(_docs(spark, CORPUS), n_merges=3, top_n=100).collect()
    }
    freq, state, _ = _py_bpe_encode(CORPUS, 3)
    want = {w: (s, len(s.split(" ")), freq[w]) for w, s in state.items()}
    assert got == want


def test_encoder_applies_the_trainers_merges(spark):
    learned = [
        r["pair"] for r in bpe_learn_merges(_docs(spark, CORPUS), n_merges=3).collect()
    ]
    _, _, merges = _py_bpe_encode(CORPUS, 3)
    assert learned == merges and len(merges) == 3


def test_encoding_reconstructs_word_and_counts_tokens(spark):
    for r in bpe_encode_vocab(_docs(spark, CORPUS), n_merges=2, top_n=100).collect():
        assert r["encoded"].replace(" ", "") == r["w"]
        assert r["n_tokens"] == len(r["encoded"].split(" "))
        assert r["n_tokens"] >= 1


def test_merge_is_token_delimited_not_substring(spark):
    """The r9 fidelity fix: after merge 1 creates symbol "xa", merge 2
    ("a b") must not fire inside state "xa b" even though the pattern
    occurs there as a substring (the pre-r9 replace() bug)."""
    docs = _docs(spark, BOUNDARY_CORPUS)
    learned = bpe_learn_merges(docs, n_merges=3).orderBy("merge_round").collect()
    assert [(r["merge_round"], r["pair"], r["n"]) for r in learned] == [
        (1, "x a", 13),
        (2, "a b", 6),
        (3, "c ab", 6),
    ]
    enc = {r["w"]: (r["encoded"], r["n_tokens"]) for r in
           bpe_encode_vocab(docs, n_merges=3, top_n=100).collect()}
    # textbook result: "xab" stays two tokens ("xa","b") because pair
    # ("a","b") matches whole symbols only; substring replace gave "xab".
    assert enc["xab"] == ("xa b", 2)
    assert enc["cab"] == ("cab", 1)
    assert enc["xa"] == ("xa", 1)
    # and the independent Python reference agrees end-to-end
    freq, state, merges = _py_bpe_encode(BOUNDARY_CORPUS, 3)
    assert merges == ["x a", "a b", "c ab"]
    assert state["xab"] == "xa b"


def test_adjacent_repeats_both_merge(spark):
    """Greedy left-to-right must merge BOTH pairs of "a b a b" — the
    shared-delimiter case a sentinel-padded replace would get wrong."""
    docs = _docs(spark, ["abab abab abab ab"])
    enc = {r["w"]: r["encoded"] for r in
           bpe_encode_vocab(docs, n_merges=1, top_n=10).collect()}
    assert enc["abab"] == "ab ab"
    assert enc["ab"] == "ab"


def test_trainer_stops_at_pair_exhaustion(spark):
    """BOUNDARY_CORPUS exhausts after 4 merges; surplus rounds must
    produce no extra merge-table rows and the encoder must reach the
    fully-merged fixed point."""
    docs = _docs(spark, BOUNDARY_CORPUS)
    full = [
        (1, "x a", 13),
        (2, "a b", 6),
        (3, "c ab", 6),
        (4, "xa b", 3),
    ]
    for n in (4, 5, 9):
        learned = bpe_learn_merges(docs, n_merges=n).orderBy("merge_round").collect()
        assert [(r["merge_round"], r["pair"], r["n"]) for r in learned] == full
    enc = {
        r["w"]: r["encoded"]
        for r in bpe_encode_vocab(docs, n_merges=5, top_n=100).collect()
    }
    assert enc["xab"] == "xab"  # merge 4 joins ("xa","b")
    assert enc["cab"] == "cab"


def test_encoder_noop_past_exhaustion(spark):
    """Pair exhaustion must be a no-op for the encoder at ANY surplus
    round budget (the r10 lazy-path regression class, kept as a
    behavioral pin even though the lazy path itself is gone)."""
    docs = _docs(spark, ["ab ab ab cd"])
    # exhaustion after 2 merges: (a b):3 then (c d):1
    want = {"ab": ("ab", 3), "cd": ("cd", 1)}

    def enc(n):
        return {
            r["w"]: (r["encoded"], r["n_w"])
            for r in bpe_encode_vocab(docs, n_merges=n, top_n=100).collect()
        }

    for n in (2, 3, 4, 7):
        assert enc(n) == want, n
    # the trainer's merge table agrees: it stops at 2
    learned = [
        (r["merge_round"], r["pair"], r["n"])
        for r in bpe_learn_merges(docs, n_merges=6).orderBy("merge_round").collect()
    ]
    assert learned == [(1, "a b", 3), (2, "c d", 1)]


def test_ladder_matches_reference_on_random_corpus(spark):
    """Pins the shipped full-recount localCheckpoint ladder
    (`_bpe_learn_merges_ladder` re-derives pair counts from the whole
    vocab each round — per the r9 negative result, the count-delta
    incremental trainer was rejected as 7x slower) against the textbook
    reference over many rounds on a corpus big enough that every round
    does real merge work."""
    import random

    rng = random.Random(42)
    words = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 9)))
        for _ in range(400)
    ]
    corpus = [" ".join(rng.choices(words, k=40)) for _ in range(30)]
    n = 8
    learned = [
        (r["merge_round"], r["pair"], r["n"])
        for r in bpe_learn_merges(_docs(spark, corpus), n_merges=n)
        .orderBy("merge_round")
        .collect()
    ]
    freq, state, merges = _py_bpe_encode(corpus, n)
    # reference merge list with counts: recompute counts per round
    assert [p for _, p, _ in learned] == merges
    enc = {
        r["w"]: (r["encoded"], r["n_w"])
        for r in bpe_encode_vocab(
            _docs(spark, corpus), n_merges=n, top_n=10_000
        ).collect()
    }
    want = {w: (s, freq[w]) for w, s in state.items()}
    assert enc == want


def test_randomized_exhaustion_parity(spark):
    """Random tiny corpora driven PAST pair exhaustion: the engine and
    the textbook Python reference must agree on the final encoding
    (the reference's state after its early break is the fixed point
    the engine must reach), and on a mid-exhaustion round budget."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(2, 4)))
            for _ in range(rng.randint(2, 5))
        ]
        corpus = [" ".join(rng.choices(words, k=12))]
        docs = _docs(spark, corpus)
        # enough merges to exhaust every 2-4 char word over a 3-letter
        # alphabet
        n_full, n_mid = 12, 4

        def enc(n):
            return {
                r["w"]: (r["encoded"], r["n_w"])
                for r in bpe_encode_vocab(docs, n_merges=n, top_n=1000).collect()
            }

        freq, state, _merges = _py_bpe_encode(corpus, n_full)
        want = {w: (s, freq[w]) for w, s in state.items()}
        assert enc(n_full) == want, (trial, corpus)
        freq_m, state_m, _ = _py_bpe_encode(corpus, n_mid)
        want_mid = {w: (s, freq_m[w]) for w, s in state_m.items()}
        assert enc(n_mid) == want_mid, (trial, corpus)
