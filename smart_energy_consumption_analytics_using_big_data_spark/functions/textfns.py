"""Text-analysis scalar functions (extension scope, SURVEY.md SS7).

The reference has no Spark-side string functions (SURVEY.md F11); these
back the training-data-pipeline extensions: tokenization, quality
scoring, language-ID heuristics, and document fingerprinting. All are
built-in expressions (split/transform/aggregate/md5) - no Python UDFs -
so they scale with whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny English stopword core used by the heuristics; deliberately small
# and deterministic so oracle SQL can mirror it.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens_ws(text: Column) -> Column:
    """Whitespace tokenization: split on single spaces."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_ws(text))


def token_count_bpeish(text: Column) -> Column:
    """BPE-ish token estimate: letter runs, digit runs, lone symbols."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0))


def stopword_hits(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Number of tokens that are known stopwords (array filter, JVM-side)."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens_ws(text), lambda t: F.array_contains(arr, t)))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    n_tokens = token_count_ws(text)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(F.try_divide(F.length(F.regexp_replace(text, " ", "")), n_tokens), 6),
        "punct_ratio": F.round(F.try_divide(punct, n_chars), 6),
        "stopword_ratio": F.round(F.try_divide(stopword_hits(text), n_tokens), 6),
    }


def predicted_lang(text: Column, min_hits: int = 1) -> Column:
    """Stopword-hit language-ID heuristic: 'en' if enough English
    stopword tokens, else 'unk'. (A real n-gram model plugs in here;
    the plumbing - pure column expressions - is the point.)"""
    return F.when(stopword_hits(text) >= min_hits, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint_md5(text: Column) -> Column:
    """Whole-document fingerprint: md5 of case/space-normalized text."""
    return F.md5(F.lower(F.trim(text)))


def min_shingle_hash(text: Column, k: int = 8) -> Column:
    """Rolling-hash-style fingerprint: min md5 over all k-char shingles.

    Equivalent to a 1-hash MinHash over character shingles; the full
    MinHash/LSH pipeline lives in ext/dedup.py.
    """
    n = F.greatest(F.length(text) - (k - 1), F.lit(1))
    shingles = F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(text.substr(i, F.lit(k))))
    return F.array_min(shingles)


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles from a token array (JVM-side).

    Guards short docs: sequence(1, size-n+1) is only valid when the doc
    has >= n tokens (Spark's sequence() counts *down* otherwise).
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j) for j in range(n)]),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def rolling_hash(text: Column, base: int = 257, mod: int = 2147483647) -> Column:
    """Rabin-Karp polynomial rolling hash over the document's characters:
    h = fold(h * base + code(char)) mod M. Engine-portable (plain
    integer arithmetic, no JVM-specific hash), computed JVM-side via
    aggregate() over a position sequence - the incremental-fingerprint
    primitive behind shift-resistant content chunking."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(text)),
        F.lit(0).cast("bigint"),
        lambda acc, i: (acc * base + F.ascii(text.substr(i, F.lit(1)))) % mod,
    )


def bpe_pair_counts(docs, text_col: str = "text", top_n: int | None = None):
    """Corpus-wide adjacent char-pair counts over whitespace words —
    the BPE merge-selection inner loop (Sennrich et al. 2016). The
    classic scale trick: compact the token stream to WORD FREQUENCIES
    first (vocab-sized, sublinear in corpus growth), then explode each
    DISTINCT word's pairs weighted by its count. Returns (pair, n);
    `top_n` adds the deterministic TakeOrdered head."""
    words = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    pairs = wf.select(
        "n_w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(F.sum("n_w").alias("n"))
    if top_n is None:
        return out
    return out.orderBy(F.desc("n"), F.asc("pair")).limit(top_n)


def _bpe_merge_expr(pair_ref: str) -> str:
    """SQL expression applying one BPE merge rule to the space-joined
    symbol string ``sym``, with TOKEN-DELIMITED matching and greedy
    left-to-right non-overlapping application — the textbook Sennrich
    et al. (2016) semantics.

    ``pair_ref`` is a SQL expression yielding the merge pattern
    ("x y"): the ``__p`` column on the declarative path, a quoted
    literal on the materialized-ladder path.

    Shape: fold over the symbol ARRAY, merging the accumulator's LAST
    symbol with the current one when the two equal the pair. Two
    rejected alternatives, both wrong:

    - ``replace(sym, pair, merged)`` (the pre-r9 code) matches
      SUBSTRINGS, so a pair whose left symbol is the SUFFIX of a
      longer symbol also fires (state "xa b" wrongly merged by pair
      "a b") — counting in ``_bpe_top_pair`` is whole-symbol, so the
      two halves of the algorithm disagreed.
    - sentinel-padding (``replace(' '||sym||' ', ' '||pair||' ',
      ...)``) fixes that but breaks ADJACENT repeats: in " a b a b "
      the two occurrences of " a b " SHARE the middle delimiter, and
      left-to-right replace consumes it with the first match, so the
      second pair never merges (should be "ab ab").

    The fold has neither defect: matching is whole-symbol (the last
    accumulator token, delimiter-checked via ``endswith(' '||left)``),
    and a merged token (left||right, always strictly longer than
    ``left``) can never re-match as either side of the same rule, so
    greedy non-overlapping application falls out of the scan order.
    """
    left = f"element_at(split({pair_ref}, ' '), 1)"
    right = f"element_at(split({pair_ref}, ' '), 2)"
    merged = f"replace({pair_ref}, ' ', '')"
    return (
        "aggregate("
        " slice(split(sym, ' '), 2, greatest(size(split(sym, ' ')) - 1, 0)),"
        " element_at(split(sym, ' '), 1),"
        f" (acc, x) -> CASE WHEN x = {right}"
        f"   AND (acc = {left} OR endswith(acc, ' ' || {left}))"
        f"  THEN left(acc, length(acc) - length({left})) || {merged}"
        "  ELSE acc || ' ' || x END"
        ")"
    )


def _bpe_pair_literal(pair: str) -> str:
    """Quote a collected merge pair as a SQL string literal."""
    return "'" + pair.replace("'", "''") + "'"


def _bpe_top_pair(state):
    """Deterministic top-1 adjacent symbol pair of a (sym, n_w) vocab
    table: frequency-weighted counts, ties broken lexicographically —
    the BPE merge-selection step shared by the trainer and encoder."""
    arr = F.split("sym", " ")
    # single-symbol words contribute no pairs; sequence(1, 0) would
    # DESCEND ([1, 0]) and element_at would go out of bounds, so
    # gate on size and explode an empty array instead (drops the row)
    pair_list = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = state.select("n_w", F.explode(pair_list).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_w").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
    )


def bpe_learn_merges(docs, n_merges: int = 3, text_col: str = "text"):
    """Learn the first ``n_merges`` BPE merge rules (Sennrich et al.
    2016). Merge application is token-delimited greedy left-to-right
    (see ``_bpe_merge_expr``).

    State is the word-frequency table (vocab-sized, the standard BPE
    compaction) with each word as a SPACE-JOINED symbol string
    ("hello" -> "h e l l o"). Per round: adjacent-pair counts weighted
    by word frequency -> deterministic top-1 (ties: lexicographic) ->
    apply the winning merge to every vocab entry.

    Single execution shape: the materialized per-round ladder
    (``_bpe_learn_merges_ladder``), with the 1-row winner collected
    driver-side (k-bounded: one row per round — a real BPE trainer is
    inherently sequential in the merge list). Total work O(n_merges)
    vocab-sized passes, constant memory/lineage. An alternate "one
    lazy DAG" shape existed through r10; it was retired after two
    parity bugs (r7 vocab-emptying, r10 pair-exhaustion) and an A/B
    showing no warm-path win (PERFORMANCE.md r10) — it also recomputed
    O(2^n_merges) vocab passes, unusable at a real tokenizer's 10k+
    merges.

    Returns (merge_round, pair, n): the learned merge table — a BPE
    trainer's actual output artifact. Rounds past pair exhaustion
    (every word a single symbol) produce no row.
    """
    words = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    sym = wf.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "n_w"
    )
    return _bpe_learn_merges_ladder(docs.sparkSession, sym, n_merges)


def _bpe_learn_merges_ladder(spark, sym, n_merges: int):
    """Materialized-per-round BPE trainer: eager-localCheckpoint the
    vocab state each round, collect the 1-row winner (k-bounded: one
    row per round), apply it as a literal.

    localCheckpoint — not persist — because the point is LINEAGE
    truncation, not cache hits: the merge fold references the previous
    round's ``sym`` expression several times, so with persist the
    logical plan (and Catalyst's per-round analysis cost) still grows
    ~2x per round even though execution reads the cache — measured
    20 s for round 16 alone at sf0.01. Checkpointing cuts the plan to
    a leaf: flat ~0.3 s/round, true O(n_merges). Checkpoint blocks are
    vocab-sized and released by the ContextCleaner as rounds go out of
    scope."""
    state = sym.localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    for r in range(1, n_merges + 1):
        top = _bpe_top_pair(state).collect()
        if not top:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        merges.append((r, pair, n))
        state = state.select(
            F.expr(_bpe_merge_expr(_bpe_pair_literal(pair))).alias("sym"),
            "n_w",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_round int, pair string, n bigint"
    )


def bpe_encode_vocab(
    docs, n_merges: int = 3, top_n: int = 100, text_col: str = "text"
):
    """Apply the learned BPE merges back to the vocabulary — the ENCODE
    half of the tokenizer loop (`bpe_learn_merges` is the trainer; a
    trained tokenizer is useless until it tokenizes).

    Runs the identical merge-learning iteration but carries the
    original word through the rounds, so the final state IS the
    encoded vocabulary: (word, space-joined symbol string, token
    count, corpus frequency). Encoding happens on the DISTINCT-word
    table (the same vocab compaction the trainer uses), which is how a
    real corpus tokenization pass works at scale — encode each vocab
    entry once, join the token count back to the corpus by word.
    Output: top ``top_n`` words by (frequency desc, word) — bounded
    and deterministic at any corpus size.

    Merge application is token-delimited (``_bpe_merge_expr``); like
    the trainer, the single execution shape is the materialized
    per-round ladder (``_bpe_encode_ladder``) — O(n_merges) passes,
    constant lineage depth. The one-lazy-DAG alternate was retired
    with the trainer's (see ``bpe_learn_merges``).
    """
    words = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    state = wf.select(
        "w", F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "n_w"
    )
    state = _bpe_encode_ladder(state, n_merges)
    return (
        state.select(
            "w",
            F.col("sym").alias("encoded"),
            F.size(F.split("sym", " ")).alias("n_tokens"),
            "n_w",
        )
        .orderBy(F.desc("n_w"), F.asc("w"))
        .limit(top_n)
    )


def _bpe_encode_ladder(state, n_merges: int):
    """Materialized-per-round encode iteration: eager-localCheckpoint
    per round (lineage truncation — see `_bpe_learn_merges_ladder` for
    why persist alone still costs O(2^n) plan analysis), collect each
    round's 1-row winner, apply it as a literal. Returns the final
    checkpointed state — lineage-free and still lazy-composable."""
    state = state.localCheckpoint(eager=True)
    for _ in range(n_merges):
        top = _bpe_top_pair(state).collect()
        if not top:
            break
        state = state.select(
            "w",
            F.expr(
                _bpe_merge_expr(_bpe_pair_literal(top[0]["pair"]))
            ).alias("sym"),
            "n_w",
        ).localCheckpoint(eager=True)
    return state
