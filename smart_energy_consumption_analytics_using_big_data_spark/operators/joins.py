"""Join strategies.

SURVEY.md SS2.3 (J1-J5). Scale rules encoded here:

* dimension joins broadcast explicitly (`F.broadcast`) - the reference
  relied on Catalyst's size estimate for its 17,521-row tariff dim
  (`data_preprocessing.py:182`); at 100 TB we make the intent explicit
  so a stale statistic can never demote it to a shuffle join;
* fact x fact joins shuffle on the join key - callers co-partition /
  bucket upstream when the key is reused across stages;
* AQE skew-join handles hot keys (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions.timefns import epoch_s


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Broadcast dimension join (J1; `data_preprocessing.py:182`)."""
    return fact.join(F.broadcast(dim), on, how)


def join_fact(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Fact x fact equi-join on (composite) key (J2;
    `anomaly_detection.py:85-86`). Shuffles both sides on the key."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """LEFT SEMI (J5): rows of `left` with a match - never duplicates."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """LEFT ANTI (J5): rows of `left` without a match."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed (left) side, replicate the
    right side across salt buckets.

    For hot keys (one household/user with millions of rows) a plain
    shuffle join puts the whole key on one reducer. Salting splits each
    left key across `salt_buckets` partitions; the right side is
    exploded once per bucket so every salted partition finds its match.
    AQE's skew-join handles moderate skew automatically (enabled in
    session.py); this is the explicit tool for pathological keys.

    Only ``inner`` and ``left`` are valid: the right side is replicated
    ``salt_buckets`` times, so right/full outer would emit every
    unmatched right row once per salt bucket. The salt is derived
    deterministically from the left row's content (xxhash64), never
    ``rand()`` - a task retry re-deals identical salts, so a partially
    recomputed stage can't split a row's match across buckets.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)).cast(
        "int"
    )
    left_salted = left.withColumn("__salt", salt)
    right_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = left_salted.join(right_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def asof_join_grid(
    fact: DataFrame,
    dim: DataFrame,
    fact_ts: str,
    dim_ts: str,
    grid: str = "30 minutes",
    how: str = "left",
) -> DataFrame:
    """As-of join collapsed to equi-join on a shared time grid (J5).

    The reference's tariff join is semantically as-of but both sides sit
    on the same half-hourly grid (`data_preprocessing.py:182`), so the
    scalable form is: floor the fact timestamp to the grid, then
    broadcast equi-join - no range-join explosion, no custom strategy.
    """
    # window(ts, grid).start floors to the grid for arbitrary intervals
    bucketed = fact.withColumn("__grid_ts", F.window(F.col(fact_ts), grid)["start"])
    dim_keyed = dim.withColumnRenamed(dim_ts, "__grid_ts")
    out = bucketed.join(F.broadcast(dim_keyed), "__grid_ts", how)
    return out.drop("__grid_ts")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join (J5 stretch goal, SURVEY.md SS2.3): attach to every
    left row the nearest right row for the same key — ``backward``
    (most recent right with ``right_ts <= left_ts``, the default) or
    ``forward`` (earliest right with ``right_ts >= left_ts``); with
    ``tolerance_s`` the match must also lie within that many seconds
    (pandas merge_asof's full surface).

    Implemented as union + running ``last(ignorenulls)`` over a single
    per-key window - ONE shuffle on the key, unbounded lookback, and no
    range-join row explosion (a naive ``l.ts >= r.ts`` theta join is
    O(n*m) per key and unusable at 100 TB). Forward is the same pass
    with the window ordered descending. Equal timestamps match in both
    directions (right side sorts before left at the same instant).
    Tolerance is a post-filter on the carried match timestamp, not a
    join-shape change.

    Contract: the right side must be unique per ``(key, right_ts)``
    (pre-aggregate with max_by otherwise) and ``right_cols`` must not
    collide with left column names.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    ldt = dict(left.dtypes)
    left_payload = [c for c in left.columns if c != key]
    # Carry the whole right payload as ONE struct so the window pass is a
    # single last(ignorenulls) regardless of payload width (k window
    # expressions over the same spec -> 1). The match timestamp rides in
    # the struct so tolerance can be checked after the pass.
    rpay_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__mts")
    )
    rpay_type = right.select(
        *right_cols, F.col(right_ts).alias("__mts")
    ).schema
    l2 = left.select(
        F.col(key),
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rpay_type).alias("__rpay"),
    )
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left_payload],
        rpay_struct.alias("__rpay"),
    )
    from pyspark.sql import Window

    from smart_energy_consumption_analytics_using_big_data_spark.functions.timefns import epoch_us

    u = l2.unionByName(r2)

    def _running_last(frame, asc: bool):
        order = F.col("__ats") if asc else F.col("__ats").desc()
        w = (
            Window.partitionBy(key)
            .orderBy(order, "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__rpay", ignorenulls=True).over(w)

    def _within_tol(pay):
        if tolerance_s is None:
            return pay
        within = (
            F.abs(epoch_us(F.col("__ats")) - epoch_us(pay["__mts"]))
            <= int(tolerance_s) * 1_000_000
        )
        return F.when(within, pay)

    if direction == "nearest":
        # Both directional passes share the key shuffle (same partition
        # spec, two sort orders); the closer match wins, ties prefer the
        # EARLIER right row (backward), pandas merge_asof semantics.
        u = u.withColumn("__bwd", _within_tol(_running_last(u, asc=True))).withColumn(
            "__fwd", _within_tol(_running_last(u, asc=False))
        )
        d_b = F.abs(epoch_us(F.col("__ats")) - epoch_us(F.col("__bwd.__mts")))
        d_f = F.abs(epoch_us(F.col("__fwd.__mts")) - epoch_us(F.col("__ats")))
        u = u.withColumn(
            "__rpay",
            F.when(F.col("__bwd").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__bwd"))
            .when(d_f < d_b, F.col("__fwd"))
            .otherwise(F.col("__bwd")),
        ).drop("__bwd", "__fwd")
    else:
        u = u.withColumn("__rpay", _running_last(u, asc=direction == "backward"))
        u = u.withColumn("__rpay", _within_tol(F.col("__rpay")))
    return u.filter(F.col("__side") == 1).select(
        F.col(key),
        *[F.col(c) for c in left_payload],
        *[F.col("__rpay")[c].alias(c) for c in right_cols],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str] | None = None,
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join without a nested loop (J5 stretch,
    SURVEY.md SS2.3): a raw `p.ts BETWEEN i.start AND i.end` predicate
    gives Catalyst no equi-key, so it plans BroadcastNestedLoopJoin -
    O(points x intervals) and a non-starter at scale. Rewrite: floor
    points to a `bucket_s`-second grid (plain epoch arithmetic - cheaper
    than window() and free of Spark's one-time-window-per-plan rule),
    explode each interval to every grid bucket it overlaps, EQUI-join on
    (keys..., bucket), then residual-filter exact containment. Shuffle
    cost follows bucket overlap, not the cross product; pick `bucket_s`
    near the typical interval length so the explode stays small.
    """

    def floor_bucket(c: str) -> Column:
        # epoch_s handles timestamp / timestamp_ntz / epoch-second longs
        # uniformly (the testdata's ts representation has drifted once).
        return (epoch_s(c) / bucket_s).cast("long") * bucket_s

    pts = points.withColumn("__bkt", floor_bucket(point_ts))
    # sequence() throws on a negative span; an inverted interval means
    # "matches nothing", not "fail the query".
    intervals = intervals.filter(F.col(end_ts) >= F.col(start_ts))
    ivs = intervals.withColumn(
        "__bkt",
        F.explode(F.sequence(floor_bucket(start_ts), floor_bucket(end_ts), F.lit(bucket_s))),
    )
    keys = list(on or []) + ["__bkt"]
    # Containment goes INTO the join condition, not a post-join filter:
    # a filter after an outer join evaluates NULL on unmatched rows and
    # silently degrades how="left" to inner. Catalyst still extracts
    # the equality conjuncts as hash-join keys (the plan-shape test
    # pins no-nested-loop), and the range conjuncts ride along as the
    # join's residual condition — unmatched POINT rows survive with
    # NULLs, exactly left-outer semantics. Matched pairs land in
    # exactly one bucket (the point's), so inner/left cannot duplicate.
    # how='right'/'full' is REJECTED: an unmatched interval exploded to
    # N buckets would surface as N null-extended rows (one per probe
    # bucket), and the drop of the renamed interval-side key columns
    # below would erase those rows' keys — both wrong. Interval-
    # preserving semantics need a different plan (anti-join the
    # intervals back), not this one with a different how.
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "range_join_bucketed supports how='inner'|'left' only: the "
            "bucket explode makes interval-side outer variants emit one "
            "null-extended row PER overlapped bucket"
        )
    ren = {k: f"__iv_{k}" for k in keys}
    ivs = ivs.withColumnsRenamed(ren)
    cond = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    for k in keys:
        cond = (pts[k] == ivs[ren[k]]) & cond
    out = pts.join(ivs, cond, how)
    # restore the USING-join output shape: one column per key (the
    # point side's survives; for outer rows it is the non-null one)
    return out.drop(*[ivs[c] for c in ren.values()]).drop("__bkt")


def fuzzy_join_ed1(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
) -> DataFrame:
    """Edit-distance-<=1 fuzzy equi-join via deletion neighborhoods
    (FastSS / SymSpell blocking): ed(a,b) <= 1 implies a and b share a
    member of D(x) = {x} + all single-character deletions of x, so
    indexing each side on D(x) turns fuzzy matching into an exact
    equi-join on the variant key - len+1 index rows per string, shuffle
    on short string keys, NO quadratic all-pairs stage. Shared variants
    over-generate (e.g. 'ab'/'ba'), so candidates are verified with one
    levenshtein() per DISTINCT pair. The entity-resolution primitive
    (near-identical customer/site names) at linear index cost; k>1
    would need C(len,k) variants per row - keep k=1 for the 100 TB
    path and LSH (q_dedup_minhash_lsh) for looser matching.
    """

    def variants(id_col: str, str_col: str, id_out: str, str_out: str) -> DataFrame:
        src = left if id_col == left_id and str_col == left_str else right
        dels = F.transform(
            F.sequence(F.lit(1), F.length(str_col)),
            lambda i: F.concat(
                F.substring(F.col(str_col), F.lit(1), i - 1),
                F.col(str_col).substr(i + 1, F.length(str_col)),
            ),
        )
        return src.select(
            F.col(id_col).alias(id_out),
            F.col(str_col).alias(str_out),
            F.explode(F.array_union(F.array(F.col(str_col)), dels)).alias("__variant"),
        )
    va = variants(left_id, left_str, "id_a", "name_a")
    vb = variants(right_id, right_str, "id_b", "name_b")
    cands = (
        va.join(vb, "__variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    return cands.withColumn(
        "edit_distance", F.levenshtein("name_a", "name_b")
    ).filter(F.col("edit_distance") <= 1)


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    max_dim_rows: int = 5_000_000,
) -> DataFrame:
    """Shuffle join with a Bloom-filter pre-prune of the fact side.

    When the build side is too big to broadcast but still selective,
    the classic fix is a runtime Bloom filter: hash the build keys
    into an m-bit bitmap, cheap-test every fact row BEFORE the
    shuffle, and let the exact join swallow the false positives - the
    result is bit-identical to the plain join while the shuffle moves
    only (selectivity + fp_rate) of the fact table. This is what
    Spark's runtime.bloomFilter AQE rule injects for suitable plans;
    here it is an explicit operator so the pruning applies regardless
    of optimizer heuristics and the bitmap stays engine-portable
    (md5-slice hashes, not xxhash).

    The bitmap is built from one distinct-project of the dim keys -
    a driver collect bounded by min(n_hashes * |dim|, m_bits) ints
    (m_bits is the hard cap: 2^16 bits = 8 KiB bitmap as 1024 long
    literals). `max_dim_rows` guards the build-side count so the
    operator refuses fact-sized build inputs instead of silently
    degrading (fp rate -> 1 as the bitmap saturates).
    """
    # The fact-side pre-prune is lossless ONLY for join types where a
    # provably-unmatched fact row cannot appear in the output (no false
    # negatives: a pruned row matches no dim key). For how="left"/"full"
    # the pruned rows must appear null-extended, and for "left_anti"
    # they are exactly the wanted rows — the prune would return only
    # the bloom's false positives. Refuse instead of silently changing
    # semantics (same contract style as salted_join).
    if how not in ("inner", "right", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join supports how='inner'|'right'|'left_semi', got {how!r}: "
            "the bloom pre-prune drops fact rows that outer/anti joins must keep"
        )
    n_dim = dim.count()
    if n_dim > max_dim_rows:
        raise ValueError(
            f"bloom build side has {n_dim} rows > max_dim_rows={max_dim_rows}; "
            "a saturated bitmap prunes nothing - broadcast/shuffle join directly"
        )

    def positions(key_col: str) -> list[Column]:
        return [
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col(key_col).cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]

    set_bits = sorted(
        r["p"]
        for r in dim.select(F.explode(F.array(*positions(dim_key))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for p in set_bits:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement fold so every word fits a signed long literal
    bitmap = F.array(*[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in words])

    def bit_set(pos: Column) -> Column:
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        return F.getbit(word, (pos % 64).cast("int")) == 1
    probe = positions(fact_key)
    test = probe[0].isNotNull()
    for p in probe:
        test = test & bit_set(p)
    pruned = fact.filter(test)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
