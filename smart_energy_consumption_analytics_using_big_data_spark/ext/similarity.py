"""Similarity search over embedding columns (SURVEY.md SS7).

Brute-force cosine top-k as the exact baseline, plus deterministic
random-hyperplane LSH bucketing as the scale path (bucket first, then
brute-force within buckets - turns O(N*Q) into O(bucket * Q)).

Hyperplane weights derive from md5 in *Python* at plan-build time and
are embedded as literal arrays, so the plan is pure JVM column math
(zip_with/aggregate) - no Python at execution time, fully portable to
the SQL oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions.vectorfns import (
    cosine,
    dot,
    norm,
)


def _cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """`cosine(a, b)` with the two norms hoisted to precomputed columns.

    Bit-identical to `cosine`: same dot, same `norm(a) * norm(b)`
    operand order, same try_divide — only WHERE the norms are computed
    moves (once per row before a pair join instead of once per joined
    pair). Callers must build `na`/`nb` with `norm()` on the exact
    array column they pass as `a`/`b`."""
    return F.try_divide(dot(a, b), na * nb)


def hyperplane_signs(plane: int, dim: int) -> list[float]:
    """Deterministic +-1.0 weights for one hyperplane (md5-seeded)."""
    out = []
    for i in range(dim):
        digest = hashlib.md5(f"{plane}_{i}".encode()).hexdigest()
        out.append(1.0 if digest[0] in "89abcdef" else -1.0)
    return out


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a 1-row query DataFrame.

    The query side broadcasts (it is one row); similarity is computed
    in a single scan over the corpus, then TakeOrdered picks k - no
    global sort materialization.
    """
    q = query.select(F.col(vec_col).alias("__qvec"))
    scored = embeddings.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    )
    return (
        scored.drop("__qvec", vec_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector ('0101...' string).

    Vectors in the same bucket are cosine-similar with high probability;
    ANN search = bucket equi-join + in-bucket brute force.
    """
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(s) for s in hyperplane_signs(p, dim)])
        prods = F.zip_with(F.col(vec_col), signs, lambda x, w: x.cast("double") * w)
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj > 0, "1").otherwise("0"))
    return embeddings.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (brute force).

    All-pairs join - correct but quadratic; the verification stage of a
    dedup pipeline. At corpus scale use neardup_pairs_lsh, which joins
    only within LSH buckets.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
        "cosine",
        F.round(
            _cosine_pre(F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")), 6
        ),
    )
    return pairs.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs restricted to same-LSH-bucket candidates - the
    scale path: shuffle on bucket, pair join per bucket."""
    buckets = lsh_buckets(embeddings, n_planes, dim, vec_col, id_col)
    tagged = embeddings.withColumn("__n", norm(F.col(vec_col))).join(buckets, id_col)
    a = tagged.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("__n").alias("__na"),
        F.col("bucket"),
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("__n").alias("__nb"),
        F.col("bucket"),
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b")).withColumn(
        "cosine",
        F.round(
            _cosine_pre(F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")), 6
        ),
    )
    return pairs.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def ann_topk_lsh(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's bucket."""
    buckets = lsh_buckets(embeddings, n_planes, dim, vec_col, id_col)
    corpus = embeddings.join(buckets, id_col)
    qb = query.join(buckets, id_col).select(
        F.col(vec_col).alias("__qvec"), F.col("bucket").alias("__qbucket")
    )
    scored = corpus.join(
        F.broadcast(qb), F.col("bucket") == F.col("__qbucket")
    ).withColumn("cosine", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6))
    return (
        scored.select(id_col, "bucket", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF coarse quantizer training: one centroid per label cell as an
    array column (posexplode -> per-dimension mean -> re-assemble).
    Output: (cell, centroid array<double>) - centroid count = |labels|,
    always broadcast-sized."""
    per_dim = (
        embeddings.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cval"))
    )
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            F.col(label_col).alias("cell"),
            F.transform("pairs", lambda s: s["cval"]).alias("centroid"),
        )
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest (max-cosine) centroid cell -
    the inverted-list build. Centroids broadcast; one scan over the
    corpus, k cosine evaluations per row, row_number picks the cell
    (round(,6) + cell tiebreak for cross-engine determinism). The
    vector's own norm is hoisted out of the per-centroid cosine (k
    dot products per row instead of 3k; centroid norms ride the
    broadcast) — bit-identical, see _cosine_pre."""
    from pyspark.sql import Window

    cents = centroids.withColumn("__cn", norm(F.col("centroid")))
    scored = (
        embeddings.withColumn("__vn", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cell_cosine",
            F.round(
                _cosine_pre(
                    F.col(vec_col), F.col("centroid"), F.col("__vn"), F.col("__cn")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_cosine"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cell", "cell_cosine")
    )


def ivf_probe_cells(cents: DataFrame, qv: DataFrame, nprobe: int) -> DataFrame:
    """The `nprobe` cells whose centroids are max-cosine to the query —
    the coarse probe shared by the train-inline path (ann_topk_ivf) and
    the persisted index (ext/vector_index.search_ivf_index). One shared
    definition so the parity-critical ranking (round(,6) cosine, cell
    tiebreak) cannot drift between the two."""
    return (
        cents.crossJoin(F.broadcast(qv))
        .withColumn("qcos", F.round(cosine(F.col("centroid"), F.col("__qvec")), 6))
        .orderBy(F.desc("qcos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )


def ivf_score_topk(
    corpus: DataFrame, qv: DataFrame, k: int, vec_col: str, id_col: str
) -> DataFrame:
    """Fine scoring over the probed cells' vectors — the other shared
    half of the IVF contract (round(,6) cosine, id tiebreak)."""
    scored = corpus.crossJoin(F.broadcast(qv)).withColumn(
        "cosine", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    )
    return (
        scored.select(id_col, "cell", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF ANN: probe the `nprobe` cells nearest the query and brute-
    force only their inverted lists - the classic recall/cost dial
    (nprobe = n_cells degenerates to exact search). Complements
    ann_topk_lsh; at 100 TB the lists are the shuffle partitioning."""
    cents = ivf_centroids(embeddings, vec_col, label_col)
    lists = ivf_assign(embeddings, cents, vec_col, id_col)
    qv = query.select(F.col(vec_col).alias("__qvec"))
    probe = ivf_probe_cells(cents, qv, nprobe)
    corpus = embeddings.join(lists.join(F.broadcast(probe), "cell"), id_col)
    return ivf_score_topk(corpus, qv, k, vec_col, id_col)


def pq_codebook(
    embeddings: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization codebook (Jegou et al. 2011): split each
    vector into ``m`` contiguous ``sub_dim``-wide subspaces and learn
    ``k`` centroids per subspace with ONE Lloyd step from a
    deterministic hash assignment (md5(vec_id) % k) - the same
    derandomized-k-means trick the IVF path uses, so the whole PQ
    pipeline stays oracle-able with zero RNG.

    Output: (s, code, pos, cval) rows - at most m*k*sub_dim cells
    (4*16*16 = 1024 doubles here), broadcast-sized by construction at
    any corpus scale. Training is one posexplode scan + a map-side-
    combined mean; nothing corpus-sized leaves the executors.
    """
    code0 = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast("int")
        % k
    )
    return (
        embeddings.select(code0.alias("code"), F.posexplode(vec_col).alias("pos", "val"))
        .withColumn("s", (F.col("pos") / sub_dim).cast("int"))
        .groupBy("s", "code", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cval"))
    )


def pq_codebook_arrays(
    embeddings: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Codebook re-assembled to (s, code, centroid array<double>) - the
    broadcast-join form the encode/search stages consume."""
    cb = pq_codebook(embeddings, m, sub_dim, k, vec_col, id_col)
    return (
        cb.groupBy("s", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select("s", "code", F.transform("pairs", lambda p: p["cval"]).alias("centroid"))
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ encode: per (vector, subspace), the L2-nearest codebook entry.
    64 float dims compress to m=4 single-byte codes (16x).

    Shape: the corpus expands to m rows per vector (slice per subspace,
    NOT a posexplode per dimension), each joined against the broadcast
    codebook (m*k rows); the k*sub_dim multiply-adds per row run inside
    one codegen'd zip_with/aggregate expression. row_number picks the
    argmin with (rounded d2, code) ordering for cross-engine ties.
    """
    from pyspark.sql import Window

    cba = pq_codebook_arrays(embeddings, m, sub_dim, k, vec_col, id_col)
    sub = embeddings.select(
        F.col(id_col), F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), F.col(vec_col)
    ).select(
        id_col,
        "s",
        F.slice(F.col(vec_col), F.col("s") * sub_dim + 1, F.lit(sub_dim)).alias("subvec"),
    )
    scored = sub.join(F.broadcast(cba), "s").withColumn(
        "d2",
        F.round(
            F.aggregate(
                F.zip_with(
                    "subvec",
                    "centroid",
                    lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ),
    )
    w = Window.partitionBy(id_col, "s").orderBy("d2", "code")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "s", "code", "d2")
    )


def pq_search_adc(
    embeddings: DataFrame,
    query: DataFrame,
    k_top: int = 10,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: distances from the query to
    every codebook centroid are precomputed ONCE (m*k-entry table,
    broadcast), then each encoded vector's approximate distance is a
    sum of m table lookups - no per-vector float math at all. The
    query-time cost model that makes PQ the standard billion-vector
    path: the corpus is touched only through its m-byte codes.
    """
    cba = pq_codebook_arrays(embeddings, m, sub_dim, k, vec_col, id_col)
    enc = pq_encode(embeddings, m, sub_dim, k, vec_col, id_col)
    qsub = query.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), F.col(vec_col)
    ).select(
        "s", F.slice(F.col(vec_col), F.col("s") * sub_dim + 1, F.lit(sub_dim)).alias("qsub")
    )
    dtab = qsub.join(cba, "s").select(
        "s",
        "code",
        F.aggregate(
            F.zip_with(
                "qsub", "centroid", lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dq"),
    )
    adc = (
        enc.join(F.broadcast(dtab), ["s", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("dq"), 6).alias("adc_dist"))
    )
    return adc.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k_top)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    corpus, then drop any vector whose cosine to a LOWER-id vector in
    the SAME cell reaches `threshold` - lowest id is the deterministic
    representative. Output: (vec_id, cell, kept).

    Scale shape: the quadratic similarity is confined inside cells
    (the whole point of the clustering stage - cells are the shuffle
    partitioning, never an all-pairs join), the pair join is an
    equi-join on cell, and the duplicate set distinct-projects only
    ids. Mirrors the reference's dedup intent at embedding level
    (anomaly_detection.py cluster stage repurposed for data curation).
    """
    # materialize the assignment once: it feeds BOTH sides of the pair
    # join plus the final keep-flag projection, and Spark replays
    # unpersisted subplans per use (8 corpus scans without this)
    cells = (
        ivf_assign(embeddings, ivf_centroids(embeddings, vec_col, label_col),
                   vec_col, id_col)
        .select(id_col, "cell")
        .persist()
    )
    # each row meets ~|cell| partners in the pair join below: hoist its
    # norm out of the per-pair cosine (one dot per pair instead of
    # three; bit-identical, see _cosine_pre)
    tagged = embeddings.select(
        id_col, vec_col, norm(F.col(vec_col)).alias("__n")
    ).join(cells, id_col)
    a = tagged.select(
        F.col(id_col).alias("id_a"),
        F.col("cell"),
        F.col(vec_col).alias("va"),
        F.col("__n").alias("__na"),
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"),
        F.col("cell"),
        F.col(vec_col).alias("vb"),
        F.col("__n").alias("__nb"),
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                _cosine_pre(F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")), 6
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        cells.join(dups.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_salt: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched exact kNN join: the top-k cosine neighbors in `corpus`
    for EVERY row of `queries` at once (retrieval eval, semantic-dedup
    verification, hard-negative mining) — the multi-query counterpart
    of cosine_topk's single probe.

    Scale shape: the query batch broadcasts (bounded by construction),
    so scoring is one map-side corpus scan producing |Q| rows per
    corpus row. Grouped top-k then runs in TWO window stages: stage 1
    partitions by (query, corpus_id % n_salt) and keeps each salt
    slice's local top-k; stage 2 reduces the n_salt*k survivors per
    query to the final k. Top-k distributes over a partition union, so
    the result is exact — but no single window partition ever holds a
    whole corpus's scores (with a handful of queries, an unsalted
    window would sort N rows in ONE task; salting bounds it at ~N/n_salt
    and the second stage touches only Q*n_salt*k rows). Ties break on
    the corpus id, so the output is deterministic and SQL-oracle-able.
    """
    # every corpus row is scored against all |Q| queries: hoist the
    # corpus norm out of the per-(row, query) cosine and ship the query
    # norms inside the broadcast batch (bit-identical, see _cosine_pre)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col),
            norm(F.col(vec_col)).alias("__cn"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_pre(
                    F.col(vec_col), F.col("__qvec"), F.col("__cn"), F.col("__qn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    order = [F.desc("cosine"), F.asc("neighbor_id")]
    local = Window.partitionBy(
        "query_id", F.pmod(F.col("neighbor_id"), F.lit(n_salt))
    ).orderBy(*order)
    survivors = (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivfpq_search(
    embeddings: DataFrame,
    query: DataFrame,
    k_top: int = 10,
    nprobe: int = 2,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF-PQ asymmetric search — the composition that is the standard
    billion-vector ANN layout (Jegou et al. 2011; FAISS's IVFPQ): a
    coarse quantizer routes the query to `nprobe` inverted lists, and
    within them vectors are scored through PQ codes trained on the
    RESIDUAL (vector - cell centroid), which quantizes a much tighter
    distribution than raw vectors.

    Scale shape: centroids and the PQ codebook are broadcast-sized BY
    CONSTRUCTION (|cells| and m*k*sub_dim rows); the corpus appears as
    one scan for assignment, one for residual encoding; query time
    touches only the probed cells' codes via an m*k ADC lookup table
    per cell. Everything derandomized (label centroids, md5 hash init)
    so the whole composite carries a SQL oracle.
    """
    cents = ivf_centroids(embeddings, vec_col, label_col)
    # The assignment and residual tables feed the codebook, the encode
    # pass AND the final list restriction; without materialization the
    # composite re-scans the corpus 8x (measured via the plan audit).
    # A lazy localCheckpoint computes each once and lets the
    # ContextCleaner reclaim the blocks when the plan is dropped — at
    # full scale this is the deliberate index-build materialization
    # every IVF-PQ construction does (the codes ARE the product).
    assign = (
        ivf_assign(embeddings, cents, vec_col, id_col)
        .select(id_col, "cell")
        .localCheckpoint(eager=False)
    )
    res_vec = (
        embeddings.join(assign, id_col)
        .join(F.broadcast(cents), "cell")
        .select(
            id_col,
            F.zip_with(
                vec_col, "centroid", lambda x, c: x.cast("double") - c
            ).alias("res"),
        )
        .localCheckpoint(eager=False)
    )
    enc = pq_encode(res_vec, m, sub_dim, k, vec_col="res", id_col=id_col)
    cba = pq_codebook_arrays(res_vec, m, sub_dim, k, vec_col="res", id_col=id_col)

    qv = query.select(F.col(vec_col).alias("__qvec"))
    probe = (
        cents.crossJoin(F.broadcast(qv))
        .withColumn("qcos", F.round(cosine(F.col("centroid"), F.col("__qvec")), 6))
        .orderBy(F.desc("qcos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell", "centroid")
    )
    qres = probe.crossJoin(F.broadcast(qv)).select(
        "cell",
        F.zip_with("__qvec", "centroid", lambda x, c: x.cast("double") - c).alias(
            "qres"
        ),
    )
    qsub = qres.select(
        "cell", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "qres"
    ).select(
        "cell",
        "s",
        F.slice(F.col("qres"), F.col("s") * sub_dim + 1, F.lit(sub_dim)).alias("qsubv"),
    )
    dtab = qsub.join(F.broadcast(cba), "s").select(
        "cell",
        "s",
        "code",
        F.aggregate(
            F.zip_with("qsubv", "centroid", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dq"),
    )
    adc = (
        enc.join(assign, id_col)
        .join(F.broadcast(dtab), ["cell", "s", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("dq"), 6).alias("adc_dist"))
    )
    return adc.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k_top)


def kcenter_select(
    embeddings: DataFrame,
    k: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985): pick the
    max-norm vector, then repeatedly the vector FARTHEST from every
    center chosen so far - a 2-approximation of the optimal k-center
    cover and the standard diversity-sampling pass for training-data
    curation (coresets cover the embedding space instead of its dense
    clusters, which uniform sampling oversamples).

    Distributed shape: each of the k rounds is ONE corpus scan - the
    chosen centers are literal arrays in the plan (k scalar-sized
    collect()s, the same convergence-probe pattern as
    connected_components), the running min-distance column is updated
    with `least(...)`, and the argmax is a TakeOrdered(1), never a
    global sort. Total work k scans x O(k) dot products per row;
    k is a constant (coreset size), so the pass stays linear in the
    corpus at any scale. Determinism: squared distances in double with
    a vec_id tiebreak on every argmax.

    Returns the k selected rows as (sel_rank, vec_id, radius) where
    radius is the min squared distance to the previously selected
    centers at selection time (the coverage radius sequence; rank 1
    has radius 0 by convention).
    """
    from smart_energy_consumption_analytics_using_big_data_spark.functions.vectorfns import dot

    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))

    def lit_vec(vals):
        return F.array(*[F.lit(float(x)) for x in vals])

    def d2(center_vals):
        c = lit_vec(center_vals)
        return dot(F.col("v"), F.col("v")) - 2 * dot(F.col("v"), c) + dot(c, c)

    schema = "sel_rank int, vec_id bigint, radius double"
    first_rows = base.orderBy(
        F.desc(dot(F.col("v"), F.col("v"))), F.asc("vec_id")
    ).limit(1).collect()
    if not first_rows:
        # empty corpus -> empty selection (compose like the graph ops),
        # not an IndexError on the argmax collect
        return embeddings.sparkSession.createDataFrame([], schema)
    first = first_rows[0]
    selected = [(1, int(first["vec_id"]), 0.0)]
    cur = base.withColumn("md", d2(first["v"]))
    for rank in range(2, k + 1):
        nxt = cur.orderBy(F.desc("md"), F.asc("vec_id")).limit(1).collect()[0]
        if float(nxt["md"]) <= 1e-9:
            # the farthest uncovered point is at (numerically) zero
            # distance: every remaining row coincides with a selected
            # center (k exceeds the distinct-point count, or exact
            # duplicates) — further rounds would emit arbitrary
            # radius-0 "centers" that add no coverage. The epsilon
            # matters: d2 = v.v - 2v.c + c.c in floating point leaves
            # a tiny positive residual for duplicates whose coordinates
            # aren't exactly representable, so an exact <= 0.0 test
            # would keep emitting those duplicates as centers. The
            # reported radius is rounded to 6 dp, so 1e-9 is far below
            # anything observable. Gonzalez's sequence is complete; stop.
            break
        selected.append((rank, int(nxt["vec_id"]), round(float(nxt["md"]), 6)))
        if rank < k:
            cur = cur.withColumn("md", F.least(F.col("md"), d2(nxt["v"])))
    return embeddings.sparkSession.createDataFrame(selected, schema)
