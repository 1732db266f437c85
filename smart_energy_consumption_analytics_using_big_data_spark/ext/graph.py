"""Graph analytics over similarity/relationship edges (extension
surface; complements ext/dedup.connected_components).

PageRank here is the FIXED-ITERATION variant: a known iteration count
unrolls to a deterministic dataflow (each round = one join + one
aggregation), which keeps the result oracle-checkable and the lineage
bounded without checkpointing. Contribution sums accumulate in DECIMAL
after rounding each contribution at 1e-12, so the result is identical
across engines and partitionings - float-order-independent, the same
trick as operators/aggregates.sum_exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_hops(
    edges: DataFrame,
    seed_mod: int = 10,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded multi-source BFS: hop distance from a seed set.

    Seeds are the graph nodes with ``id % seed_mod == 0`` (a
    deterministic sample of entry points); each round relaxes
    ``dist(v) = min(dist(v), min_{(u,v) in E} dist(u) + 1)`` as one
    equi-join on src plus one min-aggregation on node id — the
    Bellman-Ford step specialised to unit weights. ``max_hops`` rounds
    unroll to a fixed dataflow (no driver-side convergence loop), so
    the result is the exact <=max_hops-hop neighborhood, all-integer
    and oracle-checkable against the same unrolled recurrence.

    At scale each round shuffles at most |frontier-adjacent E| + |V|
    rows on the node key; lineage stays bounded by the fixed round
    count (the same design as `pagerank` above).

    Cache lifecycle: each round's result is persisted and eagerly
    materialized, then the SUPERSEDED round (and finally the edge
    cache) is unpersisted — a call leaves exactly one cached table in
    the session, the returned result, which the caller owns (the
    GraphFrames contract). Without the release, every call parked
    ``max_hops + 2`` node/edge tables in the block manager for the
    session's lifetime.

    Shuffle discipline: the edge list is hash-repartitioned on the
    join key ONCE and cached with that partitioning, so every round's
    equi-join reuses it without a fresh |E| exchange — only the (much
    smaller) distance table shuffles per round. Seeds derive from the
    cached, partitioned table, so the upstream edge pipeline (often an
    expensive similarity/blocking join) executes exactly once.
    """
    ed = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst"))
        .repartition("id")
        .persist()
    )
    ed.count()
    dist = (
        ed.select("id")
        .filter(F.col("id") % seed_mod == 0)
        .distinct()
        .select("id", F.lit(0).alias("dist"))
    )
    prev = None
    for _ in range(max_hops):
        hop = ed.join(dist, "id").select(
            F.col("__dst").alias("id"), (F.col("dist") + 1).alias("dist")
        )
        # each round references dist TWICE (carry + relax); persisting
        # the round result keeps the lineage linear — without it the
        # duplicated subplan re-executes ~2^round times (measured 8.5 s
        # -> 3.9 s for 4 rounds on the 525k-edge sf0.1 graph)
        dist = (
            dist.unionByName(hop)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        # pin this round's blocks BEFORE releasing its predecessor, so
        # the unpersist can never trigger the exponential recompute it
        # exists to prevent
        dist.count()
        if prev is not None:
            prev.unpersist()
        prev = dist
    ed.unpersist()
    return dist


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    Per round: contribution = rank/out-degree routed along edges (one
    equi-join on src), summed per destination (one shuffle on dst),
    then the damping update. Nodes = every endpoint; dangling mass is
    dropped (standard simplification for similarity graphs, where
    symmetric edges mean no dangling nodes anyway). The node count is
    the only driver scalar - same class as a convergence check.

    At scale each round shuffles |E| contribution rows; with a bounded
    `iters` the whole computation is `iters` joins, no iterative
    driver loop over collected data.
    """
    # Spark does not CSE identical subplans: without materializing the
    # edge list, every iteration (and the nodes/degree derivations)
    # would re-execute the upstream edge pipeline - for a similarity
    # graph that is the whole LSH/blocking join, per use. Materialize
    # it ONCE, hash-partitioned on the contribution join key, so every
    # round's equi-join (and the degree rollup) reuses the cached
    # partitioning instead of re-exchanging |E| rows per iteration.
    ed = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst"))
        .repartition("id")
        .persist()
    )
    ed.count()
    edges = ed  # released by _finish_ranks
    nodes = (
        ed.select("id")
        .union(ed.select(F.col("__dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = ed.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    base = 1.0 - damping
    ranks = nodes.select("id", F.round(F.lit(1.0) / n, 12).alias("rank"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, "id")
            .join(deg, "id")
            .select(
                F.col("__dst").alias("id"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "id", "left").select(
            "id",
            F.round(
                F.lit(base) / n
                + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    return _finish_ranks(ranks, edges, nodes)


def _finish_ranks(ranks: DataFrame, edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Materialize the final rank table, then release the edge/node
    caches the iteration needed — the caller owns only the returned
    (persisted) result. Without the release each call parked the edge
    pipeline and node table in the block manager for the session's
    lifetime (round-5 advice)."""
    out = ranks.select("id", F.round("rank", 6).alias("rank")).persist()
    out.count()
    nodes.unpersist()
    edges.unpersist()
    return out


def personalized_pagerank(
    edges: DataFrame,
    seed_mod: int = 10,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank: restart mass concentrates on the seed set
    (nodes with ``id % seed_mod == 0``) instead of spreading uniformly,
    so rank measures relatedness TO THE SEEDS — the recommendation /
    relatedness variant (Haveliwala 2002) of the centrality walk above.
    Same fixed-iteration dataflow, decimal-rounded contribution sums,
    and once-materialized key-partitioned edge cache as `pagerank`;
    the only change is the restart vector."""
    ed = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst"))
        .repartition("id")
        .persist()
    )
    ed.count()
    edges = ed  # released by _finish_ranks
    nodes = (
        ed.select("id")
        .union(ed.select(F.col("__dst").alias("id")))
        .distinct()
        .persist()
    )
    is_seed = F.col("id") % seed_mod == 0
    ns = nodes.filter(is_seed).count()
    deg = ed.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    base = 1.0 - damping
    ranks = nodes.select(
        "id",
        F.when(is_seed, F.round(F.lit(1.0) / ns, 12)).otherwise(F.lit(0.0)).alias(
            "rank"
        ),
    )
    for _ in range(iters):
        contrib = (
            ed.join(ranks, "id")
            .join(deg, "id")
            .select(
                F.col("__dst").alias("id"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "id", "left").select(
            "id",
            F.round(
                F.when(is_seed, F.lit(base) / ns).otherwise(F.lit(0.0))
                + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    return _finish_ranks(ranks, edges, nodes)
