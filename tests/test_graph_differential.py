"""Randomized differentials and degenerate-input checks for the
clever-path operators (BFS, PageRank, connected components, k-center).

bfs_hops (ext/graph.py) relaxes round k by probing the cached edge
table with only the nodes FIRST settled at k-1 — an optimization over
the naive full-distance-table relax. The BPE lazy-path history (two
parity bugs between a clever path and the simple path it replaced,
PERFORMANCE.md rounds 7/10) is the reason this clever path gets a
randomized differential against an independent pure-Python BFS, not
just the fixed hand graphs in test_round5_ops.

Graph generator deliberately covers the shapes that distinguish the
frontier-delta relax from the full relax:
- multiple seeds with overlapping neighborhoods (min must win);
- duplicate edges and self-loops (relax must be insensitive);
- nodes reachable at several path lengths (shortest must survive);
- components with no seed (must be absent from the result);
- graphs whose frontier exhausts before max_hops (early exit must
  not truncate settled distances).
"""

from __future__ import annotations

import random
from collections import deque

from hypothesis import given, settings, strategies as st


def _python_bfs(edge_list, seed_mod: int, max_hops: int) -> dict[int, int]:
    """Independent reference: textbook multi-source BFS over an
    adjacency dict, bounded at max_hops."""
    adj: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    dist = {n: 0 for n in nodes if n % seed_mod == 0}
    frontier = deque(dist)
    while frontier:
        u = frontier.popleft()
        if dist[u] == max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                frontier.append(v)
    return dist


def _random_graph(rng: random.Random) -> list[tuple[int, int]]:
    n_nodes = rng.randint(2, 40)
    node_ids = rng.sample(range(0, 200), n_nodes)
    n_edges = rng.randint(1, 80)
    edges = []
    for _ in range(n_edges):
        a, b = rng.choice(node_ids), rng.choice(node_ids)
        edges.append((a, b))
        if rng.random() < 0.7:  # mostly symmetric, like the co-purchase graph
            edges.append((b, a))
        if rng.random() < 0.15:  # duplicate edges
            edges.append((a, b))
    return edges


@settings(max_examples=12, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=5),
    st.sampled_from([3, 5, 10]),
)
def test_bfs_matches_python_reference(spark, seed, max_hops, seed_mod):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import bfs_hops

    rng = random.Random(seed)
    edge_list = _random_graph(rng)
    # seedless graphs are themselves a covered case: both sides return
    # an empty distance map and must agree on that too
    expected = _python_bfs(edge_list, seed_mod, max_hops)

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.id: r.dist
        for r in bfs_hops(edges, seed_mod=seed_mod, max_hops=max_hops).collect()
    }
    assert got == expected


def _python_pagerank(edge_list, iters: int, damping: float = 0.85) -> dict[int, float]:
    """Independent reference replicating ext/graph.pagerank's exact
    arithmetic: per-edge contribution = HALF_UP-round(rank/out_deg, 12)
    summed EXACTLY in decimal (Spark side: decimal(28,12) sum), then
    the damped update in double, rounded 12; final ranks rounded 6.
    Duplicate edges contribute per-row; dangling mass is dropped."""
    import decimal

    def r(x: float, n: int) -> float:
        q = decimal.Decimal(1).scaleb(-n)
        return float(decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP))

    nodes = sorted({v for e in edge_list for v in e})
    n = len(nodes)
    deg: dict[int, int] = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: r(1.0 / n, 12) for v in nodes}
    for _ in range(iters):
        recv = {v: decimal.Decimal(0) for v in nodes}
        for s, d in edge_list:
            recv[d] += decimal.Decimal(repr(r(rank[s] / deg[s], 12)))
        rank = {
            v: r((1.0 - damping) / n + damping * float(recv[v]), 12) for v in nodes
        }
    return {v: r(x, 6) for v, x in rank.items()}


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from([1, 2, 3]),
)
def test_pagerank_matches_python_reference(spark, seed, iters):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import pagerank

    rng = random.Random(seed)
    edge_list = _random_graph(rng)
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edges, iters=iters).collect()}
    assert got == _python_pagerank(edge_list, iters)


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_bfs_dedupe_path_matches_reference(spark, seed):
    """dedupe=True (the q_graph_bfs production path: raw pairs, dedup
    fused into the edge repartition) must agree with the reference too."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import bfs_hops

    rng = random.Random(seed)
    edge_list = _random_graph(rng)
    expected = _python_bfs(edge_list, 10, 4)

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.id: r.dist
        for r in bfs_hops(edges, seed_mod=10, max_hops=4, dedupe=True).collect()
    }
    assert got == expected


def _python_components(edge_list) -> dict[int, int]:
    """Independent union-find reference: component id = min member."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_connected_components_match_union_find(spark, seed):
    """Full label differential: the endpoints-agree/min-label property
    test (test_properties.py) cannot catch OVER-merging — a labeling
    that wrongly fuses two disjoint components still satisfies both
    assertions. Comparing the complete label map against union-find
    closes that hole for the pointer-doubling implementation."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.dedup import (
        connected_components,
    )

    rng = random.Random(seed)
    edge_list = _random_graph(rng)
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == _python_components(edge_list)


def _python_personalized_pagerank(
    edge_list, seed_mod: int, iters: int, damping: float = 0.85
) -> dict[int, float]:
    """Independent reference for ext/graph.personalized_pagerank: seeds
    split the initial and restart mass; non-seeds start (and restart)
    at zero; contribution arithmetic identical to _python_pagerank."""
    import decimal

    def r(x: float, n: int) -> float:
        q = decimal.Decimal(1).scaleb(-n)
        return float(decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP))

    nodes = sorted({v for e in edge_list for v in e})
    seeds = [v for v in nodes if v % seed_mod == 0]
    ns = len(seeds)
    deg: dict[int, int] = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: (r(1.0 / ns, 12) if v % seed_mod == 0 else 0.0) for v in nodes}
    for _ in range(iters):
        recv = {v: decimal.Decimal(0) for v in nodes}
        for s, d in edge_list:
            recv[d] += decimal.Decimal(repr(r(rank[s] / deg[s], 12)))
        rank = {
            v: r(
                ((1.0 - damping) / ns if v % seed_mod == 0 else 0.0)
                + damping * float(recv[v]),
                12,
            )
            for v in nodes
        }
    return {v: r(x, 6) for v, x in rank.items()}


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from([1, 2, 3]),
)
def test_personalized_pagerank_matches_python_reference(spark, seed, iters):
    import pytest as _pytest

    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        personalized_pagerank,
    )

    rng = random.Random(seed)
    edge_list = _random_graph(rng)
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    has_seeds = any(v % 10 == 0 for e in edge_list for v in e)
    if not has_seeds:
        with _pytest.raises(ValueError, match="no seed nodes"):
            personalized_pagerank(edges, seed_mod=10, iters=iters)
        return
    got = {
        r.id: r.rank
        for r in personalized_pagerank(edges, seed_mod=10, iters=iters).collect()
    }
    assert got == _python_personalized_pagerank(edge_list, 10, iters)



@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_bfs_symmetric_flag_matches_reference_on_symmetrized_graph(spark, seed):
    """symmetric_edges=True is a caller assertion (src-only seed scan);
    on an actually-symmetrized graph it must agree with both the
    default path and the Python reference."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import bfs_hops

    rng = random.Random(seed)
    sym = []
    for a, b in _random_graph(rng):
        sym += [(a, b), (b, a)]
    expected = _python_bfs(sym, 10, 4)
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {
        r.id: r.dist
        for r in bfs_hops(edges, seed_mod=10, max_hops=4, symmetric_edges=True).collect()
    }
    assert got == expected



def test_pagerank_empty_graph_returns_empty(spark):
    # empty edge list composes like bfs/connected_components: empty
    # result, not a DIVIDE_BY_ZERO from the 1/n restart literals
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        pagerank,
        personalized_pagerank,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=2).count() == 0
    assert personalized_pagerank(empty, seed_mod=10, iters=2).count() == 0



def test_oriented_triangles_output_contract(spark):
    """oriented_triangles returns unique (a, b, c) vertex columns —
    selectable and join-backable (the raw 3-way self-join carries
    ambiguous lo/hi names) — and finds exactly the true triangles."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        oriented_triangles,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], "u long, v long"
    )
    tri = oriented_triangles(edges)
    assert set(tri.columns) == {"a", "b", "c"}
    got = sorted(tuple(sorted((r["a"], r["b"], r["c"]))) for r in tri.select("a", "b", "c").collect())
    assert got == [(1, 2, 3), (3, 4, 5)]
    # empty graph -> empty, not an error
    empty = spark.createDataFrame([], "u long, v long")
    assert oriented_triangles(empty).count() == 0


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_oriented_triangles_canonicalize_matches_reference(spark, seed):
    """ADVICE r12: a deduped-but-uncanonicalized undirected edge list
    (both (u,v) and (v,u) present, self-loops, duplicates) silently
    over-counts under the canonical-input contract; canonicalize=True
    must recover the exact textbook triangle set. Differential vs a
    pure-Python set-based count on random mixed-orientation graphs,
    plus: canonical input with/without the flag agrees (the flag is a
    no-op shuffle on already-canonical edges, never a semantic one)."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
        oriented_triangles,
    )

    rng = random.Random(seed)
    raw = _random_graph(rng) + [(7, 7)]  # mixed orientations + a self-loop
    adj: dict[int, set[int]] = {}
    for a, b in raw:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sorted(
        (a, b, c)
        for a in adj
        for b in adj[a]
        if b > a
        for c in adj[a] & adj[b]
        if c > b
    )

    edges = spark.createDataFrame(raw, "u long, v long")
    got_df = oriented_triangles(edges, canonicalize=True)
    got = sorted(
        tuple(sorted((r["a"], r["b"], r["c"])))
        for r in got_df.select("a", "b", "c").collect()
    )
    assert got == want

    canonical = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    cdf = spark.createDataFrame(canonical, "u long, v long")
    base = sorted(
        tuple(sorted((r["a"], r["b"], r["c"])))
        for r in oriented_triangles(cdf).select("a", "b", "c").collect()
    )
    assert base == want


def test_kcenter_degenerate_inputs(spark):
    # empty corpus -> empty selection; k exceeding the distinct-point
    # count stops at full coverage instead of emitting arbitrary
    # radius-0 duplicate "centers"
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
        kcenter_select,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_select(empty, k=4, id_col="vec_id", vec_col="embedding").count() == 0

    pts = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 4.0]), (4, [3.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_select(pts, k=10, id_col="vec_id", vec_col="embedding").collect()
    # 3 distinct points cover everything (4 duplicates 2); ranks 1..3,
    # radii strictly positive after rank 1
    assert [r["sel_rank"] for r in rows] == [1, 2, 3]
    assert all(r["radius"] > 0 for r in rows if r["sel_rank"] > 1)
    assert len({r["vec_id"] for r in rows}) == 3

    # duplicates with NON-exactly-representable coordinates: the
    # d2 = v.v - 2v.c + c.c float residual is tiny-positive, not zero,
    # so an exact <=0.0 stop would keep emitting radius-~0 duplicate
    # centers (r11 ADVICE) — the epsilon stop must still halt at the
    # distinct-point count
    dup = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.1, 0.2]), (3, [0.7, 0.3]), (4, [0.7, 0.3])],
        "vec_id long, embedding array<float>",
    )
    drows = kcenter_select(dup, k=4, id_col="vec_id", vec_col="embedding").collect()
    assert [r["sel_rank"] for r in drows] == [1, 2]
    got = {tuple(sorted({1, 2} & {r["vec_id"] for r in drows})),
           tuple(sorted({3, 4} & {r["vec_id"] for r in drows}))}
    # exactly one center per duplicate cluster
    assert all(len(g) == 1 for g in got)
