"""Connected-components operator: planted clusters, singleton
handling, transitivity across chains, and the non-convergence guard.
See also the oracle-gated `dedup_connected_components` query, which
runs the same operator over real LSH near-dup pairs."""

from __future__ import annotations

import pytest

from web_analytics_visits_re_processing_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a long, id_b long")


def test_chain_singleton_and_second_cluster(spark):
    """A~B, B~C clusters A,B,C together without an A~C edge; an
    isolated node is its own component; a disjoint pair stays
    separate."""
    nodes = _nodes(spark, [1, 2, 3, 5, 6, 7])
    edges = _edges(spark, [(1, 2), (2, 3), (6, 7)])
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 6, 7: 6}


def test_long_chain_converges_and_is_canonical_flags(spark):
    """A 12-node chain (diameter 11) converges under the default
    iteration cap; exactly one canonical doc per component."""
    ids = list(range(100, 112))
    nodes = _nodes(spark, ids + [500])
    edges = _edges(spark, list(zip(ids, ids[1:])))
    rows = dedup_components(nodes, _edges(spark, list(zip(ids, ids[1:])))).collect()
    comp = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in rows}
    assert all(comp[i] == (100, i == 100) for i in ids)
    assert comp[500] == (500, True)
    # exactly one canonical per component
    assert sum(1 for c, canon in comp.values() if canon) == 2


def test_edge_direction_irrelevant(spark):
    """Min label propagates against edge direction too (symmetrized)."""
    nodes = _nodes(spark, [1, 9])
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, _edges(spark, [(9, 1)])).collect()
    }
    assert got == {1: 1, 9: 1}


def test_deep_chain_escalates_to_star_and_is_correct(spark):
    """A chain longer than max_iterations escalates to the large-star/
    small-star finish and still returns the exact components (never a
    partial answer)."""
    ids = list(range(10))
    nodes = _nodes(spark, ids + [99])
    edges = _edges(spark, list(zip(ids, ids[1:])))
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges, max_iterations=3).collect()
    }
    assert got == {i: 0 for i in ids} | {99: 99}


def test_star_components_long_chain_and_random_graph(spark):
    """star_components alone: a 120-node chain (diameter 119, far past
    the simple-propagation default) and a deterministic random graph
    both match a pure-Python union-find."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        star_components,
    )

    def uf_components(n_nodes, pairs):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-id per component
        roots = {}
        for i in range(n_nodes):
            r = find(i)
            roots.setdefault(r, i)
        return {i: roots[find(i)] for i in range(n_nodes)}

    chain = list(zip(range(120), range(1, 120)))
    got = {
        r["node"]: r["component"]
        for r in star_components(_edges(spark, chain)).collect()
    }
    assert got == {i: 0 for i in range(120)}

    # LCG-derived pseudo-random graph, fixed seed → deterministic.
    x, pairs = 1234567, []
    for _ in range(150):
        x = (48271 * x) % 2147483647
        a = x % 80
        x = (48271 * x) % 2147483647
        b = x % 80
        if a != b:
            pairs.append((a, b))
    expect = uf_components(80, pairs)
    touched = {a for a, _ in pairs} | {b for _, b in pairs}
    got = {
        r["node"]: r["component"]
        for r in star_components(_edges(spark, pairs)).collect()
    }
    assert got == {i: c for i, c in expect.items() if i in touched}


def test_pagerank_matches_pure_python_simulation(spark):
    """The integer-exact rank update is simple enough to simulate in
    plain Python — the distributed loop must agree exactly, edge for
    edge, iteration for iteration."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        pagerank_scaled,
    )

    edges = [
        (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1), (4, 1, 5), (2, 4, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_e6"]
        for r in pagerank_scaled(df, n_iter=3).collect()
    }

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        nxt = {n: 150_000 for n in nodes}
        for s, d, w in edges:
            nxt[d] += (r[s] * 85 * w) // (100 * wout[s])
        r = nxt
    assert got == r


def test_pagerank_sink_heavy_node_ranks_highest(spark):
    """A node every other node points at must out-rank the spokes."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        pagerank_scaled,
    )

    df = spark.createDataFrame(
        [(i, 99, 1) for i in range(1, 6)] + [(99, 1, 1)],
        "src long, dst long, w long",
    )
    ranks = {
        r["node"]: r["rank_e6"]
        for r in pagerank_scaled(df, n_iter=3).collect()
    }
    assert ranks[99] == max(ranks.values())


def test_triangle_counts_planted(spark):
    """K4 on {1,2,3,4} -> 4 triangles, every member in exactly 3; a
    star hub (10-{20,21,22,23}) and a path (30-31-32) are
    triangle-free and must not appear; duplicate/reversed/self edges
    are canonicalized away before counting."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    star = [(10, x) for x in (20, 21, 22, 23)]
    path = [(30, 31), (31, 32)]
    noisy = k4 + star + path + [(2, 1), (3, 3), (1, 2)]  # rev + self + dup
    edges = spark.createDataFrame(noisy, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_identity_stitching_chains_and_guard(spark):
    """Planted identity graph: users 1-2 share a cookie, 2-3 share an
    email -> all three stitch to canonical visitor 1 (transitive
    chain); user 10 has a lonely identifier -> singleton; identifier
    'bot' shared by 6 users with max_share=5 is dropped, so those
    users stay singletons instead of welding into a mega-visitor."""
    from web_analytics_visits_re_processing_spark.operators.identity import (
        stitch_identities,
    )

    links = [(1, "ck_a"), (2, "ck_a"), (2, "em_x"), (3, "em_x"), (10, "ck_z")]
    links += [(100 + i, "bot") for i in range(6)]
    id_map = spark.createDataFrame(links, "user_id long, ident string")
    got = {
        r["user_id"]: (r["canonical_visitor"], r["n_devices"])
        for r in stitch_identities(id_map, max_share=5).collect()
    }
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[10] == (10, 1)
    for i in range(6):
        assert got[100 + i] == (100 + i, 1)


def test_k_core_peels_pendants_and_keeps_k4(spark):
    from web_analytics_visits_re_processing_spark.operators.graph import k_core

    # K4 on {1,2,3,4} (all in-core degree 3), a pendant chain 4-10-11,
    # and a separate triangle {20,21,22} (degree 2, peeled at k=3).
    # Removing 11 demotes 10, which then peels too -> multi-round.
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = k4 + [(4, 10), (10, 11), (20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=2: the triangle survives as its own 2-core; chain still peels.
    got2 = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert set(got2) == {1, 2, 3, 4, 20, 21, 22}
    assert got2[20] == got2[21] == got2[22] == 2
    assert got2[4] == 3  # edge to the peeled pendant does not count


def test_k_core_empty_when_over_k(spark):
    from web_analytics_visits_re_processing_spark.operators.graph import k_core

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert k_core(tri, k=3).count() == 0


def test_bfs_hops_layers_and_truncation(spark):
    from web_analytics_visits_re_processing_spark.operators.graph import bfs_hops

    # Path 1-2-...-9 plus an unreachable pair {50,51}: from 1, node d
    # is at distance d-1; truncation at 6 hops excludes 8 and 9's
    # distances beyond 6 -> nodes 8,9 at dist 7,8 are absent.
    edges = [(i, i + 1) for i in range(1, 9)] + [(50, 51)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["dist"] for r in bfs_hops(df, source=1, max_hops=6).collect()}
    assert got == {i: i - 1 for i in range(1, 8)}
    assert 50 not in got and 51 not in got


def test_bfs_hops_min_over_branches(spark):
    from web_analytics_visits_re_processing_spark.operators.graph import bfs_hops

    # Diamond: 1-2-4 and 1-3-4 plus a long way 1-5-6-4: dist(4) = 2.
    edges = [(1, 2), (2, 4), (1, 3), (3, 4), (1, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["dist"] for r in bfs_hops(df, source=1, max_hops=6).collect()}
    assert got[4] == 2 and got[6] == 2 and got[5] == 1
