"""Semantic pins for the graph operators (g_pagerank).

The oracle compare proves Spark==DuckDB on the exact integer recurrence;
these pins prove the recurrence itself behaves like PageRank (an oracle
compare alone cannot catch a bug shared by both sides).
"""

import pytest

from datalake_on_prem_system_spark.operators.graph_ops import (
    _PR_SCALE,
    _PR_TOP_K,
    g_pagerank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_rows(spark):
    return g_pagerank(spark, SF).collect()


def test_pagerank_shape_and_order(pr_rows):
    assert len(pr_rows) == _PR_TOP_K
    picos = [r.rank_pico for r in pr_rows]
    assert picos == sorted(picos, reverse=True)
    assert all(r.rank_pico > 0 for r in pr_rows)


def test_pagerank_hubs_rank_first(pr_rows):
    """TPC-H's graph is bipartite with ~15× more customers than suppliers,
    so suppliers are the high-degree hubs — the top of the ranking must be
    supplier-dominated, and rank must correlate with degree at the top."""
    top10 = pr_rows[:10]
    assert sum(1 for r in top10 if r.node_type == "supplier") >= 8
    # every top-10 node beats the uniform rank 1/N by a wide margin: N is
    # ~hundreds at sf0.001, uniform ~ SCALE/N; hubs concentrate mass
    assert all(r.rank_pico > _PR_SCALE // 1000 for r in top10)


def test_pagerank_mass_conservation(pr_rows):
    """Integer truncation only ever LOSES picounits, so no node can exceed
    total mass and the top node holds a plausible share (< 20%)."""
    assert pr_rows[0].rank_pico < _PR_SCALE // 5


# ------------------------------------------------- triangle_participation
# Oracle compare proves Spark==DuckDB; these pin the algorithm itself on
# graphs with hand-countable triangle structure (a shared-bug oracle
# blind spot), including the hub shape the degree ordering exists for.

from datalake_on_prem_system_spark.operators.graph_ops import (  # noqa: E402
    triangle_participation,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long"
    )


def test_triangles_k4(spark):
    """K4 has C(4,3)=4 triangles; every node sits in exactly 3."""
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    rows = {r.node: r.n_triangles for r in triangle_participation(k4).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_none_in_path_or_star(spark):
    """A path and a star are triangle-free — including the hub star, the
    exact shape the degree orientation bounds: the hub must NOT produce
    phantom closures from its many wedges."""
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    star = _edges(spark, [(0, i) for i in range(1, 9)])
    assert triangle_participation(path).count() == 0
    assert triangle_participation(star).count() == 0


def test_triangles_hub_with_one_closure(spark):
    """Star plus ONE rim edge: exactly one triangle (hub, 1, 2) no matter
    how many open wedges the hub generates."""
    g = _edges(spark, [(0, i) for i in range(1, 9)] + [(1, 2)])
    rows = {r.node: r.n_triangles for r in triangle_participation(g).collect()}
    assert rows == {0: 1, 1: 1, 2: 1}


def test_triangles_two_sharing_an_edge(spark):
    """Diamond (two triangles glued on edge 1-2): shared-edge nodes count
    both, apex nodes one each."""
    g = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    rows = {r.node: r.n_triangles for r in triangle_participation(g).collect()}
    assert rows == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangles_random_graphs_match_bruteforce(spark):
    """Seeded Erdős–Rényi graphs at several densities: the distributed
    degree-ordered count must equal an O(n^3) brute-force reference —
    catches double-counted or dropped closures that the fixture graphs'
    regular structure could mask."""
    import itertools
    import random

    for seed, n, p in [(1, 12, 0.3), (2, 14, 0.5), (3, 10, 0.8)]:
        rng = random.Random(seed)
        pairs = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        adj = set(pairs)
        expect: dict[int, int] = {}
        for a, b, c in itertools.combinations(range(n), 3):
            if (a, b) in adj and (b, c) in adj and (a, c) in adj:
                for v in (a, b, c):
                    expect[v] = expect.get(v, 0) + 1
        got = {
            r.node: r.n_triangles
            for r in triangle_participation(_edges(spark, pairs)).collect()
        }
        assert got == expect, f"seed={seed}"


def test_common_neighbor_pairs_hand_countable(spark):
    """Hand-computed bipartite graph: the hub right-node must be dropped
    BEFORE pairs form, degrees must count over the filtered universe, and
    jaccard must be the exact shared/union ratio."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        common_neighbor_pairs,
    )

    # c1,c2 share parts 10+11; c3 shares 11 with both; part 99 is a hub
    # touching everyone (degree 4 > cap 3) and must contribute NO pairs
    edges = spark.createDataFrame(
        [
            (1, 10), (1, 11), (1, 99),
            (2, 10), (2, 11), (2, 99),
            (3, 11), (3, 12), (3, 99),
            (4, 99),  # hub-only customer: no surviving edges, no pairs
        ],
        "c bigint, p bigint",
    )
    rows = {
        (r.c1, r.c2): (r.n_common, r.jaccard)
        for r in common_neighbor_pairs(edges, hub_cap=3).collect()
    }
    # filtered degrees: c1=2 {10,11}, c2=2 {10,11}, c3=2 {11,12}
    assert rows == {
        (1, 2): (2, 1.0),          # {10,11} vs {10,11}: 2 / (2+2-2)
        (1, 3): (1, 1.0 / 3.0),    # share {11}: 1 / (2+2-1)
        (2, 3): (1, 1.0 / 3.0),
    }, rows


def test_label_propagation_two_cliques(spark):
    """LPA pin: two triangles joined by one bridge edge must resolve into
    two communities labeled by each clique's smallest member (bridge nodes
    keep their side — one neighbor across vs two within)."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u bigint, v bigint",
    )
    labels = {r.node: r.label for r in label_propagation(edges).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == labels[5] == labels[6]
    assert labels[4] != labels[1]


def test_kcore_peel_hand_countable(spark):
    """3-core pin: a 4-clique survives (every member keeps degree 3); a
    pendant chain hanging off it peels away in cascade (removing the tip
    drops its neighbor below k next round) — the case a single-pass degree
    filter gets wrong; and 5 rounds have converged (a 6th changes
    nothing)."""
    from datalake_on_prem_system_spark.operators.graph_ops import kcore_peel

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    chain = [(4, 5), (5, 6), (5, 7), (6, 7)]  # 5-6-7 triangle + bridge 4-5
    edges = spark.createDataFrame(clique + chain, "u bigint, v bigint")
    got = {r.node: r.degree for r in kcore_peel(edges, 3, 5).collect()}
    # triangle 5-6-7: every member has degree 2 within it (<3) once the
    # bridge peels, so the whole tail cascades away; the clique stays
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}, got
    again = {r.node: r.degree for r in kcore_peel(edges, 3, 6).collect()}
    assert again == got  # converged: extra rounds are no-ops


def test_kcore_fixpoint_on_deep_cascade(spark):
    """Convergence depth is data-dependent: a pendant PATH peels exactly
    one node per round (only the current tip is below k), so a 12-node
    tail needs ~12 rounds — any fixed small round count returns a wrong
    (too large) core. The fixpoint loop must fully dissolve the tail and
    keep only the triangle."""
    from datalake_on_prem_system_spark.operators.graph_ops import kcore_peel

    triangle = [(101, 102), (101, 103), (102, 103)]
    # path 103-1-2-...-12: every interior node has degree 2 (== k), the tip
    # has 1, so each round removes only the current tip
    path = [(103, 1)] + [(i, i + 1) for i in range(1, 12)]
    edges = spark.createDataFrame(triangle + path, "u bigint, v bigint")
    got = {r.node: r.degree for r in kcore_peel(edges, 2).collect()}
    assert got == {101: 2, 102: 2, 103: 2}, got


def _write_lineitem_pairs(spark, tmp_path, edges, copies=5):
    """Minimal lineitem fixture inducing a given co-supply edge set: each
    (u, v) edge gets `copies` dedicated orders carrying exactly suppliers
    u and v (no cross-edge co-occurrence). All pair weights tie at
    `copies`, so the density-decile cut lands exactly there and EVERY
    intended edge survives (ties at the cut stay in)."""
    rows = []
    ok = 0
    for u, v in edges:
        for _ in range(copies):
            rows += [(ok, u), (ok, v)]
            ok += 1
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_suppkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A pure star (hub 0, leaves 1..4) is the maximally DISassortative
    graph: every edge pairs degree 4 with degree 1, so r = -1 exactly
    (hand-derived: mu=2.5, num=-2.25, den=2.25)."""
    from datalake_on_prem_system_spark.operators.graph_ops import g_assortativity

    _write_lineitem_pairs(spark, tmp_path, [(0, i) for i in (1, 2, 3, 4)])
    row = g_assortativity(spark, str(tmp_path)).head()
    assert (row.n_nodes, row.n_edges) == (5, 4)
    assert row.mean_edge_degree == 2.5
    assert row.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    """A 5-cycle is degree-regular (every endpoint degree 2): the variance
    term is zero, so r is undefined and must surface as NULL, never a
    divide-by-zero or an Infinity."""
    from datalake_on_prem_system_spark.operators.graph_ops import g_assortativity

    _write_lineitem_pairs(
        spark, tmp_path, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    )
    row = g_assortativity(spark, str(tmp_path)).head()
    assert (row.n_nodes, row.n_edges) == (5, 5)
    assert row.mean_edge_degree == 2.0
    assert row.assortativity is None


def test_clustering_coefficient_known_graphs(spark, tmp_path):
    """Clustering pins: in a 4-clique every node has coefficient 1.0; a
    star hub (all neighbors pairwise unconnected) scores 0.0; a pendant
    (degree-1) node has NO coefficient (NULL) and sorts last."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        g_clustering_coefficient,
    )

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    star = [(10, i) for i in (11, 12, 13)]  # hub 10; leaves are degree-1
    _write_lineitem_pairs(spark, tmp_path, clique + star)
    got = {
        r.s_suppkey: r
        for r in g_clustering_coefficient(spark, str(tmp_path)).collect()
    }
    for n in (1, 2, 3, 4):
        assert got[n].clustering == 1.0
        assert (got[n].degree, got[n].n_triangles) == (3, 3)
    hub = got[10]
    assert (hub.degree, hub.n_triangles, hub.clustering) == (3, 0, 0.0)
    for leaf in (11, 12, 13):
        assert got[leaf].degree == 1 and got[leaf].clustering is None


def test_edge_embeddedness_weak_ties(spark, tmp_path):
    """Embeddedness pins: inside a 4-clique every edge sits in 2 triangles;
    a bridge between two cliques has embeddedness 0 (the weak tie); edges
    adjacent to the bridge keep their in-clique counts."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        g_edge_embeddedness,
    )

    c1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    c2 = [(a, b) for a in (11, 12, 13, 14) for b in (11, 12, 13, 14) if a < b]
    bridge = [(4, 11)]
    _write_lineitem_pairs(spark, tmp_path, c1 + c2 + bridge)
    got = {
        (r.u, r.v): r for r in g_edge_embeddedness(spark, str(tmp_path)).collect()
    }
    assert len(got) == 13
    br = got[(4, 11)]
    assert (br.embeddedness, br.weak_tie) == (0, True)
    for e in c1 + c2:
        r = got[e]
        assert (r.embeddedness, r.weak_tie) == (2, False), e


def test_resource_allocation_hand_computed(spark, tmp_path):
    """RA pin on a 3-customer bipartite toy: part 10 shared by {1,2}
    (deg 2), part 20 by {1,2,3} (deg 3), part 30 by {2,3} (deg 2) —
    RA(1,2) = 1/2 + 1/3, RA(1,3) = 1/3, RA(2,3) = 1/2 + 1/3. Exercises
    the 1/deg weighting and the part-ordered fold."""
    orders = [(o, c) for o, c in [(100, 1), (200, 2), (300, 3)]]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    items = [
        (100, 10), (100, 20),           # cust 1 buys parts 10, 20
        (200, 10), (200, 20), (200, 30),  # cust 2 buys 10, 20, 30
        (300, 20), (300, 30),           # cust 3 buys 20, 30
    ]
    spark.createDataFrame(
        items, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from datalake_on_prem_system_spark.operators.graph_ops import (
        g_resource_allocation,
    )

    rows = {
        (r.custkey_a, r.custkey_b): (r.n_common, r.ra_score)
        for r in g_resource_allocation(spark, str(tmp_path)).collect()
    }
    assert rows[(1, 2)] == (2, round(1 / 2 + 1 / 3, 6))
    assert rows[(1, 3)] == (1, round(1 / 3, 6))
    assert rows[(2, 3)] == (2, round(1 / 2 + 1 / 3, 6))
    assert len(rows) == 3


def test_bfs_hops_hand_computed(spark):
    """BFS pin on a path 1-2-3-4 plus triangle spur (3-5, 4-5) plus an
    unreachable island 8-9: hops from 1 are {1:0, 2:1, 3:2, 4:3, 5:3};
    the island never appears."""
    from datalake_on_prem_system_spark.operators.graph_ops import bfs_from

    und = [(1, 2), (2, 3), (3, 4), (3, 5), (4, 5), (8, 9)]
    sym = spark.createDataFrame(
        und + [(v, u) for u, v in und], "u bigint, v bigint"
    )
    got = {r.node: r.hops for r in bfs_from(spark, sym, 1).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 3}


def test_connected_components_hand_computed(spark):
    """Components pin on two chains and an isolated edge: {1,2,3,4} via a
    path, {8,9}, {20,21,22} via a triangle — labels are the component
    minima regardless of propagation order."""
    from datalake_on_prem_system_spark.operators.graph_ops import components_of

    und = [(1, 2), (2, 3), (3, 4), (8, 9), (20, 21), (21, 22), (20, 22)]
    sym = spark.createDataFrame(
        und + [(v, u) for u, v in und], "u bigint, v bigint"
    )
    got = {r.node: r.lbl for r in components_of(sym).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_cap_exceeded(spark, monkeypatch):
    """A component whose diameter exceeds the round cap must raise — the
    uncapped recursive-CTE oracle would diverge from a silently partial
    labeling (round-11 ADVICE). Pinned with the cap patched tiny so the
    guard path runs in two rounds."""
    import pytest

    from datalake_on_prem_system_spark.operators import graph_ops

    monkeypatch.setattr(graph_ops, "_CC_CAP", 2)
    # a path of 6 nodes: min-label needs 5 rounds to reach the far end
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    sym = spark.createDataFrame(
        und + [(v, u) for u, v in und], "u bigint, v bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph_ops.components_of(sym)


def test_hits_authorities_hand_computed(spark):
    """HITS pin on a hand-traceable bipartite graph: customers {1,2,3},
    suppliers {10,20}; edges (1,10),(2,10),(3,10),(3,20).

    Iteration 1: auth(10)=3S -> S, auth(20)=S -> S//3;
    hubs: h(1)=h(2)=S -> (S*S) div (S + S//3) = 750000000000, h(3)=S+S//3 -> S.
    Iteration 2: auth(10)=2*750000000000 + S = 2.5e12 -> S,
    auth(20)=S -> (S*S) div 2.5e12 = 400000000000."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        _HITS_SCALE,
        hits_authorities,
    )

    tp = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (3, 20)], "c bigint, s bigint"
    )
    got = {
        r.s_suppkey: (r.n_customers, r.auth_pico)
        for r in hits_authorities(tp).collect()
    }
    assert got == {10: (3, _HITS_SCALE), 20: (1, 400_000_000_000)}


def test_boruvka_msf_matches_kruskal(spark):
    """MSF pin: Borůvka's distributed rounds must select the exact edge
    set greedy Kruskal picks under the same strict total order, on a toy
    graph with a cycle, a tie-prone square, and an isolated edge."""
    from datalake_on_prem_system_spark.operators.graph_ops import boruvka_msf

    edges = [
        # triangle 1-2-3 with a weak 1-3 edge (must be cut)
        (1, 2, 9), (2, 3, 8), (1, 3, 1),
        # square 4-5-6-7 with equal weights (tie-break on (u, v))
        (4, 5, 5), (5, 6, 5), (6, 7, 5), (4, 7, 5),
        # isolated strong edge
        (10, 11, 7),
    ]

    def wk(u, v, w):
        return w * 1_000_000_000_000 + u * 1_000_000 + v

    ew = spark.createDataFrame(
        [(u, v, w, wk(u, v, w)) for u, v, w in edges],
        "u bigint, v bigint, w bigint, wk bigint",
    )
    got = {
        (r.u, r.v) for r in boruvka_msf(spark, ew).select("u", "v").collect()
    }

    # force the fully DISTRIBUTED contraction rounds too (the default
    # threshold sends a toy graph straight to the local Kruskal finish)
    from datalake_on_prem_system_spark.operators import graph_ops as G

    old = G._MSF_LOCAL_EDGES
    G._MSF_LOCAL_EDGES = 0
    try:
        got_dist = {
            (r.u, r.v)
            for r in boruvka_msf(spark, ew).select("u", "v").collect()
        }
    finally:
        G._MSF_LOCAL_EDGES = old
    assert got_dist == got

    # greedy Kruskal under the same total order (strongest wk first)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    expected = set()
    for u, v, w in sorted(edges, key=lambda e: -wk(*e)):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            expected.add((u, v))
    assert got == expected
    assert (1, 3) not in got  # the weak triangle edge was cut


def test_double_sweep_on_path_graph(spark):
    """Double-sweep pin on a path 1-2-3-4-5 with a hub spur (3-6, 3-7):
    the max-degree source is 3, whose farthest nodes are the hop-2 set
    {1, 5}; the lowest-id tie rule picks 1. The second sweep from 1
    reaches 5 at 4 hops — the true tree diameter (the double sweep is
    exact on trees)."""
    from datalake_on_prem_system_spark.operators.graph_ops import bfs_from

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6), (3, 7)]
    sym = spark.createDataFrame(
        und + [(v, u) for u, v in und], "u bigint, v bigint"
    )
    d1 = {r.node: r.hops for r in bfs_from(spark, sym, 3).collect()}
    far = min(n for n, h in d1.items() if h == max(d1.values()))
    assert far == 1 and d1[1] == 2
    d2 = {r.node: r.hops for r in bfs_from(spark, sym, far).collect()}
    assert max(d2.values()) == 4  # true diameter of the tree


def test_rich_club_hand_computed(spark):
    """Rich-club pin on K4 + pendant: degrees {1,2,3: 3, 4: 4, 5: 1};
    grid k ∈ {1, 3, 4}. k=1: 4 rich nodes, all 6 K4 edges (min-deg 3) →
    RC = 2·6/(4·3) = 1.0; k=3 leaves a single node and k=4 none — both
    below the N_k ≥ 2 report floor."""
    from datalake_on_prem_system_spark.operators.graph_ops import rich_club_curve

    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(und, "u bigint, v bigint")
    rows = rich_club_curve(edges).collect()
    assert [(r.k, r.n_rich_nodes, r.n_rich_edges, r.rc) for r in rows] == [
        (1, 4, 6, 1.0)
    ]


def test_square_census_hand_computed(spark):
    """4-cycle pins: C4 has exactly 1 square (only the two diagonal pairs
    share 2 common neighbors); K4 has 3 (all 6 pairs share the other two
    vertices: 6·C(2,2)/2); a path has none."""
    from datalake_on_prem_system_spark.operators.graph_ops import square_census

    def census(pairs):
        edges = spark.createDataFrame(pairs, "u bigint, v bigint")
        return square_census(edges).collect()[0]

    c4 = census([(1, 2), (2, 3), (3, 4), (1, 4)])
    assert (c4.n_pairs_multi, c4.n_squares) == (2, 1)
    k4 = census([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert (k4.n_pairs, k4.n_pairs_multi, k4.n_squares) == (6, 6, 3)
    path = census([(1, 2), (2, 3), (3, 4)])
    assert path.n_squares == 0


def test_ktruss_hand_computed(spark):
    """4-truss pins: K4 survives whole (every edge in exactly 2 triangles
    of the subgraph); a pendant chain peels in round 1. The diamond (two
    triangles glued on edge 1-2) pins the CASCADE a one-pass embeddedness
    filter gets wrong: round 1 keeps only the shared edge (support 2),
    round 2 peels it too (its triangles' other edges are gone) — the
    4-truss is EMPTY."""
    from datalake_on_prem_system_spark.operators.graph_ops import ktruss_edges

    k4_plus_tail = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "u bigint, v bigint",
    )
    got = {
        (r.u, r.v): r.support for r in ktruss_edges(k4_plus_tail, 4, 8).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2}

    diamond = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "u bigint, v bigint"
    )
    assert ktruss_edges(diamond, 4, 8).count() == 0


def test_degree_powerlaw_hand_computed(spark):
    """Power-law fit pin on the star K1,4: histogram {deg 1: 4 nodes,
    deg 4: 1 node} gives log-log points (0, ln4) and (ln4, 0) — a line
    of slope exactly −1, so alpha = 1.0; n_nodes 5, n_edges 4,
    max_degree 4."""
    from datalake_on_prem_system_spark.operators.graph_ops import degree_powerlaw

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "u bigint, v bigint"
    )
    row = degree_powerlaw(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.max_degree) == (5, 4, 4)
    assert row.alpha == 1.0


def test_modularity_hand_computed(spark):
    """Modularity pin on two disjoint triangles: 3-round deterministic
    LPA converges to the perfect 2-community partition (labels 1 and 4);
    m=6, per community e_c=3 and d_c=6, so
    Q = 2·(3/6 − (6/12)²) = 0.5 exactly."""
    from datalake_on_prem_system_spark.operators.graph_ops import modularity_score

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)], "u bigint, v bigint"
    )
    row = modularity_score(edges).collect()[0]
    assert (row.n_communities, row.n_edges, row.intra_edges) == (2, 6, 6)
    assert row.modularity == 0.5


def test_conductance_hand_computed(spark):
    """Conductance pin on two triangles joined by one bridge (3-4):
    3-round LPA lands on communities {1,2,3} (label 1) and {4,5,6}
    (label 3); m=7, each side has e_in=3, cut=1, vol=7, so
    φ = 1/min(7, 14-7) = 1/7 on both sides."""
    from datalake_on_prem_system_spark.operators.graph_ops import (
        conductance_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "u bigint, v bigint",
    )
    rows = conductance_scores(edges).collect()
    assert [
        (r.community, r.n_members, r.volume, r.cut_edges, r.conductance)
        for r in rows
    ] == [
        (1, 3, 7, 1, round(1 / 7, 6)),
        (3, 3, 7, 1, round(1 / 7, 6)),
    ]
