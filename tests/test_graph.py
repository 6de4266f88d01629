"""Graph-analytics operators: BFS, PageRank, triangles, co-occurrence.

Oracles are independent pure-Python implementations (BFS via dict
adjacency, PageRank via dense iteration, triangles via brute-force
combinations) on small hand-built graphs — same strategy as
test_span_parity / test_components.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], schema=["src", "dst"]
    )


# a small fixed graph: two triangles sharing an edge, plus a tail
#   1-2, 1-3, 2-3   (triangle)
#   2-4, 3-4        (second triangle on edge 2-3)
#   4-5, 5-6        (tail)
EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _bfs(pairs, seeds, k):
    adj = _adj(pairs)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, k + 1):
        frontier = {
            n for f in frontier for n in adj.get(f, ()) if n not in dist
        }
        for n in frontier:
            dist[n] = d
    return dist


def _pagerank(pairs, iters, damping):
    adj = _adj(pairs)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            m = sum(pr[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - damping) / n + damping * m
        pr = nxt
    return pr


def _triangles(pairs):
    adj = _adj(pairs)
    return sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_degrees(spark):
    got = {
        r["node"]: r["degree"]
        for r in G.degrees(_edges_df(spark, EDGES)).collect()
    }
    assert got == {v: len(ns) for v, ns in _adj(EDGES).items()}


@pytest.mark.parametrize("seeds,k", [([1], 2), ([1], 5), ([6], 3), ([1, 6], 1)])
def test_khop_matches_python_bfs(spark, seeds, k):
    sym = G.symmetrize(_edges_df(spark, EDGES))
    got = {r["node"]: r["dist"] for r in G.khop(sym, seeds, k).collect()}
    assert got == _bfs(EDGES, seeds, k)


def test_pagerank_cycle_is_uniform(spark):
    # on a 3-cycle every node is symmetric: rank is exactly 1/3 at any
    # damping and iteration count
    cyc = [(1, 2), (2, 3), (1, 3)]
    sym = G.symmetrize(_edges_df(spark, cyc))
    for r in G.pagerank(sym, iters=4, damping=0.85).collect():
        assert r["pr"] == pytest.approx(1.0 / 3, abs=1e-12)


def test_pagerank_matches_python_reference(spark):
    sym = G.symmetrize(_edges_df(spark, EDGES))
    got = {r["node"]: r["pr"] for r in G.pagerank(sym, iters=3).collect()}
    want = _pagerank(EDGES, iters=3, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # rank mass is conserved (no dangling nodes by construction)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


def test_triangle_count_known_graphs(spark):
    assert (
        G.triangle_count(_edges_df(spark, EDGES)).collect()[0]["n_triangles"]
        == 2
    )
    k4 = list(itertools.combinations(range(4), 2))
    assert (
        G.triangle_count(_edges_df(spark, k4)).collect()[0]["n_triangles"] == 4
    )
    path = [(1, 2), (2, 3), (3, 4)]
    assert (
        G.triangle_count(_edges_df(spark, path)).collect()[0]["n_triangles"]
        == 0
    )


def test_triangle_count_random_graph_vs_bruteforce(spark):
    # deterministic pseudo-random graph: hub-skewed so the degree
    # orientation actually reorients edges
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for i in range(200)
            for a, b in [((i * i) % 23, (i * 7 + 3) % 23)]
            if a != b
        }
    )
    got = G.triangle_count(_edges_df(spark, pairs)).collect()[0]["n_triangles"]
    assert got == _triangles(pairs)


def test_orient_by_degree_is_permutation_and_bounded(spark):
    df = _edges_df(spark, EDGES)
    o = G.orient_by_degree(df).collect()
    assert sorted(tuple(sorted((r["src"], r["dst"]))) for r in o) == sorted(
        EDGES
    )
    # out-degree under the orientation never exceeds the raw degree of
    # the SMALLER-ordered endpoint; on this graph max oriented
    # out-degree must be <= 2 (node 2 and 3 tie at degree 3)
    from collections import Counter

    out = Counter(r["src"] for r in o)
    assert max(out.values()) <= 2


def test_cooccurrence_edges_and_cap(spark):
    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),          # triangle
        ("g2", 3), ("g2", 4),
        ("g3", 5), ("g3", 5),                      # dup node, no self-edge
        ("hub", 1), ("hub", 2), ("hub", 3), ("hub", 4), ("hub", 5),
    ]
    df = spark.createDataFrame(rows, schema=["doc", "ent"])
    full = {
        (r["src"], r["dst"])
        for r in G.cooccurrence_edges(df, "doc", "ent").collect()
    }
    want_hub = {(a, b) for a, b in itertools.combinations(range(1, 6), 2)}
    assert full == {(1, 2), (1, 3), (2, 3), (3, 4)} | want_hub
    capped = {
        (r["src"], r["dst"])
        for r in G.cooccurrence_edges(df, "doc", "ent", max_group=3).collect()
    }
    assert capped == {(1, 2), (1, 3), (2, 3), (3, 4)}
    dropped = G.cooccurrence_dropped_groups(df, "doc", "ent", 3).collect()
    assert [(r["g"], r["n_nodes"]) for r in dropped] == [("hub", 5)]


def test_khop_broadcasts_frontier_not_edges(spark):
    # plan pin: the BFS hop joins broadcast the frontier side, so the
    # edge relation never shuffles — every hash exchange in the plan
    # partitions the narrow frontier 'node' column (the per-hop
    # distinct), never the edge src/dst columns
    import re

    sym = G.symmetrize(_edges_df(spark, EDGES))
    plan = G.khop(sym, [1], 2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert exchanges and set(exchanges) == {"node"}


def test_cooccurrence_pmi_vs_python(spark):
    import math
    from collections import Counter

    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),
        ("g2", 1), ("g2", 2),
        ("g3", 2), ("g3", 3),
        ("g4", 4), ("g4", 1), ("g4", 1),   # dup membership collapses
        ("g5", 5),                          # singleton group: no pairs
    ]
    df = spark.createDataFrame(rows, schema=["doc", "ent"])
    got = {
        (r["src"], r["dst"]): (r["n_pairs"], r["pmi"])
        for r in G.cooccurrence_pmi(df, "doc", "ent").collect()
    }
    groups = {}
    for g, n in rows:
        groups.setdefault(g, set()).add(n)
    N = len(groups)
    marg = Counter(n for ns in groups.values() for n in ns)
    pair = Counter(
        (a, b)
        for ns in groups.values()
        for a in ns
        for b in ns
        if a < b
    )
    assert set(got) == set(pair)
    for (a, b), c in pair.items():
        n_pairs, pmi = got[(a, b)]
        assert n_pairs == c
        want = math.log((c * N) / (marg[a] * marg[b]))
        assert pmi == pytest.approx(round(want, 6), abs=1e-9), (a, b)
    # the hub entity 1 (in 3 of 5 groups) gets a LOWER pmi with 2 than
    # the tighter 2-3 pair despite equal co-counts
    assert got[(2, 3)][1] > got[(1, 2)][1]


def test_cooccurrence_pmi_min_pairs(spark):
    rows = [("g1", 1), ("g1", 2), ("g2", 1), ("g2", 2), ("g3", 2), ("g3", 3)]
    df = spark.createDataFrame(rows, schema=["doc", "ent"])
    got = G.cooccurrence_pmi(df, "doc", "ent", min_pairs=2).collect()
    assert [(r["src"], r["dst"], r["n_pairs"]) for r in got] == [(1, 2, 2)]


def _lpa_python(pairs, iters):
    adj = _adj(pairs)
    lbl = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lbl = nxt
    return lbl


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_label_propagation_matches_python(spark, iters):
    # two dense blobs joined by one bridge edge: LPA should find them
    blob1 = list(itertools.combinations([1, 2, 3, 4], 2))
    blob2 = list(itertools.combinations([10, 11, 12, 13], 2))
    pairs = blob1 + blob2 + [(4, 10)]
    sym = G.symmetrize(_edges_df(spark, pairs))
    got = {
        r["node"]: r["lbl"]
        for r in G.label_propagation(sym, iters=iters).collect()
    }
    assert got == _lpa_python(pairs, iters)


def test_label_propagation_finds_communities(spark):
    blob1 = list(itertools.combinations([1, 2, 3, 4, 5], 2))
    blob2 = list(itertools.combinations([10, 11, 12, 13, 14], 2))
    pairs = blob1 + blob2 + [(5, 10)]
    sym = G.symmetrize(_edges_df(spark, pairs))
    got = {
        r["node"]: r["lbl"]
        for r in G.label_propagation(sym, iters=3).collect()
    }
    assert set(got[v] for v in (1, 2, 3, 4)) == {1}
    assert set(got[v] for v in (11, 12, 13, 14)) == {10}


def _py_adamic_adar(pairs, max_neighbors=None, min_cn=1):
    import math

    adj = _adj(pairs)
    existing = {tuple(sorted(p)) for p in pairs}
    centers = {
        z for z, ns in adj.items()
        if max_neighbors is None or len(ns) <= max_neighbors
    }
    out = {}
    for z in centers:
        ns = sorted(adj[z])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                k = (ns[i], ns[j])
                cn, aa = out.get(k, (0, 0.0))
                out[k] = (cn + 1, aa + 1.0 / math.log(len(adj[z])))
    return {
        k: v for k, v in out.items()
        if k not in existing and v[0] >= min_cn
    }


def test_adamic_adar_matches_python(spark):
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
        for r in G.adamic_adar(_edges_df(spark, EDGES), min_cn=1).collect()
    }
    want = _py_adamic_adar(EDGES, min_cn=1)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    # sanity: no predicted pair is an existing edge
    assert not set(got) & {tuple(sorted(e)) for e in EDGES}


def test_adamic_adar_min_cn_filters(spark):
    got = {
        (r["src"], r["dst"])
        for r in G.adamic_adar(_edges_df(spark, EDGES), min_cn=2).collect()
    }
    assert got == set(_py_adamic_adar(EDGES, min_cn=2))


def test_adamic_adar_hub_cap_and_report(spark):
    # star: hub 0 connected to 1..5, plus 1-2; capping at 4 removes the
    # hub as a shared neighbor (degree 5 > 4)
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    capped = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
        for r in G.adamic_adar(
            _edges_df(spark, star), max_neighbors=4, min_cn=1
        ).collect()
    }
    want = _py_adamic_adar(star, max_neighbors=4, min_cn=1)
    assert capped == {
        k: (cn, pytest.approx(aa, rel=1e-12)) for k, (cn, aa) in want.items()
    }
    dropped = {
        (r["node"], r["degree"])
        for r in G.adamic_adar_dropped_hubs(_edges_df(spark, star), 4).collect()
    }
    assert dropped == {(0, 5)}


def test_adamic_adar_plan_stays_jvm(spark):
    plan = (
        G.adamic_adar(_edges_df(spark, EDGES))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# neighborhood-Jaccard link prediction
# ---------------------------------------------------------------------------
def _py_jaccard(pairs, max_neighbors=None, min_cn=2):
    adj = _adj(pairs)
    edgeset = {tuple(sorted(p)) for p in pairs}
    cn = {}
    for z, nb in adj.items():
        if max_neighbors is not None and len(nb) > max_neighbors:
            continue
        for u, v in itertools.combinations(sorted(nb), 2):
            cn[(u, v)] = cn.get((u, v), 0) + 1
    return {
        (u, v): (c, c / (len(adj[u]) + len(adj[v]) - c))
        for (u, v), c in cn.items()
        if (u, v) not in edgeset and c >= min_cn
    }


def test_jaccard_link_matches_bruteforce(spark):
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["jaccard"])
        for r in G.jaccard_link(_edges_df(spark, EDGES), min_cn=1).collect()
    }
    want = _py_jaccard(EDGES, min_cn=1)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    assert not set(got) & {tuple(sorted(e)) for e in EDGES}
    # jaccard is a ratio in (0, 1]
    assert all(0 < j <= 1 for _, j in got.values())


def test_jaccard_link_hub_cap_true_degrees(spark):
    # star: hub 0 connected to 1..5, plus 1-2; capping at 4 removes the
    # hub as a wedge CENTER, but surviving pairs still divide by TRUE
    # degrees (the cap bounds enumeration, not the statistic)
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["jaccard"])
        for r in G.jaccard_link(
            _edges_df(spark, star), max_neighbors=4, min_cn=1
        ).collect()
    }
    want = _py_jaccard(star, max_neighbors=4, min_cn=1)
    assert set(got) == set(want)
    for k, (c, j) in want.items():
        assert got[k] == (c, pytest.approx(j, rel=1e-12))


# ---------------------------------------------------------------------------
# bounded single-source shortest paths
# ---------------------------------------------------------------------------
# directed weighted graph where the cheap path is LONGER than the direct
# edge, so bounded rounds genuinely change the answer:
#   1->2 (1), 2->3 (1), 3->4 (1), 1->4 (10), 4->5 (2), 2->5 (100)
WEDGES = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 10), (4, 5, 2), (2, 5, 100)]


def _py_bellman_ford(pairs_w, source, rounds):
    dist = {source: 0}
    for _ in range(rounds):
        nd = dict(dist)
        for a, b, w in pairs_w:
            if a in dist:
                c = dist[a] + w
                if b not in nd or c < nd[b]:
                    nd[b] = c
        dist = nd
    return dist


def _wedges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        schema=["src", "dst", "w"],
    )


@pytest.mark.parametrize("rounds", [1, 2, 4])
def test_sssp_bounded_rounds_match_bellman_ford(spark, rounds):
    got = {
        r["node"]: r["dist"]
        for r in G.sssp(_wedges_df(spark, WEDGES), source=1, rounds=rounds).collect()
    }
    assert got == _py_bellman_ford(WEDGES, 1, rounds)


def test_sssp_converged_is_true_shortest_paths(spark):
    # rounds >= shortest-path tree depth (4) -> exact SSSP; one extra
    # round changes nothing (the convergence check callers use)
    r4 = {
        r["node"]: r["dist"]
        for r in G.sssp(_wedges_df(spark, WEDGES), source=1, rounds=4).collect()
    }
    r5 = {
        r["node"]: r["dist"]
        for r in G.sssp(_wedges_df(spark, WEDGES), source=1, rounds=5).collect()
    }
    assert r4 == r5 == {1: 0, 2: 1, 3: 2, 4: 3, 5: 5}


# ---------------------------------------------------------------------------
# bounded transitive closure
# ---------------------------------------------------------------------------
def _py_closure(pairs, max_depth):
    adj = {}
    for a, b in set(pairs):
        adj.setdefault(a, set()).add(b)
    reach = {(a, b): 1 for a, b in set(pairs)}
    for _ in range(max_depth):
        new = dict(reach)
        for (a, b), d1 in list(reach.items()):
            for c in adj.get(b, ()):
                d = d1 + 1
                if d <= max_depth and ((a, c) not in new or d < new[(a, c)]):
                    new[(a, c)] = d
        reach = new
    return reach


def test_transitive_closure_min_depth_multipath(spark):
    # 1->4 both directly (depth 1) and via 3 (depth 2): min wins
    dag = [(1, 3), (2, 3), (3, 4), (1, 4), (4, 5)]
    got = {
        (r["node"], r["ancestor"]): r["depth"]
        for r in G.transitive_closure(_edges_df(spark, dag), max_depth=3).collect()
    }
    assert got == _py_closure(dag, 3)
    assert got[(1, 4)] == 1
    assert got[(1, 5)] == 2


def test_transitive_closure_depth_bound(spark):
    chain = [(i, i + 1) for i in range(1, 7)]  # path 1..7
    got = {
        (r["node"], r["ancestor"]): r["depth"]
        for r in G.transitive_closure(_edges_df(spark, chain), max_depth=2).collect()
    }
    assert got == _py_closure(chain, 2)
    assert max(got.values()) == 2


def test_transitive_closure_cycle_bounded(spark):
    cyc = [(1, 2), (2, 3), (3, 1)]
    got = {
        (r["node"], r["ancestor"]): r["depth"]
        for r in G.transitive_closure(_edges_df(spark, cyc), max_depth=4).collect()
    }
    assert got == _py_closure(cyc, 4)
    # the cycle closes: every node reaches itself in exactly 3 hops
    assert got[(1, 1)] == got[(2, 2)] == got[(3, 3)] == 3


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------
def _py_ppr(pairs, seeds, iters, damping):
    adj = _adj(pairs)
    k = len(seeds)
    pr = {v: (1.0 / k if v in seeds else 0.0) for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            m = sum(pr[u] / len(adj[u]) for u in adj[v])
            tele = (1.0 - damping) / k if v in seeds else 0.0
            nxt[v] = tele + damping * m
        pr = nxt
    return pr


def test_personalized_pagerank_matches_bruteforce(spark):
    got = {
        r["node"]: r["pr"]
        for r in G.personalized_pagerank(
            G.symmetrize(_edges_df(spark, EDGES)), seeds=[1], iters=3
        ).collect()
    }
    want = _py_ppr(EDGES, {1}, 3, 0.85)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # rank concentrates near the seed: the seed's neighbors outrank the
    # far tail
    assert got[2] > got[6] and got[3] > got[6]
    # mass is conserved up to the walk's leak (no dangling nodes here)
    assert sum(got.values()) == pytest.approx(sum(want.values()), abs=1e-12)


def test_personalized_pagerank_multiseed(spark):
    got = {
        r["node"]: r["pr"]
        for r in G.personalized_pagerank(
            G.symmetrize(_edges_df(spark, EDGES)), seeds=[1, 6], iters=2
        ).collect()
    }
    want = _py_ppr(EDGES, {1, 6}, 2, 0.85)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


# ---------------------------------------------------------------------------
# deterministic random walks
# ---------------------------------------------------------------------------
def _py_walks(pairs, walk_len, walks_per_node, seed):
    import hashlib

    adj = {u: sorted(vs) for u, vs in _adj(pairs).items()}

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = set()
    for start in adj:
        for w in range(walks_per_node):
            node = start
            rows.add((start, w, 0, node))
            for t in range(1, walk_len + 1):
                nb = adj[node]
                node = nb[h64(f"{seed}|{start}|{w}|{t}") % len(nb)]
                rows.add((start, w, t, node))
    return rows


def test_random_walks_match_md5_replay(spark):
    got = {
        (r["start"], r["walk_no"], r["step"], r["node"])
        for r in G.random_walks(
            G.symmetrize(_edges_df(spark, EDGES)),
            walk_len=3, walks_per_node=2, seed="s1",
        ).collect()
    }
    assert got == _py_walks(EDGES, 3, 2, "s1")


def test_random_walks_are_paths_and_deterministic(spark):
    sym = G.symmetrize(_edges_df(spark, EDGES))
    a = G.random_walks(sym, walk_len=4, walks_per_node=1).collect()
    # every consecutive (step, step+1) pair is a real edge
    edgeset = {(u, v) for u, v in EDGES} | {(v, u) for u, v in EDGES}
    byw = {}
    for r in a:
        byw.setdefault((r["start"], r["walk_no"]), {})[r["step"]] = r["node"]
    for path in byw.values():
        assert sorted(path) == list(range(5))
        for t in range(4):
            assert (path[t], path[t + 1]) in edgeset
    # repartition-invariant
    b = G.random_walks(
        G.symmetrize(_edges_df(spark, EDGES)).repartition(5),
        walk_len=4, walks_per_node=1,
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------
def _py_kcore(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs}
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_matches_peeling_oracle(spark):
    # EDGES: two triangles sharing an edge + a tail; the 2-core is the
    # 4-clique-ish block {1,2,3,4}, and the tail peels off in 2 rounds
    for rounds in (1, 2, 4):
        got = {
            r["node"]: r["degree"]
            for r in G.kcore(_edges_df(spark, EDGES), k=2, rounds=rounds).collect()
        }
        assert got == _py_kcore(EDGES, 2, rounds), rounds


def test_kcore_converged_is_true_core(spark):
    got4 = {
        r["node"]: r["degree"]
        for r in G.kcore(_edges_df(spark, EDGES), k=2, rounds=4).collect()
    }
    got5 = {
        r["node"]: r["degree"]
        for r in G.kcore(_edges_df(spark, EDGES), k=2, rounds=5).collect()
    }
    assert got4 == got5 == {1: 2, 2: 3, 3: 3, 4: 2}
    # a 3-core demands the dense middle only; the whole graph dissolves
    assert G.kcore(_edges_df(spark, EDGES), k=3, rounds=5).count() == 0


# ---------------------------------------------------------------------------
# strongly connected components (FW-BW coloring with trim + peeling)
# ---------------------------------------------------------------------------
def _tarjan_scc(edges):
    """Independent reference: iterative Tarjan."""
    adj = {}
    nodes = set()
    for a, b in edges:
        if a != b:
            adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index, low, onstack = {}, {}, set()
    stack, comps = [], []
    counter = [0]

    def strong(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                c = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    c.append(w)
                    if w == v:
                        break
                comps.append(c)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    # drop nodes that only appear in self-loops? keep semantics: the
    # operator's universe is non-self-loop edge endpoints
    uni = {x for a, b in edges if a != b for x in (a, b)}
    return sorted((v, min(c)) for c in comps for v in c if v in uni)


def test_scc_hand_graph(spark):
    from pg_iui_ner_api_spark.operators.graph import strongly_connected_components

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4), (3, 6), (7, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # {1,2,3} cycle, {4,5} cycle, 6 singleton; 7 only self-loops
    # (excluded) — identical rows from BOTH core solvers: the driver
    # Tarjan escape (default) and the forced distributed FW-BW loop
    want = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]
    for force in (200_000, 0):
        got = sorted(
            tuple(r)
            for r in strongly_connected_components(
                df, small_core_edges=force
            ).collect()
        )
        assert got == want, f"small_core_edges={force}"


def test_scc_matches_tarjan_on_random_graphs(spark):
    import random

    from pg_iui_ner_api_spark.operators.graph import strongly_connected_components

    for seed, n, m in ((7, 60, 90), (13, 40, 44), (99, 30, 70)):
        random.seed(seed)
        edges = sorted({(random.randrange(n), random.randrange(n)) for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        # small_core_edges=0 forces the distributed FW-BW loop — the
        # oversized-core path must keep matching the Tarjan reference
        got = sorted(
            tuple(r)
            for r in strongly_connected_components(
                spark.createDataFrame(edges, "src long, dst long"),
                max_peel_rounds=32,
                small_core_edges=0,
            ).collect()
        )
        assert got == _tarjan_scc(edges), f"seed={seed}"


def test_scc_dag_is_all_singletons(spark):
    from pg_iui_ner_api_spark.operators.graph import strongly_connected_components

    dag = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = sorted(
        tuple(r)
        for r in strongly_connected_components(
            spark.createDataFrame(dag, "src long, dst long")
        ).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_scc_raises_on_peel_round_overrun(spark):
    import pytest

    from pg_iui_ner_api_spark.operators.graph import strongly_connected_components

    # two SCCs in a root chain: {1,2} -> {3,4}; with trim unable to
    # remove anything and only 1 peel round allowed for 2 chained
    # classes... a single round extracts BOTH classes (each color class
    # is processed in parallel), so build a chain of 3 classes where the
    # middle one is re-colored only after the first is removed.
    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    full = sorted(
        tuple(r) for r in strongly_connected_components(
            df, max_peel_rounds=32, small_core_edges=0
        ).collect()
    )
    assert full == [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 5)]
    with pytest.raises(RuntimeError, match="peeling"):
        strongly_connected_components(df, max_peel_rounds=0, small_core_edges=0)


# ---------------------------------------------------------------------------
# semi-supervised type inference (clamped label spreading)
# ---------------------------------------------------------------------------
def _py_type_inference(edges, seeds, iters):
    """Independent reference: dict-based clamped plurality spreading."""
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    typed = dict(seeds)
    for _ in range(iters):
        votes = {}
        for s, d in sym:
            if d in typed:
                votes.setdefault(s, {}).setdefault(typed[d], 0)
                votes[s][typed[d]] += 1
        new = dict(seeds)
        for n, v in votes.items():
            if n not in seeds:
                new[n] = min(v.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        typed = new
    return typed


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(int(n), t) for n, t in seeds.items()], schema=["node", "etype"]
    )


def test_type_inference_matches_python_oracle(spark):
    seeds = {1: "A", 6: "B"}
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["etype"]
            for r in G.type_inference(
                G.symmetrize(_edges_df(spark, EDGES)),
                _seeds_df(spark, seeds),
                iters=iters,
            ).collect()
        }
        assert got == _py_type_inference(EDGES, seeds, iters), iters


def test_type_inference_seeds_are_clamped(spark):
    # node 2's neighbors 1,3,4 all carry type A after round 1, but the
    # seed label Z on node 2 must never change — and is_seed marks it
    seeds = {1: "A", 3: "A", 4: "A", 2: "Z"}
    out = {
        r["node"]: (r["etype"], r["is_seed"])
        for r in G.type_inference(
            G.symmetrize(_edges_df(spark, EDGES)),
            _seeds_df(spark, seeds),
            iters=2,
        ).collect()
    }
    assert out[2] == ("Z", True)
    assert out[5][1] is False


def test_type_inference_tie_breaks_to_smallest_type(spark):
    # node 3 sees exactly one A (node 1) and one B (node 2): tie -> "A"
    seeds = {1: "A", 2: "B"}
    out = {
        r["node"]: r["etype"]
        for r in G.type_inference(
            G.symmetrize(_edges_df(spark, [(1, 3), (2, 3)])),
            _seeds_df(spark, seeds),
            iters=1,
        ).collect()
    }
    assert out[3] == "A"


def test_type_inference_unreached_nodes_absent(spark):
    # 8-9 is a separate component: the wave from seed 1 never arrives
    edges = EDGES + [(8, 9)]
    out = G.type_inference(
        G.symmetrize(_edges_df(spark, edges)),
        _seeds_df(spark, {1: "A"}),
        iters=2,
    )
    nodes = {r["node"] for r in out.collect()}
    assert 8 not in nodes and 9 not in nodes
    # 1 hop from seed 1 reaches 2,3 only; 4 needs the second round
    one_hop = {
        r["node"]
        for r in G.type_inference(
            G.symmetrize(_edges_df(spark, edges)),
            _seeds_df(spark, {1: "A"}),
            iters=1,
        ).collect()
    }
    assert one_hop == {1, 2, 3}


def test_type_inference_rejects_bad_iters(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        G.type_inference(
            _edges_df(spark, EDGES), _seeds_df(spark, {1: "A"}), iters=0
        )


# ---------------------------------------------------------------------------
# Newman modularity
# ---------------------------------------------------------------------------
def _py_modularity(edges, labels):
    m = len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for lbl in set(labels.values()):
        nodes = {n for n, l in labels.items() if l == lbl}
        lc = sum(1 for a, b in edges if a in nodes and b in nodes)
        dc = sum(deg[n] for n in nodes)
        out[lbl] = (
            len(nodes), lc, dc,
            round(lc / m - (dc / (2.0 * m)) * (dc / (2.0 * m)), 6),
        )
    return out


def _labels_df(spark, labels):
    return spark.createDataFrame(
        [(int(n), int(l)) for n, l in labels.items()], schema=["node", "label"]
    )


def test_modularity_two_triangles(spark):
    # two triangles joined by one bridge, split at the bridge: the
    # textbook Q = 2 * (3/7 - (7/14)^2) = 0.357143
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    labels = {1: 10, 2: 10, 3: 10, 4: 20, 5: 20, 6: 20}
    rows = G.modularity(_edges_df(spark, edges), _labels_df(spark, labels)).collect()
    got = {r["label"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"],
                        r["contribution"]) for r in rows}
    assert got == _py_modularity(edges, labels)
    assert abs(sum(r["contribution"] for r in rows) - 0.357143) < 1e-6


def test_modularity_single_community_is_zero(spark):
    labels = {n: 1 for e in EDGES for n in e}
    rows = G.modularity(_edges_df(spark, EDGES), _labels_df(spark, labels)).collect()
    assert len(rows) == 1 and rows[0]["contribution"] == 0.0
    assert rows[0]["intra_edges"] == len(EDGES)


def test_modularity_matches_python_on_lpa_labels(spark):
    lpa = {
        r["node"]: r["lbl"]
        for r in G.label_propagation(
            G.symmetrize(_edges_df(spark, EDGES)), iters=2
        ).collect()
    }
    rows = G.modularity(
        _edges_df(spark, EDGES),
        _labels_df(spark, lpa),
    ).collect()
    got = {r["label"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"],
                        r["contribution"]) for r in rows}
    assert got == _py_modularity(EDGES, lpa)


def test_modularity_missing_label_raises(spark):
    import pytest as _pytest

    labels = {1: 1, 2: 1}  # nodes 3..6 unlabeled
    with _pytest.raises(ValueError):
        G.modularity(_edges_df(spark, EDGES), _labels_df(spark, labels))


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------
def test_hits_bipartite_hand_computed(spark):
    """h0=1; a1 = in-degree; h1 = sum of a1 over out-neighbors; etc.
    Graph: h1->{x,y}, h2->{y}, so y is the stronger authority and
    hub1 the stronger hub. Exact integers make every step checkable."""
    from pg_iui_ner_api_spark.operators.graph import hits

    e = spark.createDataFrame(
        [("h1", "x"), ("h1", "y"), ("h2", "y")], ["src", "dst"]
    )
    got = {r.node: (r.hub, r.authority) for r in hits(e, iters=2).collect()}
    # a1: x=1, y=2; h1: h1=3, h2=2; a2: x=3, y=5; h2: h1=8, h2=5
    assert got == {
        "h1": (1.0, 0.0),
        "h2": (0.625, 0.0),
        "x": (0.0, 0.6),
        "y": (0.0, 1.0),
    }


def test_hits_duplicate_edges_and_cycle(spark):
    from pg_iui_ner_api_spark.operators.graph import hits

    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    got = {r.node: (r.hub, r.authority) for r in hits(e, iters=1).collect()}
    # dedup: a->b, b->a; a1: a=1, b=1; h1: a=1, b=1 -> all ties at 1.0
    assert got == {"a": (1.0, 1.0), "b": (1.0, 1.0)}


def test_hits_matches_numpy_power_iteration(spark):
    """Cross-check the exact-integer max-norm iteration against a numpy
    replay on a random-ish fixed digraph."""
    import numpy as np

    from pg_iui_ner_api_spark.operators.graph import hits

    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 3), (2, 4),
    ]
    n = 5
    A = np.zeros((n, n), dtype=object)
    for u, v in edges:
        A[u, v] = 1
    h = np.ones(n, dtype=object)
    for _ in range(3):
        a = A.T @ h
        h = A @ a
    e = spark.createDataFrame(
        [(f"n{u}", f"n{v}") for u, v in edges], ["src", "dst"]
    )
    got = {r.node: (r.hub, r.authority) for r in hits(e, iters=3).collect()}
    want = {
        f"n{i}": (
            round(int(h[i]) / int(max(h)), 6),
            round(int(a[i]) / int(max(a)), 6),
        )
        for i in range(n)
    }
    assert got == want


# ---------------------------------------------------------------------------
# labeled paths
# ---------------------------------------------------------------------------
def test_labeled_paths_hand_graph(spark):
    from pg_iui_ner_api_spark.operators.graph import labeled_paths

    t = spark.createDataFrame(
        [
            ("a", "p", "b"),
            ("b", "q", "c"),
            ("b", "q", "d"),
            ("c", "r", "a"),   # cycle back to start
            ("a", "x", "c"),   # second route a->c
        ],
        ["subj", "pred", "obj"],
    )
    starts = spark.createDataFrame([("a",)], ["node"])
    got = sorted(
        (r.start, r.end_node, r.hops, r.path)
        for r in labeled_paths(t, starts, max_hops=3).collect()
    )
    # hop 1: a->b, a->c; hop 2: b->c, b->d; hop 3: nothing — c's only
    # edge returns to the visited start and d has no out-edges
    assert got == sorted([
        ("a", "b", 1, "p"),
        ("a", "c", 1, "x"),
        ("a", "c", 2, "p/q"),
        ("a", "d", 2, "p/q"),
    ])


def test_labeled_paths_simple_path_pruning_and_multiplicity(spark):
    from pg_iui_ner_api_spark.operators.graph import labeled_paths

    t = spark.createDataFrame(
        [
            ("a", "p", "m1"),
            ("a", "p", "m2"),
            ("m1", "q", "z"),
            ("m2", "q", "z"),
            ("z", "r", "a"),  # cycle: must be pruned as a revisit
        ],
        ["subj", "pred", "obj"],
    )
    starts = spark.createDataFrame([("a",)], ["node"])
    rows = [
        (r.start, r.end_node, r.hops, r.path)
        for r in labeled_paths(t, starts, max_hops=4).collect()
    ]
    # two DISTINCT pieces of evidence for a -p/q-> z (via m1 and m2):
    # multiplicity preserved
    assert rows.count(("a", "z", 2, "p/q")) == 2
    # the z->a edge never produces a path ending back at a
    assert not [r for r in rows if r[1] == "a"]
    # but z's onward step to... nothing else: max path length is 2
    assert max(r[2] for r in rows) == 2


def test_labeled_paths_validation(spark):
    from pg_iui_ner_api_spark.operators.graph import labeled_paths

    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    starts = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(ValueError):
        labeled_paths(t, starts, max_hops=0)


def test_walk_pairs_hand_computed(spark):
    from pg_iui_ner_api_spark.operators.graph import walk_pairs

    walks = spark.createDataFrame(
        [
            # one walk a->b->c->d
            ("a", 0, 0, "a"), ("a", 0, 1, "b"),
            ("a", 0, 2, "c"), ("a", 0, 3, "d"),
            # a second walk that repeats the (a,b) adjacency
            ("a", 1, 0, "a"), ("a", 1, 1, "b"),
        ],
        ["start", "walk_no", "step", "node"],
    )
    got = {(r.center, r.context): r.n_pairs
           for r in walk_pairs(walks, window=1).collect()}
    assert got == {
        ("a", "b"): 2, ("b", "a"): 2,
        ("b", "c"): 1, ("c", "b"): 1,
        ("c", "d"): 1, ("d", "c"): 1,
    }
    wide = {(r.center, r.context): r.n_pairs
            for r in walk_pairs(walks, window=2).collect()}
    assert wide[("a", "c")] == 1 and wide[("b", "d")] == 1
    assert ("a", "d") not in wide  # 3 steps apart > window
    import pytest as _pytest
    with _pytest.raises(ValueError):
        walk_pairs(walks, window=0)


def test_hits_rejects_zero_iters(spark):
    from pg_iui_ner_api_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="iters"):
        hits(e, iters=0)


def test_clustering_coefficient_hand_graph(spark):
    """Triangle 1-2-3 plus pendant 4 on node 1: lcc(1)=1/3 (one of
    three possible neighbor pairs closed), lcc(2)=lcc(3)=1, lcc(4)=0."""
    from pg_iui_ner_api_spark.operators.graph import clustering_coefficient

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], ["src", "dst"]
    )
    got = {r.node: (r.degree, r.n_triangles, r.lcc)
           for r in clustering_coefficient(e).collect()}
    assert got == {
        1: (3, 1, 0.333333),
        2: (2, 1, 1.0),
        3: (2, 1, 1.0),
        4: (1, 0, 0.0),
    }


def test_clustering_coefficient_matches_reference(spark):
    """Random canonical graph vs an independent pure-Python reference."""
    import itertools
    import random

    from pg_iui_ner_api_spark.operators.graph import clustering_coefficient

    rng = random.Random(7)
    nodes = list(range(30))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        t = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                if y in adj.get(x, ()))
        d = len(nb)
        lcc = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        want[v] = (d, t, lcc)
    got = {r.node: (r.degree, r.n_triangles, r.lcc)
           for r in clustering_coefficient(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got == want


def test_ktruss_hand_graph_and_cascade(spark):
    """Two triangles sharing edge (2,3) + a pendant: at k=3 every
    triangle edge survives and the pendant drops; at k=4 the first peel
    leaves only the shared edge, whose support then collapses — the
    multi-round cascade empties the graph."""
    from pg_iui_ner_api_spark.operators.graph import ktruss

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)], ["src", "dst"]
    )
    k3 = {(r.src, r.dst): r.support for r in ktruss(e, k=3, rounds=2).collect()}
    assert k3 == {(1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1}
    assert ktruss(e, k=4, rounds=3).count() == 0


def test_ktruss_matches_fixpoint_reference(spark):
    """Random canonical graph vs a pure-Python run-to-fixpoint truss."""
    import random

    from pg_iui_ner_api_spark.operators.graph import ktruss

    rng = random.Random(11)
    nodes = list(range(24))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(140)})

    def support(es):
        s = {ed: 0 for ed in es}
        eset = set(es)
        for a, b in es:
            for c in nodes:
                if c > b and (a, c) in eset and (b, c) in eset:
                    s[(a, b)] += 1
                    s[(a, c)] += 1
                    s[(b, c)] += 1
        return s

    k = 4
    cur = list(edges)
    while True:
        s = support(cur)
        nxt = [ed for ed in cur if s[ed] >= k - 2]
        if nxt == cur:
            break
        cur = nxt
    want = {ed: support(cur)[ed] for ed in cur}
    got = {(r.src, r.dst): r.support
           for r in ktruss(
               spark.createDataFrame(edges, ["src", "dst"]), k=k, rounds=20
           ).collect()}
    assert got == want


def test_ktruss_extra_round_is_fixpoint_on_part_graph(spark):
    """The driver key's rounds=2 is converged: round 3 changes nothing."""
    from pg_iui_ner_api_spark.operators.graph import ktruss

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    e = G.cooccurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint()
    a = {(r.src, r.dst, r.support)
         for r in ktruss(e, k=4, rounds=2).collect()}
    b = {(r.src, r.dst, r.support)
         for r in ktruss(e, k=4, rounds=3).collect()}
    assert a == b


def test_ktruss_validation(spark):
    from pg_iui_ner_api_spark.operators.graph import ktruss

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        ktruss(e, k=2, rounds=1)
    with pytest.raises(ValueError):
        ktruss(e, k=4, rounds=0)


def test_node2vec_uniform_equals_deepwalk(spark):
    """p = q = 1 makes the weighted selection collapse to
    idx = hash % degree — bit-identical to random_walks."""
    from pg_iui_ner_api_spark.operators.graph import (
        node2vec_walks,
        random_walks,
        symmetrize,
    )

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)], ["src", "dst"]
    )
    sym = symmetrize(e)
    a = {tuple(r) for r in random_walks(
        sym, walk_len=3, walks_per_node=2, seed="w0").collect()}
    b = {tuple(r) for r in node2vec_walks(
        sym, walk_len=3, walks_per_node=2, p=1, q=1, seed="w0").collect()}
    assert a == b


def test_node2vec_matches_python_reference(spark):
    """Biased walks vs an independent pure-Python replay of the same
    md5 chain + integer-weight cumulative selection."""
    import hashlib

    from pg_iui_ner_api_spark.operators.graph import node2vec_walks, symmetrize

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (1, 5)]
    P, Q, SEED, L, WPN = 2, 3, "n2v", 3, 2
    adj: dict[int, list[int]] = {}
    eset = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        eset |= {(a, b), (b, a)}
    for v in adj:
        adj[v] = sorted(set(adj[v]))

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = set()
    for start in adj:
        for w in range(WPN):
            node, prev = start, None
            want.add((start, w, 0, node))
            for t in range(1, L + 1):
                cands = adj[node]
                if prev is None:
                    ws = [1] * len(cands)
                else:
                    ws = [Q if x == prev else (P * Q if (x, prev) in eset
                          else P) for x in cands]
                r = h64(f"{SEED}|{start}|{w}|{t}") % sum(ws)
                cum = 0
                for i, x in enumerate(cands):
                    cum += ws[i]
                    if cum > r:
                        nxt = x
                        break
                want.add((start, w, t, nxt))
                node, prev = nxt, node
    got = {tuple(r) for r in node2vec_walks(
        symmetrize(spark.createDataFrame(edges, ["src", "dst"])),
        walk_len=L, walks_per_node=WPN, p=P, q=Q, seed=SEED).collect()}
    assert got == want


def test_node2vec_validation(spark):
    from pg_iui_ner_api_spark.operators.graph import node2vec_walks

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        node2vec_walks(e, p=0)
    with pytest.raises(ValueError):
        node2vec_walks(e, walk_len=0)
