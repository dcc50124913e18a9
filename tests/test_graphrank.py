"""PageRank + k-hop (operators/graphrank): semantics pinned against a
driver-side numpy power iteration, BFS properties pinned on hand graphs;
the driver additionally hash-verifies ``doc_pagerank`` / ``doc_khop``
against unrolled DuckDB SQL."""

import pathlib
import sys
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.graphrank import k_hop, pagerank  # noqa: E402


def _ref_pagerank(edges, iterations=3, d=0.85):
    """Reference power iteration with the module's pinned semantics."""
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = Counter(u for u, _ in edges)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = sum(r[idx[v]] for v in nodes if out[v] == 0)
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[u]
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
         ("c", "e"), ("e", "sink")]  # 'sink' is dangling, 'd' has no in-edges


def test_pagerank_matches_numpy_reference_with_dangling(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(e, iterations=4).collect()}
    ref = _ref_pagerank(EDGES, iterations=4)
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12, v


def test_pagerank_mass_conserved_and_deterministic(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    ranks1 = pagerank(e, iterations=3).collect()
    assert abs(sum(r.rank for r in ranks1) - 1.0) < 1e-9
    ranks2 = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}
    assert {r.node: r.rank for r in ranks1} == ranks2


def test_pagerank_hot_node_salted(spark):
    """A 5k-in-edge celebrity node: the salted two-stage agg must produce
    the exact uniform-contribution value."""
    e = spark.createDataFrame(
        [(f"u{i:04d}", "star") for i in range(5000)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(e, iterations=1).collect()}
    ref = _ref_pagerank([(f"u{i:04d}", "star") for i in range(5000)],
                        iterations=1)
    assert abs(got["star"] - ref["star"]) < 1e-9
    assert len(got) == 5001


def test_k_hop_chain_and_truncation(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"])
    src = spark.createDataFrame([("a",)], ["node"])
    got = {r.node: r.hops for r in k_hop(e, src, k=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}          # d is 3 hops out


def test_k_hop_min_distance_on_diamond(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a")],
        ["src", "dst"])
    src = spark.createDataFrame([("a",)], ["node"])
    got = {r.node: r.hops for r in k_hop(e, src, k=5).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}  # min dist, early stop


def test_k_hop_multi_source(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("x", "y"), ("y", "b")], ["src", "dst"])
    src = spark.createDataFrame([("a",), ("x",)], ["node"])
    got = {r.node: r.hops for r in k_hop(e, src, k=2).collect()}
    assert got == {"a": 0, "x": 0, "b": 1, "y": 1}


def test_graphrank_plans_jvm_only(spark):
    from tests.test_plans import _plan

    e = spark.createDataFrame(EDGES, ["src", "dst"])
    assert "EvalPython" not in _plan(pagerank(e, iterations=1))
    src = spark.createDataFrame([("a",)], ["node"])
    assert "EvalPython" not in _plan(
        k_hop(e, src, k=1))


# ---- random_walks -----------------------------------------------------------

def _walks_reference(edge_list, walk_len, wpn, seed=42):
    import hashlib
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edge_list:
        adj[s].add(d)
    ranked = {s: sorted(ds) for s, ds in adj.items()}
    rows = set()
    for s in ranked:
        for widx in range(wpn):
            cur = s
            rows.add((s, widx, 0, s))
            for t in range(1, walk_len + 1):
                if cur not in ranked:
                    break
                h = int(hashlib.md5(
                    f"{s}|{widx}|{t}|{seed}".encode()).hexdigest()[:8], 16)
                cur = ranked[cur][h % len(ranked[cur])]
                rows.add((s, widx, t, cur))
    return rows


def test_random_walks_match_python_reference(spark):
    from openapi_to_rdf_spark.operators.graphrank import random_walks

    # branching graph with a sink (z) and a 2-cycle
    edge_list = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "a"),
                 ("b", "z"), ("c", "a"), ("d", "z"), ("e", "z")]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {(r.start, r.widx, r.step, r.node)
           for r in random_walks(df, 4, walks_per_node=3).collect()}
    assert got == _walks_reference(edge_list, 4, 3)


def test_random_walks_stop_at_sinks_and_are_deterministic(spark):
    from openapi_to_rdf_spark.operators.graphrank import random_walks

    df = spark.createDataFrame([("a", "z")], ["src", "dst"])
    got = sorted((r.step, r.node)
                 for r in random_walks(df, 5).collect())
    # one walk: a -> z, then stops (z is a sink); no steps 2..5
    assert got == [(0, "a"), (1, "z")]
    again = sorted((r.step, r.node)
                   for r in random_walks(df, 5).collect())
    assert got == again


def test_random_walks_follow_edges(spark):
    from openapi_to_rdf_spark.operators.graphrank import random_walks

    edge_list = [(f"n{i}", f"n{(i * 3 + j) % 20}")
                 for i in range(20) for j in range(3)]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    walks = random_walks(df, 3, walks_per_node=2).collect()
    edges = set(edge_list)
    by_walk = {}
    for r in walks:
        by_walk.setdefault((r.start, r.widx), {})[r.step] = r.node
    for (s, _), steps in by_walk.items():
        assert steps[0] == s
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in edges


def test_skipgram_pairs_window_semantics(spark):
    from openapi_to_rdf_spark.operators.graphrank import skipgram_pairs

    walk = [("a", 0, t, n) for t, n in
            enumerate(["n1", "n2", "n3", "n4", "n5"])]
    df = spark.createDataFrame(walk, ["start", "widx", "step", "node"])
    got = {(r.center, r.context, r.offset)
           for r in skipgram_pairs(df, window=2).collect()}
    assert ("n3", "n1", -2) in got and ("n3", "n5", 2) in got
    assert ("n1", "n2", 1) in got and ("n1", "n3", 2) in got
    assert ("n1", "n4", 3) not in got          # outside the window
    assert not any(c == ctx and o == 0 for c, ctx, o in got)
    # count: sum over positions of min(window, reachable) both sides
    assert len(got) == 2 * (4 + 3)  # offsets ±1: 4 pairs, ±2: 3 pairs


def test_skipgram_pairs_keep_bag_multiplicity(spark):
    from openapi_to_rdf_spark.operators.graphrank import skipgram_pairs

    # the same (center, context, offset) from TWO different walks must
    # appear twice — multiplicity is the training signal
    rows = [("a", 0, 0, "x"), ("a", 0, 1, "y"),
            ("a", 1, 0, "x"), ("a", 1, 1, "y")]
    df = spark.createDataFrame(rows, ["start", "widx", "step", "node"])
    got = [r for r in skipgram_pairs(df, window=1).collect()
           if (r.center, r.context) == ("x", "y")]
    assert len(got) == 2


def test_skipgram_pairs_isolate_walks(spark):
    from openapi_to_rdf_spark.operators.graphrank import skipgram_pairs

    rows = [("a", 0, 0, "x"), ("b", 0, 1, "y")]
    df = spark.createDataFrame(rows, ["start", "widx", "step", "node"])
    assert skipgram_pairs(df, window=3).count() == 0


def test_k_core_peels_chain_keeps_triangle(spark):
    """Triangle {a,b,c} + pendant chain c-d-e: the 2-core is exactly the
    triangle, found only through CASCADING peels (e first, then d)."""
    from openapi_to_rdf_spark.operators.graphrank import k_core

    g = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"])
    got = {r.node: r.degree for r in k_core(g, 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    assert k_core(g, 3).isEmpty()


def test_k_core_fixed_rounds_semantics(spark):
    """rounds=1 peels ONLY e; d survives the peel but fails the final
    degree filter, and c still counts its live edge to d (degree 3)."""
    from openapi_to_rdf_spark.operators.graphrank import k_core

    g = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"])
    got = {r.node: r.degree for r in k_core(g, 2, rounds=1).collect()}
    assert got == {"a": 2, "b": 2, "c": 3}


def test_k_core_convergence_guard_and_validation(spark):
    from openapi_to_rdf_spark.operators.graphrank import k_core

    g = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"])
    with pytest.raises(RuntimeError, match="converge"):
        k_core(g, 2, max_rounds=1)
    with pytest.raises(ValueError):
        k_core(g, 0)


def test_k_core_direction_and_multiedge_invariant(spark):
    """Reversed duplicates and self-loops collapse before peeling."""
    from openapi_to_rdf_spark.operators.graphrank import k_core

    g = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "a"),
         ("c", "a")], ["src", "dst"])
    got = {r.node: r.degree for r in k_core(g, 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_sssp_matches_dijkstra_reference(spark):
    """Converged mode == a pure-Python Dijkstra over a branching graph
    with a tempting-but-worse direct edge and an unreachable node."""
    import heapq

    from openapi_to_rdf_spark.operators.graphrank import shortest_paths

    edges = [("s", "a", 1.0), ("a", "b", 1.0), ("b", "t", 1.0),
             ("s", "t", 10.0), ("s", "b", 5.0), ("t", "z", 2.0),
             ("u", "v", 1.0)]  # u,v unreachable from s
    g = spark.createDataFrame(edges, ["src", "dst", "weight"])
    srcs = spark.createDataFrame([("s",)], ["node"])
    got = {r.node: r.dist
           for r in shortest_paths(g, srcs).collect()}

    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
    dist, heap = {}, [(0.0, "s")]
    while heap:
        d, n = heapq.heappop(heap)
        if n in dist:
            continue
        dist[n] = d
        for m, w in adj.get(n, []):
            if m not in dist:
                heapq.heappush(heap, (d + w, m))
    assert got == dist
    assert "u" not in got and "v" not in got


def test_sssp_fixed_rounds_bounds_path_length(spark):
    """rounds=R == min weight over paths of <= R edges: the cheap long
    path only wins once enough rounds admit it."""
    from openapi_to_rdf_spark.operators.graphrank import shortest_paths

    g = spark.createDataFrame(
        [("s", "a", 1.0), ("a", "b", 1.0), ("b", "t", 1.0),
         ("s", "t", 10.0)], ["src", "dst", "weight"])
    srcs = spark.createDataFrame([("s",)], ["node"])
    one = {r.node: r.dist for r in shortest_paths(g, srcs, rounds=1).collect()}
    three = {r.node: r.dist
             for r in shortest_paths(g, srcs, rounds=3).collect()}
    assert one["t"] == 10.0
    assert three["t"] == 3.0


def test_sssp_multi_source_and_multiedge_min(spark):
    """Multiple sources each seed dist 0; duplicate edges collapse to the
    minimum weight."""
    from openapi_to_rdf_spark.operators.graphrank import shortest_paths

    g = spark.createDataFrame(
        [("s1", "m", 4.0), ("s1", "m", 2.0), ("s2", "m", 3.0)],
        ["src", "dst", "weight"])
    srcs = spark.createDataFrame([("s1",), ("s2",)], ["node"])
    got = {r.node: r.dist for r in shortest_paths(g, srcs).collect()}
    assert got == {"s1": 0.0, "s2": 0.0, "m": 2.0}


def test_sssp_guards(spark):
    from openapi_to_rdf_spark.operators.graphrank import shortest_paths

    srcs = spark.createDataFrame([("a",)], ["node"])
    neg = spark.createDataFrame([("a", "b", -1.0)], ["src", "dst", "weight"])
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(neg, srcs)
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", 1.0) for i in range(5)]
        + [("a", "n0", 1.0)], ["src", "dst", "weight"])
    with pytest.raises(RuntimeError, match="converge"):
        shortest_paths(chain, srcs, max_rounds=2)


# -------------------------------------------------------------- node_jaccard

def test_node_jaccard_exact(spark):
    from openapi_to_rdf_spark.operators.graphrank import node_jaccard

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z"),
         ("b", "x"), ("b", "y"),
         ("c", "z"),
         ("d", "q")], ["src", "dst"])
    got = {(r.u, r.v): (r.shared, r.union_size)
           for r in node_jaccard(edges).collect()}
    # a∩b = {x,y} (2), union 3; a∩c = {z} (1), union 3; b∩c none; d isolated
    assert got == {("a", "b"): (2, 3), ("a", "c"): (1, 3)}


def test_node_jaccard_threshold_integer_exact(spark):
    from openapi_to_rdf_spark.operators.graphrank import node_jaccard

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x"),
         ("c", "w"), ("c", "v")], ["src", "dst"])
    # sim(a,b)=2/2=1.0; sim(a,c)=1/4; sim(b,c)=1/4 — threshold 1/3 keeps ab
    got = {(r.u, r.v) for r in
           node_jaccard(edges, threshold=(1, 3)).collect()}
    assert got == {("a", "b")}


def test_node_jaccard_neighbor_cap_undercounts_shared_only(spark):
    from openapi_to_rdf_spark.operators.graphrank import node_jaccard

    # 'hub' is shared by all three; 'x' only by a, b
    edges = spark.createDataFrame(
        [(u, "hub") for u in ("a", "b", "c")]
        + [("a", "x"), ("b", "x")], ["src", "dst"])
    capped = {(r.u, r.v): (r.shared, r.union_size)
              for r in node_jaccard(edges, neighbor_cap=2).collect()}
    # hub (fan-in 3) excluded from pairing: only (a,b) via x survives;
    # union_size stays exact (degrees include the hub edge)
    assert capped == {("a", "b"): (1, 3)}
    exact = {(r.u, r.v): (r.shared, r.union_size)
             for r in node_jaccard(edges).collect()}
    assert exact[("a", "b")] == (2, 2)
    assert ("a", "c") in exact and ("b", "c") in exact


def test_node_jaccard_duplicate_edges_ignored(spark):
    from openapi_to_rdf_spark.operators.graphrank import node_jaccard

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "x")], ["src", "dst"])
    got = {(r.u, r.v): (r.shared, r.union_size)
           for r in node_jaccard(edges).collect()}
    assert got == {("a", "b"): (1, 1)}
