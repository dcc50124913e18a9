"""Bounded-depth Brandes betweenness (operators/betweenness) vs a
driver-side exact reference implementation."""

from collections import defaultdict, deque

import pytest

from openapi_to_rdf_spark.operators.betweenness import betweenness


def brandes_ref(edge_list, sources, max_depth=99):
    """Textbook Brandes (directed, unweighted), depth-bounded the same
    way: BFS stops expanding at the horizon."""
    adj = defaultdict(list)
    for u, v in set(edge_list):
        adj[u].append(v)
    bc = defaultdict(float)
    for s in sources:
        dist, sigma, order = {s: 0}, {s: 1}, []
        preds = defaultdict(list)
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            if dist[v] == max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {k: v for k, v in bc.items() if round(v * 1e6) != 0}


def run(spark, edge_list, sources, max_depth):
    e = spark.createDataFrame(edge_list, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in sources], ["id"])
    return {r.node: r.bc_e6
            for r in betweenness(e, s, max_depth=max_depth).collect()
            if r.bc_e6 != 0}


def assert_matches(spark, edge_list, sources, max_depth=99):
    got = run(spark, edge_list, sources, max_depth)
    want = {k: round(v * 1e6)
            for k, v in brandes_ref(edge_list, sources, max_depth).items()}
    assert got == want


def test_directed_path(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = run(spark, edges, ["a", "b", "c", "d", "e"], 4)
    # classic path values: interior node v counts (s, t) pairs around it
    assert got == {"b": 3_000_000, "c": 4_000_000, "d": 3_000_000}


def test_diamond_split_paths(spark):
    # two shortest a->d paths: b and c each carry half a dependency
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    got = run(spark, edges, ["a"], 3)
    assert got == {"b": 500_000, "c": 500_000}


def test_depth_bound_truncates(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    # horizon 2: only paths of length <= 2 count
    assert_matches(spark, edges, ["a", "b", "c"], max_depth=2)


def test_random_graph_vs_reference(spark):
    # deterministic pseudo-random directed graph with cycles and
    # multi-path diamonds
    edges = [(str(i % 13), str((i * 7 + 3) % 13)) for i in range(40)]
    edges += [(str(i % 13), str((i * 5 + 1) % 13)) for i in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    assert_matches(spark, edges, ["0", "1", "2", "5"], max_depth=3)
    assert_matches(spark, edges, ["0", "3"], max_depth=99)


def test_dead_frontier_and_isolated_source(spark):
    edges = [("a", "b")]
    got = run(spark, edges, ["z"], 3)   # source with no out-edges
    assert got == {}


@pytest.mark.parametrize("depth", [1, 2])
def test_shallow_horizons(spark, depth):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")]
    assert_matches(spark, edges, ["a", "b", "c"], max_depth=depth)


def harmonic_ref(edge_list, sources, max_depth):
    adj = defaultdict(list)
    for u, v in set(edge_list):
        adj[u].append(v)
    h, n = defaultdict(float), defaultdict(int)
    for s in sources:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            v = dq.popleft()
            if dist[v] == max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
        for v, d in dist.items():
            if d > 0:
                h[v] += 1.0 / d
                n[v] += 1
    return {v: (n[v], round(h[v] * 1e6)) for v in h}


def test_harmonic_path_and_depth(spark):
    from openapi_to_rdf_spark.operators.betweenness import (
        harmonic_centrality)

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([("a",)], ["id"])
    got = {r.node: (r.n_sources, r.harmonic_e6)
           for r in harmonic_centrality(e, s, max_depth=3).collect()}
    # d(a,b)=1, d(a,c)=2, d(a,d)=3; e beyond the horizon
    assert got == {"b": (1, 1_000_000), "c": (1, 500_000),
                   "d": (1, 333_333)}


def test_harmonic_vs_reference(spark):
    from openapi_to_rdf_spark.operators.betweenness import (
        harmonic_centrality)

    edges = [(str(i % 13), str((i * 7 + 3) % 13)) for i in range(40)]
    edges += [(str(i % 13), str((i * 5 + 1) % 13)) for i in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in ["0", "1", "2", "5"]], ["id"])
    got = {r.node: (r.n_sources, r.harmonic_e6)
           for r in harmonic_centrality(e, s, max_depth=3).collect()}
    assert got == harmonic_ref(edges, ["0", "1", "2", "5"], 3)
