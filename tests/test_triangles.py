"""Degree-ordered triangle counting (operators.graphrank.triangle_count)."""

import itertools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.graphrank import triangle_count  # noqa: E402


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.n_triangles for r in triangle_count(df).collect()}


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_k5_clique(spark):
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    got = _run(spark, edges)
    assert got == {n: 6 for n in range(5)}          # C(4,2) per node, 10 total


def test_chain_and_star_have_none(spark):
    chain = [(i, i + 1) for i in range(10)]
    star = [(0, i) for i in range(1, 20)]
    assert _run(spark, chain) == {}
    assert _run(spark, star) == {}


def test_direction_multiedge_selfloop_invariance(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    noisy = tri + [(2, 1), (3, 2), (1, 3), (2, 3), (1, 1)]
    assert _run(spark, tri) == {1: 1, 2: 1, 3: 1}
    assert _run(spark, noisy) == {1: 1, 2: 1, 3: 1}


def test_vs_bruteforce_random_graph(spark):
    import hashlib

    edges = []
    for i in range(400):                 # deterministic pseudo-random graph
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        edges.append((h % 30, (h // 31) % 30))
    assert _run(spark, edges) == _brute(edges)


def test_celebrity_skew_star_plus_closures(spark):
    """A 5k-leaf hub with a few closed pairs: the hub is never a wedge
    pivot (degree orientation), so the join stays linear and only the
    closed pairs produce triangles."""
    edges = [(0, i) for i in range(1, 5001)] + [(1, 2), (3, 4)]
    got = _run(spark, edges)
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_clustering_coefficient(spark):
    from openapi_to_rdf_spark.operators.graphrank import clustering_coefficient

    # triangle 1-2-3 + pendant 4 off node 1 + isolated edge 5-6
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.degree, r.n_triangles, r.lcc_e6)
           for r in clustering_coefficient(df).collect()}
    assert got[1] == (3, 1, round(2 * 1 / (3 * 2) * 1e6))   # 1/3
    assert got[2] == (2, 1, 1_000_000)
    assert got[3] == (2, 1, 1_000_000)
    assert got[4] == (1, 0, 0)                               # deg < 2
    assert got[5] == (1, 0, 0) and got[6] == (1, 0, 0)


def test_clustering_coefficient_vs_bruteforce(spark):
    import hashlib

    from openapi_to_rdf_spark.operators.graphrank import clustering_coefficient

    edges, adj = [], {}
    for i in range(300):
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        a, b = h % 25, (h // 29) % 25
        edges.append((a, b))
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    tri = _brute(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.degree, r.n_triangles, r.lcc_e6)
           for r in clustering_coefficient(df).collect()}
    assert set(got) == set(adj)
    for n, nbrs in adj.items():
        d, t = len(nbrs), tri.get(n, 0)
        want_lcc = round(2 * t / (d * (d - 1)) * 1e6) if d >= 2 else 0
        assert got[n] == (d, t, want_lcc)
