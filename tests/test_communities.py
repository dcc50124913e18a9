"""Label-propagation communities (operators.communities)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.communities import label_propagation  # noqa: E402


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.community for r in label_propagation(df, **kw).collect()}


def _py_lpa(edges, iterations):
    """Synchronous LPA with identical tie-breaks (max count, then min
    label), initial label = node id, plus the operator's self-preference
    vote (each node counts its own current label once)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n, nbrs in adj.items():
            counts = {lab[n]: 1}
            for m in nbrs:
                counts[lab[m]] = counts.get(lab[m], 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        lab = new
    # canonicalize to min member per label
    canon = {}
    for n, l in lab.items():
        canon[l] = min(canon.get(l, n), n)
    return {n: canon[l] for n, l in lab.items()}


def test_two_cliques_one_bridge(spark):
    """CC sees one component; LPA separates the two dense blocks."""
    k1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    k2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    edges = k1 + k2 + [(0, 10)]
    got = _run(spark, edges, iterations=5, until_stable=True)
    assert len(set(got.values())) == 2
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[10]


def test_matches_python_reference_fixed_rounds(spark):
    import hashlib

    edges = []
    for i in range(500):
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        edges.append((h % 40, (h // 41) % 40))
    for rounds in (1, 2, 3):
        assert _run(spark, edges, iterations=rounds) == _py_lpa(edges, rounds)


def test_deterministic_across_partitioning(spark):
    import hashlib

    edges = []
    for i in range(300):
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        edges.append((h % 30, (h // 37) % 30))
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    r1 = {r.node: r.community
          for r in label_propagation(df1, iterations=4).collect()}
    r7 = {r.node: r.community
          for r in label_propagation(df7, iterations=4).collect()}
    assert r1 == r7


def test_string_node_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.community
           for r in label_propagation(df, iterations=3,
                                      until_stable=True).collect()}
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"


def test_modularity_two_cliques(spark):
    """Two K4 cliques + one bridge, partitioned by clique: Q computed by
    hand. m=13, intra per clique=6, degree_sum = 13 and 13 (bridge ends
    have deg 4)."""
    from openapi_to_rdf_spark.operators.communities import (
        community_modularity)

    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(k1 + k2 + [(0, 10), (10, 0), (3, 3)],
                                  "src long, dst long")
    asg = spark.createDataFrame(
        [(n, 0) for n in range(4)] + [(n, 1) for n in range(10, 14)],
        "node long, community long")
    rows = {r.community: r for r in
            community_modularity(edges, asg).collect()}
    m = 13
    for c in (0, 1):
        assert rows[c].n_nodes == 4
        assert rows[c].intra_edges == 6
        assert rows[c].degree_sum == 13
        assert rows[c].m == m
        assert rows[c].q_num == 4 * m * 6 - 13 * 13
    q = sum(r.q_num for r in rows.values()) / (4 * m * m)
    assert abs(q - (2 * (6 / m - (13 / (2 * m)) ** 2))) < 1e-12
    assert q > 0.4  # strong community structure


def test_modularity_unassigned_nodes_count_in_m_and_degrees(spark):
    from openapi_to_rdf_spark.operators.communities import (
        community_modularity)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9)], "src long, dst long")
    asg = spark.createDataFrame([(1, 0), (2, 0), (3, 0)],
                                "node long, community long")
    r = community_modularity(edges, asg).collect()[0]
    # node 9 unassigned: m=3 counts its edge, community 0 has
    # intra=2 (1-2, 2-3), degrees 1+2+2=5
    assert (r.n_nodes, r.intra_edges, r.degree_sum, r.m) == (3, 2, 5, 3)
    assert r.q_num == 4 * 3 * 2 - 25
