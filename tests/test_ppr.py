"""Personalized PageRank (graphrank.personalized_pagerank) vs a pure-
Python re-derivation of the integer push iteration."""

import pytest

from openapi_to_rdf_spark.operators.graphrank import personalized_pagerank

# cycle a->b->c->a plus hub spokes a->d, b->d; dangling node d
EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d")]


def idiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def ref_ppr(edges, seeds, rounds, damping_e3=850):
    out_adj = {}
    for u, v in sorted(set(edges)):
        out_adj.setdefault(u, []).append(v)
    state = {s: {s: 1_000_000_000} for s in seeds}
    restart = (1000 - damping_e3) * 1_000_000
    for _ in range(rounds):
        nxt = {s: {} for s in seeds}
        for s, masses in state.items():
            for u, m in masses.items():
                outs = out_adj.get(u, [])
                if not outs:
                    continue  # dangling mass dropped
                share = idiv(idiv(m * damping_e3, 1000), len(outs))
                for v in outs:
                    nxt[s][v] = nxt[s].get(v, 0) + share
            nxt[s][s] = nxt[s].get(s, 0) + restart
        state = nxt
    return {(s, v): m for s, d in state.items() for v, m in d.items()}


@pytest.fixture(scope="module")
def graph(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("c",)], ["id"])
    return e, seeds


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_ppr_matches_reference(graph, rounds):
    e, seeds = graph
    got = {(r["seed"], r["node"]): r["mass_e9"]
           for r in personalized_pagerank(e, seeds, rounds=rounds)
           .collect()}
    assert got == ref_ppr(EDGES, ["a", "c"], rounds)


TRIPLES = [("a", "likes", "b"), ("b", "knows", "c"), ("c", "likes", "d"),
           ("d", "knows", "a"), ("x", "likes", "y")]


def test_ppr_subgraph_matches_reference(spark):
    from openapi_to_rdf_spark.operators.graphq import ppr_subgraph

    tri = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    seeds = spark.createDataFrame([("a",), ("x",)], ["id"])
    got = {(r["seed"], r["s"], r["p"], r["o"])
           for r in ppr_subgraph(tri, seeds, rounds=2, top_n=3).collect()}

    und = sorted({(s, o) for s, _, o in TRIPLES}
                 | {(o, s) for s, _, o in TRIPLES})
    mass = ref_ppr(und, ["a", "x"], 2)
    exp = set()
    for seed in ("a", "x"):
        nodes = sorted(((n, m) for (sd, n), m in mass.items()
                        if sd == seed),
                       key=lambda t: (-t[1], t[0]))[:3]
        keep = {n for n, _ in nodes}
        exp |= {(seed, s, p, o) for s, p, o in TRIPLES
                if s in keep and o in keep}
    assert got == exp
    # the x-component stays local: x's subgraph never contains a-d edges
    assert all(s in ("x", "y") and o in ("x", "y")
               for sd, s, p, o in got if sd == "x")


def test_ppr_mass_is_lower_bound(graph):
    """Total mass per seed never exceeds 1e9 (truncation+dangling only
    ever drop mass) and the seed keeps its restart share."""
    e, seeds = graph
    rows = personalized_pagerank(e, seeds, rounds=3).collect()
    per_seed = {}
    for r in rows:
        per_seed[r["seed"]] = per_seed.get(r["seed"], 0) + r["mass_e9"]
    assert all(v <= 1_000_000_000 for v in per_seed.values())
    got = {(r["seed"], r["node"]): r["mass_e9"] for r in rows}
    assert got[("a", "a")] >= 150_000_000
    assert got[("c", "c")] >= 150_000_000


def test_resource_allocation_matches_reference(spark):
    from openapi_to_rdf_spark.operators.graphrank import (
        resource_allocation_links)

    edges = [("a", "z"), ("b", "z"), ("a", "w"), ("b", "w"), ("c", "z"),
             ("a", "b")]  # a-b adjacent -> excluded from candidates
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node_a"], r["node_b"]): (r["shared"], r["score_e9"])
           for r in resource_allocation_links(e).collect()}

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    exp = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y in adj[x]:
                continue
            shared = adj[x] & adj[y]
            if shared:
                exp[(x, y)] = (len(shared),
                               sum(1_000_000_000 // len(adj[z])
                                   for z in shared))
    assert got == exp
    # z has degree 4 (a,b,c + b? -> a,b,c); capping at 2 keeps only w
    capped = {(r["node_a"], r["node_b"]): (r["shared"], r["score_e9"])
              for r in resource_allocation_links(e, neighbor_cap=2)
              .collect()}
    assert all(s[0] <= got[k][0] for k, s in capped.items())


def test_distmult_score_matches_numpy(spark):
    import numpy as np

    from openapi_to_rdf_spark.operators.kgembed import (
        distmult_score, hash_embeddings, relation_index)
    from openapi_to_rdf_spark.operators.negatives import entity_index
    from tests.test_kgembed import DIM, SPAN, TRIPLES, ref_vec

    import pyspark.sql.functions as SF
    df = spark.createDataFrame(TRIPLES, "s string, p string, o string") \
        .withColumn("o_kind", SF.lit("iri"))
    ent = hash_embeddings(entity_index(df), dim=DIM, span=SPAN)
    rel = hash_embeddings(relation_index(df), name_col="name",
                          dim=DIM, span=SPAN)
    got = {(r["s"], r["p"], r["o"]): r["score"]
           for r in distmult_score(df, ent, rel).collect()}
    for (s, p, o), sc in got.items():
        assert sc == int((ref_vec(s) * ref_vec(p) * ref_vec(o)).sum())
