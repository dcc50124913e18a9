"""Feature propagation (operators/featprop) vs a pure-Python
re-derivation of the integer smoothing."""

import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.featprop import (
    assemble_features, explode_features, propagate_features,
    quantize_embeddings,
)

# star: a -> c, b -> c; chain: c -> d; isolated: e
EDGES = [("a", "c"), ("b", "c"), ("c", "d")]
FEATS = {"a": [10, -7], "b": [4, 5], "c": [0, 100], "d": [8, 8],
         "e": [-3, 1]}


def idiv(a, b):
    """Spark div / DuckDB // semantics: truncate toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def ref_round(x, edges):
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    out = {}
    for v, vec in x.items():
        s = [0] * len(vec)
        for u, d in edges:
            if d == v and u in x:
                s = [a + b for a, b in zip(s, x[u])]
        out[v] = [idiv(c + sc, indeg.get(v, 0) + 1)
                  for c, sc in zip(vec, s)]
    return out


@pytest.fixture(scope="module")
def graph(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    f = spark.createDataFrame([(k, v) for k, v in FEATS.items()],
                              "id string, vec array<long>")
    return e, f


def test_one_round_matches_reference(graph):
    e, f = graph
    got = {}
    for r in propagate_features(e, f, rounds=1).collect():
        got.setdefault(r["id"], {})[r["dim"]] = r["v"]
    exp = ref_round(FEATS, EDGES)
    assert {k: [d[0], d[1]] for k, d in got.items()} == exp


def test_two_rounds_matches_reference(graph):
    e, f = graph
    long2 = propagate_features(e, f, rounds=2)
    got = {r["id"]: r["vec"] for r in assemble_features(long2).collect()}
    exp = ref_round(ref_round(FEATS, EDGES), EDGES)
    assert got == exp


def test_isolated_node_unchanged_round1(graph):
    e, f = graph
    got = {r["id"]: r["vec"] for r in
           assemble_features(propagate_features(e, f, rounds=1)).collect()}
    assert got["e"] == FEATS["e"]  # no in-edges, deg 0 -> (v+0) div 1


def test_negative_division_truncates_toward_zero(spark):
    e = spark.createDataFrame([("u", "v")], "src string, dst string")
    f = spark.createDataFrame([("u", [-7]), ("v", [0])],
                              "id string, vec array<long>")
    got = {r["id"]: r["vec"] for r in
           assemble_features(propagate_features(e, f, rounds=1)).collect()}
    # v: (0 + -7) div (1+1) = -3 (trunc toward zero), NOT -4 (floor)
    assert got["v"] == [-3]


def test_quantize_embeddings(spark):
    emb = spark.createDataFrame(
        [(1, [0.1234, -0.5678, 2.0])],
        "vec_id long, embedding array<float>")
    got = quantize_embeddings(emb, dim=2).collect()[0]
    assert got["id"] == 1
    import math
    exp = [math.floor(float(__import__('numpy').float32(x)) * 1000)
           for x in (0.1234, -0.5678)]
    assert got["vec"] == exp


def test_explode_assemble_roundtrip(graph):
    _, f = graph
    back = assemble_features(explode_features(f))
    assert {r["id"]: r["vec"] for r in back.collect()} == FEATS
