"""Property paths (operators/paths): per-operator semantics on planted
graphs, SPARQL bag/set semantics boundaries, cycle convergence, the
constant-end BFS rewrite, composition inside bgp_query, and the
bgp_count eager-aggregation rewrite (plan + equivalence). Driver-side the
same code is hash-verified against DuckDB (bgp_path_orders,
bgp_path_closure, bgp_agg_orders)."""

import pathlib
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.bgp import bgp_count, bgp_query  # noqa: E402
from openapi_to_rdf_spark.operators.paths import (  # noqa: E402
    compile_path, path_query,
)

KG = "http://x/kg#"
CHAIN = [
    ("a", KG + "next", "b"), ("b", KG + "next", "c"), ("c", KG + "next", "d"),
    ("a", KG + "alt", "x"), ("d", KG + "name", "dee"), ("x", KG + "name", "ex"),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(CHAIN, ["s", "p", "o"]).cache()


def _pairs(df, a="a", b="b"):
    return sorted((r[a], r[b]) for r in df.collect())


def test_seq_alt_inv(g):
    assert _pairs(path_query(g, "?a", ("seq", KG + "next", KG + "next"),
                             "?b")) == [("a", "c"), ("b", "d")]
    assert _pairs(path_query(g, "?a", ("alt", KG + "next", KG + "alt"),
                             "?b")) == [("a", "b"), ("a", "x"),
                                        ("b", "c"), ("c", "d")]
    assert _pairs(path_query(g, "?a", ("inv", KG + "next"), "?b")) == [
        ("b", "a"), ("c", "b"), ("d", "c")]


def test_plus_closure_both_variable(g):
    assert _pairs(path_query(g, "?a", ("+", KG + "next"), "?b")) == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")]


def test_constant_end_bfs_rewrite(g):
    # constant subject: only b's reachable set
    assert sorted(r.b for r in path_query(
        g, "b", ("+", KG + "next"), "?b").collect()) == ["c", "d"]
    # star includes the zero-length self pair for the bound term
    assert sorted(r.b for r in path_query(
        g, "b", ("*", KG + "next"), "?b").collect()) == ["b", "c", "d"]
    # constant object: BFS over the reversed relation
    assert sorted(r.a for r in path_query(
        g, "?a", ("+", KG + "next"), "c").collect()) == ["a", "b"]


def test_bounded_and_zero_or_one(g):
    assert _pairs(path_query(g, "?a", ("between", KG + "next", 1, 2),
                             "?b")) == [("a", "b"), ("a", "c"),
                                        ("b", "c"), ("b", "d"), ("c", "d")]
    got = _pairs(path_query(g, "?a", ("?", KG + "alt"), "?b"))
    assert ("a", "x") in got        # the one-step pair
    assert ("a", "a") in got and ("dee", "dee") in got  # zero-length idents


def test_closure_converges_on_cycles(spark, g):
    cyc = g.union(spark.createDataFrame(
        [("d", KG + "next", "a")], ["s", "p", "o"]))
    # 4-cycle: closure is all 16 ordered pairs (incl. self via the loop)
    assert path_query(cyc, "?a", ("+", KG + "next"), "?b").count() == 16
    # ?x p+ ?x finds exactly the cycle members
    assert sorted(r.x for r in path_query(
        cyc, "?x", ("+", KG + "next"), "?x").collect()) == list("abcd")


def test_max_rounds_fails_loudly(spark):
    chain = spark.createDataFrame(
        [(f"n{i}", KG + "next", f"n{i+1}") for i in range(12)],
        ["s", "p", "o"])
    with pytest.raises(RuntimeError, match="did not converge"):
        path_query(chain, "?a", ("+", KG + "next"), "?b", max_rounds=3)


def test_closure_matches_python_reference(spark):
    rnd = random.Random(7)
    edges = sorted({(f"v{rnd.randrange(30)}", f"v{rnd.randrange(30)}")
                    for _ in range(60)})
    trip = spark.createDataFrame(
        [(s, KG + "e", o) for s, o in edges], ["s", "p", "o"])
    # warshall-style reference closure
    reach = set(edges)
    changed = True
    while changed:
        changed = False
        for (s, m) in list(reach):
            for (m2, o) in edges:
                if m2 == m and (s, o) not in reach:
                    reach.add((s, o))
                    changed = True
    got = set(_pairs(path_query(trip, "?a", ("+", KG + "e"), "?b")))
    assert got == reach


def test_path_inside_bgp_query_joins_with_patterns(g):
    got = _pairs(bgp_query(g, [
        ("?a", ("seq", ("+", KG + "next"), KG + "name"), "?n"),
    ]), "a", "n")
    assert got == [("a", "dee"), ("b", "dee"), ("c", "dee")]


def test_bad_path_specs_rejected(g):
    for bad in [("seq", KG + "next"), ("alt", KG + "next"),
                ("nope", KG + "next"), (), 7]:
        with pytest.raises(ValueError):
            compile_path(g, bad)
    with pytest.raises(ValueError):
        compile_path(g, ("between", KG + "next", 3, 1))


AGG_T = [
    ("o1", KG + "placedBy", "c1"), ("o2", KG + "placedBy", "c1"),
    ("o3", KG + "placedBy", "c2"), ("o4", KG + "placedBy", "c3"),
    ("c1", KG + "inNation", "n1"), ("c2", KG + "inNation", "n1"),
    ("c3", KG + "inNation", "n2"),
    ("n1", KG + "name", "FR"), ("n2", KG + "name", "DE"),
]
AGG_P = [("?o", KG + "placedBy", "?c"), ("?c", KG + "inNation", "?n"),
         ("?n", KG + "name", "?nn")]


def test_bgp_count_eager_equals_lazy(spark):
    t = spark.createDataFrame(AGG_T, ["s", "p", "o"])
    eager = sorted((r.nn, r.n) for r in bgp_count(
        t, AGG_P, ["?nn"], "?o").collect())
    lazy = sorted((r.nn, r.n) for r in bgp_count(
        t, AGG_P, ["?nn"], "?o", eager=False).collect())
    assert eager == lazy == [("DE", 1), ("FR", 3)]


def test_bgp_count_eager_preaggregates(spark):
    t = spark.createDataFrame(AGG_T, ["s", "p", "o"])
    plan = (bgp_count(t, AGG_P, ["?nn"], "?o")
            ._jdf.queryExecution().optimizedPlan().toString())
    # the rewrite leaves TWO aggregates: the partial below the join and
    # the final sum — the lazy plan has exactly one
    assert plan.count("Aggregate") >= 2
    lazy_plan = (bgp_count(t, AGG_P, ["?nn"], "?o", eager=False)
                 ._jdf.queryExecution().optimizedPlan().toString())
    assert lazy_plan.count("Aggregate") == 1


def test_bgp_count_falls_back_when_illegal(spark):
    t = spark.createDataFrame(AGG_T, ["s", "p", "o"])
    # grouping BY the counted variable makes the rewrite illegal; the
    # fallback must still answer (one solution row per order)
    got = sorted((r.o, r.n) for r in bgp_count(
        t, AGG_P, ["?o"], "?o").collect())
    assert got == [(f"o{i}", 1) for i in range(1, 5)]


def test_negated_property_set(spark):
    from openapi_to_rdf_spark.operators.paths import compile_path, path_query

    g = spark.createDataFrame(
        [("a", "knows", "b"), ("a", "hates", "c"), ("b", "likes", "d"),
         ("d", "knows", "a")], ["s", "p", "o"])
    got = {(r.s, r.o) for r in compile_path(g, ("nps", "knows")).collect()}
    assert got == {("a", "c"), ("b", "d")}
    # multi-exclusion and composition with inv / seq
    got2 = {(r.s, r.o) for r in compile_path(
        g, ("nps", "knows", "likes")).collect()}
    assert got2 == {("a", "c")}
    inv = {(r.s, r.o) for r in compile_path(
        g, ("inv", ("nps", "knows"))).collect()}
    assert inv == {("c", "a"), ("d", "b")}
    import pytest
    with pytest.raises(ValueError):
        compile_path(g, ("nps",))
