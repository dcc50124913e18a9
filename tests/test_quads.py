"""Named graphs (operators/quads): quad-pattern binding semantics —
GRAPH as constant and as join variable — dataset merge, and the SPARQL
1.1 graph-management operations on planted quad stores. The driver's
``bgp_graphs`` query hash-checks quad_query against DuckDB's relational
join on the base tables."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.quads import (  # noqa: E402
    add_graph, clear_graph, copy_graph, default_graph, graph_group,
    move_graph, quad_query)

Q = [
    ("g1", "a", "knows", "b"), ("g1", "b", "knows", "c"),
    ("g2", "a", "knows", "c"),
    ("g1", "a", "name", "alice"), ("g2", "a", "name", "alice-alt"),
    ("g2", "c", "name", "carol"),
]


@pytest.fixture(scope="module")
def q(spark):
    return spark.createDataFrame(Q, ["g", "s", "p", "o"]).cache()


def gspo(df):
    return {(r.g, r.s, r.p, r.o) for r in df.collect()}


def test_constant_graph_scopes_the_match(q):
    got = {r.y for r in graph_group(q, "g1", [("a", "knows", "?y")])
           .collect()}
    assert got == {"b"}
    got2 = {r.y for r in graph_group(q, "g2", [("a", "knows", "?y")])
            .collect()}
    assert got2 == {"c"}


def test_graph_variable_binds_and_joins(q):
    # GRAPH ?g { ?x knows ?y . ?x name ?n } — both facts in the SAME graph
    rows = quad_query(q, [("?g", "?x", "knows", "?y"),
                          ("?g", "?x", "name", "?n")]).collect()
    got = {(r.g, r.y, r.n) for r in rows}
    assert got == {("g1", "b", "alice"), ("g2", "c", "alice-alt")}


def test_cross_graph_patterns_join_on_shared_vars(q):
    # knows-edge in ?g1, target's name in ?g2 (provenance-crossing join)
    rows = quad_query(q, [("?ga", "?x", "knows", "?y"),
                          ("g2", "?y", "name", "?n")]).collect()
    assert {(r.ga, r.x, r.n) for r in rows} == {
        ("g1", "b", "carol"), ("g2", "a", "carol")}


def test_default_graph_merges_named_graphs(q):
    merged = default_graph(q)                     # FROM all graphs
    assert merged.columns == ["s", "p", "o"]
    assert merged.count() == len(Q)               # no cross-graph dupes here
    only_g1 = default_graph(q, ["g1"])
    assert only_g1.count() == 3


def test_clear_and_add(q):
    assert gspo(clear_graph(q, "g2")) == {t for t in Q if t[0] != "g2"}
    added = add_graph(q, "g2", "g1")
    got = gspo(added)
    assert ("g1", "a", "knows", "c") in got
    assert ("g1", "c", "name", "carol") in got
    # a name in both graphs keeps ONE g1 copy plus g2's original
    assert len(got) == len(Q) + 3


def test_copy_replaces_destination(q):
    got = gspo(copy_graph(q, "g1", "g2"))
    assert got == {t for t in Q if t[0] == "g1"} | {
        ("g2", s, p, o) for g, s, p, o in Q if g == "g1"}
    assert gspo(copy_graph(q, "g1", "g1")) == set(Q)   # self-copy no-op


def test_move_drops_source(q):
    got = gspo(move_graph(q, "g2", "g3"))
    assert not any(g == "g2" for g, *_ in got)
    assert ("g3", "a", "knows", "c") in got
    assert ("g1", "a", "knows", "b") in got


def test_bad_pattern_arity_rejected(q):
    with pytest.raises(ValueError):
        quad_query(q, [("?g", "a", "knows")])      # 3 terms
    with pytest.raises(ValueError):
        quad_query(q, [])
