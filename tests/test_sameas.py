"""owl:sameAs smushing (operators/entailment.sameas_map / sameas_smush):
equivalence classes via salted CC, representative rewrite, literal-kind
protection, idempotence. The driver's ``kg_sameas`` query hash-checks the
smush against DuckDB's analytic residue-class grouping."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    sameas_map, sameas_smush)

SAME = "owl:sameAs"


def spo(df):
    return {(r.s, r.p, r.o) for r in df.select("s", "p", "o").collect()}


@pytest.fixture(scope="module")
def g(spark):
    # two equivalence classes: chain {a1,a2,a3} and pair {b1,b2}; c is
    # untouched. Facts hang off every member.
    rows = [
        ("a1", SAME, "a2"), ("a2", SAME, "a3"),       # chain
        ("b2", SAME, "b1"),                            # reversed direction
        ("a2", "worksAt", "Acme"), ("a3", "knows", "b2"),
        ("b1", "knows", "c"), ("c", "likes", "a3"),
        ("a1", SAME, "a1"),                            # reflexive noise
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"]).cache()


def test_sameas_map_components(g):
    m = {r.node: r.canonical for r in sameas_map(g).collect()}
    assert m == {"a1": "a1", "a2": "a1", "a3": "a1", "b1": "b1", "b2": "b1"}


def test_smush_rewrites_both_positions_and_drops_edges(g):
    out = spo(sameas_smush(g))
    assert out == {
        ("a1", "worksAt", "Acme"), ("a1", "knows", "b1"),
        ("b1", "knows", "c"), ("c", "likes", "a1"),
    }


def test_smush_is_idempotent(g):
    once = sameas_smush(g)
    assert spo(sameas_smush(once)) == spo(once)


def test_smush_respects_o_kind(spark):
    rows = [
        ("x", SAME, "y", "iri", None),
        ("d", "label", "y", "literal", None),    # literal that equals a node
        ("d", "ref", "y", "iri", None),
        ("y", "age", "7", "literal", None),
    ]
    df = spark.createDataFrame(
        rows, "s string, p string, o string, o_kind string, "
              "o_datatype string")
    out = sameas_smush(df)
    got = {(r.s, r.p, r.o, r.o_kind) for r in out.collect()}
    assert got == {
        ("d", "label", "y", "literal"),   # protected
        ("d", "ref", "x", "iri"),         # rewritten
        ("x", "age", "7", "literal"),     # subject rewritten
    }


def test_smush_collapses_duplicates_to_set(spark):
    # two facts that become identical after the rewrite collapse to one
    df = spark.createDataFrame(
        [("p", SAME, "q"), ("p", "knows", "z"), ("q", "knows", "z")],
        ["s", "p", "o"])
    assert spo(sameas_smush(df)) == {("p", "knows", "z")}


def test_smush_long_chain_exceeds_one_hop(spark):
    # a 40-node chain: pointer jumping must converge (components' own
    # regression shape, re-asserted through the sameAs surface)
    n = 40
    edges = [(f"n{i:02d}", SAME, f"n{i + 1:02d}") for i in range(n - 1)]
    facts = [(f"n{i:02d}", "f", "v") for i in range(n)]
    df = spark.createDataFrame(edges + facts, ["s", "p", "o"])
    assert spo(sameas_smush(df)) == {("n00", "f", "v")}


def test_ifp_sameas_edges_star_shape(spark):
    from openapi_to_rdf_spark.operators.entailment import ifp_sameas_edges

    rows = [
        ("ssn", "rdf:type", "owl:InverseFunctionalProperty"),
        ("spouse", "rdf:type", "owl:FunctionalProperty"),
        # three subjects share an ssn value -> 2 star edges to the min
        ("p1", "ssn", "123"), ("p2", "ssn", "123"), ("p3", "ssn", "123"),
        ("p4", "ssn", "999"),                     # singleton: no edge
        # one subject, two spouse objects -> objects merge
        ("p1", "spouse", "qB"), ("p1", "spouse", "qA"),
        ("p9", "likes", "123"),                   # not a declared key
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    got = {(r.src, r.dst) for r in ifp_sameas_edges(df).collect()}
    assert got == {("p2", "p1"), ("p3", "p1"), ("qB", "qA")}


def test_ifp_smush_composes_with_asserted_sameas(spark):
    from openapi_to_rdf_spark.operators.entailment import ifp_smush

    rows = [
        ("ssn", "rdf:type", "owl:InverseFunctionalProperty"),
        # identity chain alternating key-share and asserted sameAs:
        # a ~ b (shared ssn), b owl:sameAs c  => {a, b, c} one class
        ("a", "ssn", "k1"), ("b", "ssn", "k1"), ("b", SAME, "c"),
        ("c", "worksAt", "Acme"), ("a", "age", "30"),
        ("d", "knows", "c"),
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    out = spo(ifp_smush(df))
    assert out == {
        ("a", "ssn", "k1"),          # collapsed from a/b's duplicate keys
        ("a", "worksAt", "Acme"), ("a", "age", "30"), ("d", "knows", "a"),
    }


def test_ifp_smush_without_declarations_is_sameas_smush(g):
    from openapi_to_rdf_spark.operators.entailment import (ifp_smush,
                                                           sameas_smush)
    assert spo(ifp_smush(g)) == spo(sameas_smush(g))
