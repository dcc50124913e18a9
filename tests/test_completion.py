"""KG completion ops (operators/completion.py): informativeness-ranked
entity summaries and neighbor-majority type propagation."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.completion import (  # noqa: E402
    RDF_TYPE, entity_summaries, type_propagation)


def test_entity_summaries_rarest_first(spark):
    rows = (
        # common predicate on every subject, rare one on s1 only
        [("s%d" % i, "kg:label", "L%d" % i) for i in range(5)]
        + [("s1", "kg:rare", "gold"), ("s1", "kg:mid", "m1"),
           ("s2", "kg:mid", "m2")])
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    got = {(r.s, r.rank): (r.p, r.o)
           for r in entity_summaries(t, k=2).collect()}
    # s1: rare (freq 1) first, then mid (freq 2); label (freq 5) cut at k=2
    assert got[("s1", 1)] == ("kg:rare", "gold")
    assert got[("s1", 2)] == ("kg:mid", "m1")
    assert got[("s3", 1)] == ("kg:label", "L3")
    assert ("s3", 2) not in got


def test_type_propagation_majority_and_rounds(spark):
    rows = [
        ("a", RDF_TYPE, "kg:Person"), ("b", RDF_TYPE, "kg:Person"),
        ("c", RDF_TYPE, "kg:Org"),
        # u1 neighbors: a, b (Person), c (Org) -> Person by 2:1
        ("u1", "kg:knows", "a"), ("u1", "kg:knows", "b"),
        ("u1", "kg:knows", "c"),
        # u2 touches only u1 -> typed in round 2 via u1's inferred Person
        ("u2", "kg:knows", "u1"),
        # tie for u3 (one Person, one Org) -> lexicographically smaller
        ("u3", "kg:knows", "a"), ("u3", "kg:knows", "c"),
    ]
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    one = {r.node: (r.inferred_class, r.votes, r.round)
           for r in type_propagation(t, rounds=1).collect()}
    assert one["u1"] == ("kg:Person", 2, 1)
    assert one["u3"] == ("kg:Org", 1, 1)  # tie -> "kg:Org" < "kg:Person"
    assert "u2" not in one and "a" not in one
    two = {r.node: (r.inferred_class, r.round)
           for r in type_propagation(t, rounds=2).collect()}
    assert two["u2"] == ("kg:Person", 2)


def test_typed_nodes_never_overwritten(spark):
    rows = [("a", RDF_TYPE, "kg:Org"), ("b", RDF_TYPE, "kg:Person"),
            ("a", "kg:knows", "b")]
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    assert type_propagation(t, rounds=3).collect() == []
