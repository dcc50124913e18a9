"""HITS hubs/authorities (graphrank.hits) and the class-to-class schema
summary (kgstats.schema_summary)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.graphrank import hits  # noqa: E402
from openapi_to_rdf_spark.operators.kgstats import (  # noqa: E402
    RDF_TYPE, schema_summary)

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_hits_hand_computed(spark):
    # a->c, b->c, c->d: after 2 rounds auth = {c:4, d:1}, hub = {a:4, b:4,
    # c:1}; normalized by max
    e = spark.createDataFrame([("a", "c"), ("b", "c"), ("c", "d")],
                              ["src", "dst"])
    got = {r.node: (r.auth, r.hub) for r in hits(e, iterations=2).collect()}
    assert got == {"a": (0.0, 1.0), "b": (0.0, 1.0),
                   "c": (1.0, 0.25), "d": (0.25, 0.0)}


def test_hits_duplicate_edges_collapse(spark):
    e = spark.createDataFrame([("a", "c")] * 5 + [("b", "c")],
                              ["src", "dst"])
    got = {r.node: (r.auth, r.hub) for r in hits(e, iterations=1).collect()}
    # auth1: c=2; hub1: a=2, b=2 -> both hubs tie at 1.0
    assert got == {"a": (0.0, 1.0), "b": (0.0, 1.0), "c": (1.0, 0.0)}


def test_schema_summary(spark):
    kg = "urn:kg#"
    rows = [
        # typed subject, IRI object typed
        ("s1", RDF_TYPE, "iri", kg + "Turn", None),
        ("e1", RDF_TYPE, "iri", kg + "Entity", None),
        ("s1", kg + "mentions", "iri", "e1", None),
        # literal with explicit datatype
        ("s1", kg + "count", "literal", "5", XSD + "integer"),
        # plain literal -> xsd:string
        ("s1", kg + "label", "literal", "x", None),
        # untyped subject
        ("s2", kg + "label", "literal", "y", None),
        # IRI object with NO type -> urn:untyped
        ("s1", kg + "ref", "iri", "nowhere", None),
        # multi-typed subject contributes per class
        ("s3", RDF_TYPE, "iri", kg + "Turn", None),
        ("s3", RDF_TYPE, "iri", kg + "Event", None),
        ("s3", kg + "label", "literal", "z", None),
    ]
    t = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o string, "
              "o_datatype string")
    got = {(r.s_class, r.p, r.o_class): (r.n_triples, r.n_subjects)
           for r in schema_summary(t).collect()}
    assert got[(kg + "Turn", kg + "mentions", kg + "Entity")] == (1, 1)
    assert got[(kg + "Turn", kg + "count", XSD + "integer")] == (1, 1)
    # s1 and s3 are both Turn-labelled string literals
    assert got[(kg + "Turn", kg + "label", XSD + "string")] == (2, 2)
    assert got[(kg + "Event", kg + "label", XSD + "string")] == (1, 1)
    assert got[("urn:untyped", kg + "label", XSD + "string")] == (1, 1)
    assert got[(kg + "Turn", kg + "ref", "urn:untyped")] == (1, 1)
    # rdf:type rows themselves are excluded from the summary
    assert not any(p == RDF_TYPE for _, p, _2 in got)
