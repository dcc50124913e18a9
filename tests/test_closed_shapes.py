"""sh:closed validation (shapes.closed_shape_violations): undeclared
predicates on closed-class focus nodes are flagged; open classes and
ignored properties are not."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.shapes import (  # noqa: E402
    RDF_TYPE, closed_shape_violations, kg_shape_rules)

KG = "http://ericsson.com/models/3gpp/kg#"


def _triples(spark, rows):
    return spark.createDataFrame(
        [("f", "kg", s, p, k, o, None) for s, p, k, o in rows],
        "file string, graph string, s string, p string, o_kind string, "
        "o string, o_datatype string")


def test_closed_class_flags_undeclared_predicate(spark):
    rules = kg_shape_rules(spark, KG)
    rows = [
        ("t1", RDF_TYPE, "iri", KG + "Turn"),
        ("t1", KG + "role", "literal", "user"),
        ("t1", KG + "atTime", "literal", "2024-01-01T00:00:00"),
        ("t1", KG + "smuggled", "literal", "x"),        # undeclared
        ("t2", RDF_TYPE, "iri", KG + "Conversation"),
        ("t2", KG + "smuggled", "literal", "y"),        # Conversation open
        ("t3", KG + "smuggled", "literal", "z"),        # untyped: no focus
    ]
    v = closed_shape_violations(_triples(spark, rows), rules,
                                closed_classes=[KG + "Turn"]).collect()
    assert {(r.s, r.p) for r in v} == {("t1", KG + "smuggled")}
    assert all(r.violation == "closedShapeViolation" for r in v)
    assert "closed " + KG + "Turn" in v[0].detail


def test_ignored_properties_and_multi_class(spark):
    rules = kg_shape_rules(spark, KG)
    rows = [
        ("t1", RDF_TYPE, "iri", KG + "Turn"),
        # rdf:type itself ignored by default; also explicitly ignore audit
        ("t1", KG + "audit", "literal", "x"),
        ("t1", KG + "mentions", "iri", "e1"),
    ]
    v = closed_shape_violations(
        _triples(spark, rows), rules, closed_classes=[KG + "Turn"],
        ignored=(RDF_TYPE, KG + "audit")).collect()
    assert v == []
    # subject typed with BOTH a closed and an open class: the closed shape
    # still fires (SHACL: each shape validates independently)
    rows2 = rows + [("t1", RDF_TYPE, "iri", KG + "Conversation"),
                    ("t1", KG + "extra", "literal", "q")]
    v2 = closed_shape_violations(
        _triples(spark, rows2), rules, closed_classes=[KG + "Turn"],
        ignored=(RDF_TYPE, KG + "audit")).collect()
    assert {(r.s, r.p) for r in v2} == {("t1", KG + "extra")}


def test_allowed_set_comes_from_class_scoped_rules_only(spark):
    """kg:surfaceForm is an UNSCOPED rule (target_class null) — closed
    validation must not treat it as declared for kg:Turn."""
    rules = kg_shape_rules(spark, KG)
    rows = [
        ("t1", RDF_TYPE, "iri", KG + "Turn"),
        ("t1", KG + "surfaceForm", "literal", "hello"),
    ]
    v = closed_shape_violations(_triples(spark, rows), rules,
                                closed_classes=[KG + "Turn"]).collect()
    assert {(r.s, r.p) for r in v} == {("t1", KG + "surfaceForm")}
