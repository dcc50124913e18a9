"""sh:qualifiedValueShape validation (shapes.qualified_shape_violations):
per-focus counts of values conforming to a class- or datatype-qualified
shape vs sh:qualifiedMinCount / sh:qualifiedMaxCount (SHACL core §4.7.5-6),
plus qualified_rules_from_shacl extraction."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.shapes import (  # noqa: E402
    RDF_TYPE,
    SH,
    qualified_rules_from_shacl,
    qualified_shape_violations,
)

KG = "http://x#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(spark, rows):
    full = [r if len(r) == 5 else (*r, None) for r in rows]
    return spark.createDataFrame(
        [("f", "kg", s, p, k, o, dt) for s, p, k, o, dt in full],
        "file string, graph string, s string, p string, o_kind string, "
        "o string, o_datatype string")


def _rules(spark, rows):
    """rows: (target_class, path, q_class, q_datatype, q_min, q_max)"""
    return spark.createDataFrame(
        [("r", *r) for r in rows],
        "file string, target_class string, path string, q_class string, "
        "q_datatype string, q_min int, q_max int")


def test_class_qualified_min_and_max(spark):
    rules = _rules(spark, [
        (KG + "Order", KG + "has", KG + "Good", None, 1, 2)])
    rows = [
        ("o1", RDF_TYPE, "iri", KG + "Order"),
        ("o2", RDF_TYPE, "iri", KG + "Order"),
        ("o3", RDF_TYPE, "iri", KG + "Order"),
        ("o4", RDF_TYPE, "iri", KG + "Order"),
        ("g1", RDF_TYPE, "iri", KG + "Good"),
        ("g2", RDF_TYPE, "iri", KG + "Good"),
        ("g3", RDF_TYPE, "iri", KG + "Good"),
        ("b1", RDF_TYPE, "iri", KG + "Bad"),
        # o1: one Good -> ok; o2: only Bad -> min fires; o3: three Goods
        # -> max fires; o4: NO has triple at all -> min fires (count=0)
        ("o1", KG + "has", "iri", "g1"),
        ("o1", KG + "has", "iri", "b1"),
        ("o2", KG + "has", "iri", "b1"),
        ("o3", KG + "has", "iri", "g1"),
        ("o3", KG + "has", "iri", "g2"),
        ("o3", KG + "has", "iri", "g3"),
    ]
    v = qualified_shape_violations(_triples(spark, rows), rules).collect()
    got = {(r.s, r.violation) for r in v}
    assert got == {("o2", "qualifiedMinCountViolation"),
                   ("o3", "qualifiedMaxCountViolation"),
                   ("o4", "qualifiedMinCountViolation")}
    details = {r.s: r.detail for r in v}
    assert details["o4"] == "conforming=0 min=1 max=2"


def test_datatype_qualified(spark):
    rules = _rules(spark, [
        (None, KG + "score", None, XSD + "integer", 2, None)])
    rows = [
        ("s1", KG + "score", "literal", "1", XSD + "integer"),
        ("s1", KG + "score", "literal", "2", XSD + "integer"),
        ("s1", KG + "score", "literal", "x", XSD + "string"),
        ("s2", KG + "score", "literal", "1", XSD + "integer"),
        ("s2", KG + "score", "literal", "oops", XSD + "string"),
    ]
    v = qualified_shape_violations(_triples(spark, rows), rules).collect()
    assert {(r.s, r.violation) for r in v} == {
        ("s2", "qualifiedMinCountViolation")}


def test_unscoped_rule_ignores_absent_subjects(spark):
    # no target_class: subjects never carrying the path are not focus
    rules = _rules(spark, [
        (None, KG + "tag", None, XSD + "string", 1, None)])
    rows = [
        ("s1", KG + "other", "literal", "zzz"),
        ("s2", KG + "tag", "literal", "ok", XSD + "string"),
    ]
    v = qualified_shape_violations(_triples(spark, rows), rules).collect()
    assert v == []


def test_qualified_rules_from_shacl_and_end_to_end(spark):
    sh = SH
    rows = [
        ("shapeA", sh + "targetClass", "iri", KG + "Order"),
        ("shapeA", sh + "property", "bnode", "ps1"),
        ("_:ps1", sh + "path", "iri", KG + "has"),
        ("_:ps1", sh + "qualifiedValueShape", "bnode", "qs1"),
        ("_:qs1", sh + "class", "iri", KG + "Good"),
        ("_:ps1", sh + "qualifiedMinCount", "literal", "1"),
        ("_:ps1", sh + "qualifiedMaxCount", "literal", "2"),
    ]
    qr = qualified_rules_from_shacl(_triples(spark, rows))
    got = [(r.target_class, r.path, r.q_class, r.q_datatype,
            r.q_min, r.q_max) for r in qr.collect()]
    assert got == [(KG + "Order", KG + "has", KG + "Good", None, 1, 2)]
    inst = _triples(spark, [
        ("o1", RDF_TYPE, "iri", KG + "Order"),
        ("o1", KG + "has", "iri", "b1"),
    ])
    v = qualified_shape_violations(inst, qr).collect()
    assert [(r.s, r.violation) for r in v] == [
        ("o1", "qualifiedMinCountViolation")]


def test_report_components_cover_qualified(spark):
    from openapi_to_rdf_spark.operators.shapes import (
        validation_report_triples)

    rules = _rules(spark, [
        (None, KG + "score", None, XSD + "integer", 1, None)])
    inst = _triples(spark, [
        ("s1", KG + "score", "literal", "x", XSD + "string")])
    rep = validation_report_triples(
        qualified_shape_violations(inst, rules)).collect()
    comps = {r.o for r in rep if r.p == SH + "sourceConstraintComponent"}
    assert comps == {SH + "QualifiedMinCountConstraintComponent"}


# ------------------------------------------------- sh:severity / sh:message

def test_severity_and_message_passthrough(spark):
    """Authored sh:severity/sh:message flow: rules pivot them,
    attach_severity joins them onto violations, and the report carries
    the declared severity plus BOTH messages."""
    from openapi_to_rdf_spark.operators.shapes import (
        attach_severity, shape_rules_from_shacl, validate_triples,
        validation_report_triples)

    sh = SH
    xsd = "http://www.w3.org/2001/XMLSchema#"
    shacl = _triples(spark, [
        ("shapeA", sh + "targetClass", "iri", KG + "Turn"),
        ("shapeA", sh + "property", "bnode", "ps1"),
        ("_:ps1", sh + "path", "iri", KG + "role"),
        ("_:ps1", sh + "datatype", "iri", xsd + "string"),
        ("_:ps1", sh + "severity", "iri", sh + "Warning"),
        ("_:ps1", sh + "message", "literal", "role must be a string"),
    ])
    rules = shape_rules_from_shacl(shacl)
    row = rules.collect()[0]
    assert row["severity"] == sh + "Warning"
    assert row["message"] == "role must be a string"

    inst = _triples(spark, [
        ("t1", RDF_TYPE, "iri", KG + "Turn"),
        ("t1", KG + "role", "literal", "5", xsd + "integer"),
        ("t1", KG + "other", "literal", "x"),     # unconstrained
    ])
    v = validate_triples(inst, rules)
    assert {r.violation for r in v.collect()} == {"datatypeMismatch"}
    sv = attach_severity(v, rules)
    got = sv.collect()
    assert [(r.severity, r.message) for r in got] == [
        (sh + "Warning", "role must be a string")]

    rep = validation_report_triples(sv).collect()
    sevs = {r.o for r in rep if r.p == sh + "resultSeverity"}
    msgs = {r.o for r in rep if r.p == sh + "resultMessage"}
    assert sevs == {sh + "Warning"}
    assert msgs == {"role must be a string",
                    "expected " + xsd + "string got " + xsd + "integer"}


def test_attach_severity_default(spark):
    from openapi_to_rdf_spark.operators.shapes import attach_severity

    v = spark.createDataFrame(
        [("s1", KG + "p", "o1", "datatypeMismatch", "d")],
        ["s", "p", "o", "violation", "detail"])
    rules = spark.createDataFrame(
        [("r", None, KG + "p")],
        "file string, target_class string, path string")
    got = attach_severity(v, rules).collect()[0]
    assert got.severity == SH + "Violation" and got.message is None
