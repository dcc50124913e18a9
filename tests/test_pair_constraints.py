"""SHACL property-pair constraints (shapes.pair_constraint_violations):
sh:equals / sh:disjoint / sh:lessThan / sh:lessThanOrEquals per SHACL core
§4.5, plus pair_rules_from_shacl extraction off an authored shapes graph."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.shapes import (  # noqa: E402
    RDF_TYPE,
    SH,
    pair_constraint_violations,
    pair_rules_from_shacl,
)

KG = "http://ericsson.com/models/3gpp/kg#"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _triples(spark, rows):
    """rows: (s, p, o_kind, o[, o_datatype])"""
    full = [r if len(r) == 5 else (*r, None) for r in rows]
    return spark.createDataFrame(
        [("f", "kg", s, p, k, o, dt) for s, p, k, o, dt in full],
        "file string, graph string, s string, p string, o_kind string, "
        "o string, o_datatype string")


def _rules(spark, rows):
    """rows: (target_class, path, pair_kind, other_path)"""
    return spark.createDataFrame(
        [("r", *r) for r in rows],
        "file string, target_class string, path string, pair_kind string, "
        "other_path string")


def test_equals_both_directions(spark):
    rules = _rules(spark, [(None, KG + "ship", "equals", KG + "bill")])
    rows = [
        ("ok", KG + "ship", "literal", "addr1"),
        ("ok", KG + "bill", "literal", "addr1"),
        ("v1", KG + "ship", "literal", "addr1"),       # missing from bill
        ("v2", KG + "bill", "literal", "addr2"),       # missing from ship
        ("v3", KG + "ship", "literal", "a"),
        ("v3", KG + "ship", "literal", "b"),           # extra on ship
        ("v3", KG + "bill", "literal", "a"),
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    got = {(r.s, r.o) for r in v}
    assert got == {("v1", "addr1"), ("v2", "addr2"), ("v3", "b")}
    assert all(r.violation == "pairNotEqual" for r in v)


def test_equals_datatype_sensitive(spark):
    # "5"^^xsd:integer != plain "5": value identity includes the datatype
    rules = _rules(spark, [(None, KG + "a", "equals", KG + "b")])
    rows = [
        ("x", KG + "a", "literal", "5", XSD_INT),
        ("x", KG + "b", "literal", "5"),
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    assert len(v) == 2  # each side's value missing from the other


def test_disjoint(spark):
    rules = _rules(spark, [(None, KG + "alias", "disjoint", KG + "name")])
    rows = [
        ("ok", KG + "alias", "literal", "bob"),
        ("ok", KG + "name", "literal", "robert"),
        ("bad", KG + "alias", "literal", "ann"),
        ("bad", KG + "name", "literal", "ann"),        # shared value
        ("bad", KG + "alias", "literal", "annie"),     # not shared — fine
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    assert {(r.s, r.p, r.o, r.violation) for r in v} == {
        ("bad", KG + "alias", "ann", "pairNotDisjoint")}


def test_less_than_numeric_and_string(spark):
    rules = _rules(spark, [
        (None, KG + "startIdx", "lessThan", KG + "endIdx"),
        (None, KG + "startDay", "lessThanOrEquals", KG + "endDay"),
    ])
    rows = [
        # numeric compare: 9 < 10 ok even though "9" > "10" lexically
        ("ok", KG + "startIdx", "literal", "9", XSD_INT),
        ("ok", KG + "endIdx", "literal", "10", XSD_INT),
        ("bad", KG + "startIdx", "literal", "7", XSD_INT),
        ("bad", KG + "endIdx", "literal", "7", XSD_INT),   # not strict
        # string compare for non-numeric literals (ISO dates sort right)
        ("ok", KG + "startDay", "literal", "2024-01-01"),
        ("ok", KG + "endDay", "literal", "2024-01-01"),    # <= holds
        ("bad2", KG + "startDay", "literal", "2024-02-01"),
        ("bad2", KG + "endDay", "literal", "2024-01-01"),
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    got = {(r.s, r.violation) for r in v}
    assert got == {("bad", "pairNotLessThan"),
                   ("bad2", "pairNotLessThanOrEquals")}


def test_less_than_incomparable_iri_violates(spark):
    rules = _rules(spark, [(None, KG + "a", "lessThan", KG + "b")])
    rows = [
        ("x", KG + "a", "iri", "http://n1"),
        ("x", KG + "b", "literal", "zzz"),
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    assert [(r.s, r.violation) for r in v] == [("x", "pairNotLessThan")]


def test_class_scoping(spark):
    # the rule is scoped to kg:Span: untyped (or differently-typed)
    # subjects never enter the check
    rules = _rules(spark, [
        (KG + "Span", KG + "startIdx", "lessThan", KG + "endIdx")])
    rows = [
        ("t", RDF_TYPE, "iri", KG + "Span"),
        ("t", KG + "startIdx", "literal", "5", XSD_INT),
        ("t", KG + "endIdx", "literal", "3", XSD_INT),     # fires
        ("u", KG + "startIdx", "literal", "5", XSD_INT),   # untyped: skip
        ("u", KG + "endIdx", "literal", "3", XSD_INT),
    ]
    v = pair_constraint_violations(_triples(spark, rows), rules).collect()
    assert {r.s for r in v} == {"t"}


def test_no_pairing_across_subjects(spark):
    # values never compare across focus nodes
    rules = _rules(spark, [(None, KG + "a", "lessThan", KG + "b")])
    rows = [
        ("s1", KG + "a", "literal", "9", XSD_INT),
        ("s2", KG + "b", "literal", "1", XSD_INT),   # other subject
    ]
    assert pair_constraint_violations(
        _triples(spark, rows), rules).collect() == []


def test_pair_rules_from_shacl(spark):
    """Extraction: an authored shapes graph (as the Turtle source would
    produce) yields the relational pair-rules table."""
    sh = SH
    rows = [
        ("shapeA", sh + "targetClass", "iri", KG + "Span"),
        ("shapeA", sh + "property", "bnode", "ps1"),
        ("_:ps1", sh + "path", "iri", KG + "startIdx"),
        ("_:ps1", sh + "lessThan", "iri", KG + "endIdx"),
        ("shapeA", sh + "property", "bnode", "ps2"),
        ("_:ps2", sh + "path", "iri", KG + "shipTo"),
        ("_:ps2", sh + "equals", "iri", KG + "billTo"),
        # a plain property shape without pair constraints: not extracted
        ("shapeA", sh + "property", "bnode", "ps3"),
        ("_:ps3", sh + "path", "iri", KG + "name"),
        ("_:ps3", sh + "datatype", "iri",
         "http://www.w3.org/2001/XMLSchema#string"),
    ]
    shacl = _triples(spark, rows)
    got = {(r.target_class, r.path, r.pair_kind, r.other_path)
           for r in pair_rules_from_shacl(shacl).collect()}
    assert got == {
        (KG + "Span", KG + "startIdx", "lessThan", KG + "endIdx"),
        (KG + "Span", KG + "shipTo", "equals", KG + "billTo"),
    }
    # end-to-end: extracted rules drive validation
    inst = _triples(spark, [
        ("t", RDF_TYPE, "iri", KG + "Span"),
        ("t", KG + "startIdx", "literal", "5", XSD_INT),
        ("t", KG + "endIdx", "literal", "3", XSD_INT),
        ("t", KG + "shipTo", "literal", "addr"),
        ("t", KG + "billTo", "literal", "addr"),
    ])
    v = pair_constraint_violations(inst, pair_rules_from_shacl(shacl)).collect()
    assert {(r.s, r.p, r.violation) for r in v} == {
        ("t", KG + "startIdx", "pairNotLessThan")}


def test_report_components_cover_pair_violations(spark):
    from openapi_to_rdf_spark.operators.shapes import (
        validation_report_triples)

    rules = _rules(spark, [(None, KG + "a", "disjoint", KG + "b")])
    rows = [("x", KG + "a", "literal", "v"), ("x", KG + "b", "literal", "v")]
    v = pair_constraint_violations(_triples(spark, rows), rules)
    rep = validation_report_triples(v).collect()
    comps = {r.o for r in rep if r.p == SH + "sourceConstraintComponent"}
    assert comps == {SH + "DisjointConstraintComponent"}
