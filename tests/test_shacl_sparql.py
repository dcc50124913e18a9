"""SHACL-SPARQL constraints (operators/shacl_sparql.py): SELECT-based
rules over the triple table, composing with the validation report."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.shacl_sparql import (  # noqa: E402
    sparql_constraint_violations)


def _graph(spark):
    rows = [
        ("t1", "kg:role", "tool"), ("t1", "kg:tool", "search"),
        ("t2", "kg:role", "tool"),                      # missing kg:tool
        ("t3", "kg:role", "user"),
        ("t4", "kg:mentions", "e1"), ("e1", "kg:linksTo", "reg1"),
        ("t5", "kg:mentions", "e2"),                    # unlinked entity
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"])


def test_constraints_fire_and_compose(spark):
    out = sparql_constraint_violations(_graph(spark), [
        ("tool-edge", "tool turns must carry a kg:tool edge", """
            SELECT ?this WHERE {
              ?this <kg:role> "tool" .
              FILTER NOT EXISTS { ?this <kg:tool> ?t }
            }"""),
        ("linked-mention", "mentioned entities must be registry-linked", """
            SELECT ?this ?value WHERE {
              ?this <kg:mentions> ?value .
              FILTER NOT EXISTS { ?value <kg:linksTo> ?r }
            }"""),
    ]).collect()
    got = {(r.s, r.o, r.violation) for r in out}
    assert got == {
        ("t2", None, "sparqlConstraint:tool-edge"),
        ("t5", "e2", "sparqlConstraint:linked-mention"),
    }
    assert all(r.detail for r in out)


def test_missing_this_projection_raises(spark):
    with pytest.raises(ValueError, match="must project"):
        sparql_constraint_violations(_graph(spark), [
            ("bad", "m", 'SELECT ?x WHERE { ?x <kg:role> "tool" }')])


def test_report_composition(spark):
    """Violations flow into validation_report_triples unchanged."""
    from openapi_to_rdf_spark.operators.shapes import (
        validation_report_triples)

    v = sparql_constraint_violations(_graph(spark), [
        ("tool-edge", "msg", """
            SELECT ?this WHERE {
              ?this <kg:role> "tool" .
              FILTER NOT EXISTS { ?this <kg:tool> ?t }
            }""")])
    report = validation_report_triples(v).collect()
    assert any(r.o.endswith("ValidationResult") for r in report)
    assert any(r.o == "t2" for r in report)
