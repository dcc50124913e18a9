"""SHACL-AF sh:TripleRule inference (operators/shaclaf)."""

import pyspark.sql.functions as F  # noqa: F401
import pytest

from openapi_to_rdf_spark.operators.shaclaf import (
    SH, SH_THIS, infer_fixpoint, infer_triple_rules, triple_rules_from_shacl,
)

KG = "http://example.com/kg#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"

COLS = ["s", "p", "o_kind", "o", "o_datatype"]


def tdf(spark, rows):
    return spark.createDataFrame(
        [(s, p, k, o, dt) for s, p, k, o, dt in rows],
        "s string, p string, o_kind string, o string, o_datatype string")


@pytest.fixture(scope="module")
def shapes(spark):
    r = []
    # R1: every Person is an Agent (constant-object class inference)
    r += [("PersonShape", SH + "targetClass", "iri", KG + "Person", None),
          ("PersonShape", SH + "rule", "bnode", "r1", None),
          ("_:r1", RDF_TYPE, "iri", SH + "TripleRule", None),
          ("_:r1", SH + "subject", "iri", SH_THIS, None),
          ("_:r1", SH + "predicate", "iri", RDF_TYPE, None),
          ("_:r1", SH + "object", "iri", KG + "Agent", None)]
    # R2: affiliatedWith := values of worksFor (path object)
    r += [("PersonShape", SH + "rule", "bnode", "r2", None),
          ("_:r2", RDF_TYPE, "iri", SH + "TripleRule", None),
          ("_:r2", SH + "subject", "iri", SH_THIS, None),
          ("_:r2", SH + "predicate", "iri", KG + "affiliatedWith", None),
          ("_:r2", SH + "object", "bnode", "o2", None),
          ("_:o2", SH + "path", "iri", KG + "worksFor", None)]
    # R3: Persons with status "active" are eligible (condition guard)
    r += [("EligShape", SH + "targetClass", "iri", KG + "Person", None),
          ("EligShape", SH + "condition", "bnode", "c1", None),
          ("_:c1", SH + "property", "bnode", "p1", None),
          ("_:p1", SH + "path", "iri", KG + "status", None),
          ("_:p1", SH + "hasValue", "literal", "active", None),
          ("EligShape", SH + "rule", "bnode", "r3", None),
          ("_:r3", RDF_TYPE, "iri", SH + "TripleRule", None),
          ("_:r3", SH + "subject", "iri", SH_THIS, None),
          ("_:r3", SH + "predicate", "iri", KG + "eligible", None),
          ("_:r3", SH + "object", "literal", "true", XSD_BOOL)]
    return r


@pytest.fixture(scope="module")
def data(spark):
    a, b = KG + "alice", KG + "bob"
    return tdf(spark, [
        (a, RDF_TYPE, "iri", KG + "Person", None),
        (b, RDF_TYPE, "iri", KG + "Person", None),
        (KG + "carol", RDF_TYPE, "iri", KG + "Org", None),
        (a, KG + "worksFor", "iri", KG + "acme", None),
        (a, KG + "worksFor", "iri", KG + "beta", None),
        (b, KG + "worksFor", "iri", KG + "acme", None),
        (a, KG + "status", "literal", "active", None),
        (b, KG + "status", "literal", "inactive", None),
        # pre-existing inference: must NOT come back out
        (b, RDF_TYPE, "iri", KG + "Agent", None),
    ])


def test_harvest(spark, shapes):
    rules = triple_rules_from_shacl(tdf(spark, shapes))
    assert len(rules) == 3
    kinds = sorted(r["object_kind"] for r in rules)
    assert kinds == ["const", "const", "path"]
    guarded = [r for r in rules if r["cond_path"]]
    assert len(guarded) == 1
    assert guarded[0]["cond_value"] == "active"


def test_single_pass_inference(spark, shapes, data):
    new = {tuple(r) for r in
           infer_triple_rules(data, tdf(spark, shapes))
           .select(*COLS).collect()}
    a, b = KG + "alice", KG + "bob"
    assert new == {
        (a, RDF_TYPE, "iri", KG + "Agent", None),        # bob's exists
        (a, KG + "affiliatedWith", "iri", KG + "acme", None),
        (a, KG + "affiliatedWith", "iri", KG + "beta", None),
        (b, KG + "affiliatedWith", "iri", KG + "acme", None),
        (a, KG + "eligible", "literal", "true", XSD_BOOL),  # guarded
    }


def test_no_rules_is_empty(spark, data):
    empty_shapes = tdf(spark, [])
    assert infer_triple_rules(data, empty_shapes).count() == 0


def test_fixpoint_rules_feed_rules(spark, shapes, data):
    # Agents (including R1-inferred ones) get a badge — needs round 2
    chained = shapes + [
        ("AgentShape", SH + "targetClass", "iri", KG + "Agent", None),
        ("AgentShape", SH + "rule", "bnode", "r4", None),
        ("_:r4", RDF_TYPE, "iri", SH + "TripleRule", None),
        ("_:r4", SH + "subject", "iri", SH_THIS, None),
        ("_:r4", SH + "predicate", "iri", KG + "badge", None),
        ("_:r4", SH + "object", "literal", "y", None)]
    shacl = tdf(spark, chained)
    one_pass = infer_triple_rules(data, shacl)
    # single pass only badges bob (already an Agent)
    assert one_pass.filter("p like '%badge'").count() == 1
    full = infer_fixpoint(data, shacl)
    badged = {r.s for r in full.filter("p like '%badge'").collect()}
    assert badged == {KG + "alice", KG + "bob"}
    # fixpoint is idempotent and a superset of the input
    # 1 Agent + 3 affiliatedWith + 1 eligible + 2 badges
    assert full.count() == data.count() + 7
    assert infer_triple_rules(full, shacl).count() == 0
