"""R2RML-lite table->RDF lifting (operators/r2rml.py): templates, NULL
semantics, datatypes, join-free FK references, plan shape."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from openapi_to_rdf_spark.operators.r2rml import (  # noqa: E402
    RDF_TYPE, XSD, PredicateMap, iri_template, table_to_triples,
    tables_to_triples)


def test_iri_template_compiles_mixed_parts(spark):
    df = spark.createDataFrame([(7, "a")], ["k", "t"])
    out = df.select(iri_template("urn:x:{k}/{t}#end").alias("s")).first()
    assert out["s"] == "urn:x:7/a#end"


def test_table_to_triples_basic_and_null_suppression(spark):
    df = spark.createDataFrame(
        [(1, "alice", 30), (2, None, 40)],
        "id int, name string, age int")
    rows = table_to_triples(
        df, "urn:p:{id}",
        [PredicateMap("kg:name", column="name"),
         PredicateMap("kg:age", column="age", datatype=XSD + "integer"),
         PredicateMap("kg:homepage", template="http://ex/{name}")],
        class_iri="kg:Person").collect()
    got = {(r.s, r.p, r.o_kind, r.o, r.o_datatype) for r in rows}
    assert ("urn:p:1", RDF_TYPE, "iri", "kg:Person", None) in got
    assert ("urn:p:1", "kg:name", "literal", "alice", None) in got
    assert ("urn:p:1", "kg:age", "literal", "30", XSD + "integer") in got
    assert ("urn:p:1", "kg:homepage", "iri", "http://ex/alice", None) in got
    # NULL name suppresses BOTH the literal and the templated IRI (R2RML
    # NULL semantics), but id-derived triples still emit
    p2 = {(r.p, r.o) for r in rows if r.s == "urn:p:2"}
    assert p2 == {(RDF_TYPE, "kg:Person"), ("kg:age", "40")}


def test_fk_reference_is_join_free_and_plan_is_narrow(spark):
    orders = spark.createDataFrame([(10, 1), (11, 2)], "oid int, cust int")
    t = table_to_triples(
        orders, "urn:o:{oid}",
        [PredicateMap("kg:customer", template="urn:p:{cust}")])
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert {(r.s, r.o) for r in t.collect()} == {
        ("urn:o:10", "urn:p:1"), ("urn:o:11", "urn:p:2")}


def test_predicate_map_validates_exclusive_args():
    import pytest
    with pytest.raises(ValueError):
        PredicateMap("kg:x", column="a", template="b").object_struct()
    with pytest.raises(ValueError):
        PredicateMap("kg:x").object_struct()


def test_tables_to_triples_composes_with_validation(spark):
    """The whole-database mapping emits the wide schema, so the SHACL
    validator runs on it unchanged — a datatype-violating mapped value is
    flagged like any extracted triple."""
    from openapi_to_rdf_spark.operators.shapes import validate_triples

    people = spark.createDataFrame([(1, "x")], "id int, v string")
    t = tables_to_triples([
        (people, "urn:p:{id}",
         [PredicateMap("kg:count", column="v",
                       datatype=XSD + "integer")], "kg:Person"),
    ])
    rules = spark.createDataFrame(
        [("r", None, "kg:count", XSD + "integer", None, None, None, None,
          None)],
        "file string, target_class string, path string, datatype string, "
        "min_count int, max_count int, in_values array<string>, "
        "node_kind string, pattern string")
    # declared datatype matches the rule -> no datatype violation
    v = validate_triples(t, rules).collect()
    assert not any(r.violation == "datatypeMismatch" for r in v)
    # a WRONG declared datatype on the mapped literal is flagged
    t2 = tables_to_triples([
        (people, "urn:p:{id}",
         [PredicateMap("kg:count", column="v",
                       datatype=XSD + "string")], "kg:Person"),
    ])
    v2 = validate_triples(t2, rules).collect()
    assert any(r.violation == "datatypeMismatch" for r in v2)


def test_bag_vs_set_semantics(spark):
    df = spark.createDataFrame([(1,), (1,)], "id int")
    pm = [PredicateMap("kg:self", template="urn:p:{id}")]
    assert table_to_triples(df, "urn:p:{id}", pm).count() == 2
    assert table_to_triples(df, "urn:p:{id}", pm, distinct=True).count() == 1
