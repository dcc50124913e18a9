"""Line-delimited flattened JSON-LD sink + source (sinks.write_jsonld /
sources/jsonld.py): deterministic one-node-per-line export, pure-codegen
parse, write->read round trips, and the quarantine view."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sinks import jsonld_node_lines, write_jsonld  # noqa: E402
from openapi_to_rdf_spark.sources.jsonld import (  # noqa: E402
    RDF_TYPE,
    XSD_STRING,
    jsonld_errors,
    parse_jsonld_lines,
    read_jsonld,
)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(spark, rows):
    """rows: (s, p, o_kind, o, o_datatype)"""
    return spark.createDataFrame(
        [("f", "kg", *r) for r in rows],
        "file string, graph string, s string, p string, o_kind string, "
        "o string, o_datatype string")


def _norm(df):
    """Triple identity modulo the documented plain<->xsd:string collapse."""
    return {(r.s, r.p, r.o_kind, r.o,
             (r.o_datatype or XSD_STRING) if r.o_kind == "literal" else None)
            for r in df.collect()}


def test_roundtrip_all_term_kinds(spark):
    rows = [
        ("e1", RDF_TYPE, "iri", "http://C1", None),
        ("e1", RDF_TYPE, "iri", "http://C2", None),
        ("e1", "http://p1", "literal", 'say "hi"\nback\\slash\ttab', None),
        ("e1", "http://p1", "literal", "42", XSD + "integer"),
        ("e1", "http://p2", "iri", "http://e2", None),
        ("e1", "http://p2", "bnode", "b7", None),
        ("_:b7", "http://p3", "literal", "x", XSD + "string"),
        ("e3", RDF_TYPE, "iri", "http://C1", None),   # types-only node
        ("e4", "http://p1", "literal", "y", None),    # no-type node
    ]
    t = _triples(spark, rows)
    assert _norm(parse_jsonld_lines(jsonld_node_lines(t))) == _norm(t)


def test_lines_are_valid_single_json_objects(spark):
    t = _triples(spark, [
        ("e1", "http://p", "literal", "two\nlines", None),
        ("e2", RDF_TYPE, "iri", "http://C", None),
    ])
    lines = [r.value for r in jsonld_node_lines(t).collect()]
    assert len(lines) == 2
    for ln in lines:
        assert "\n" not in ln
        obj = json.loads(ln)
        assert "@id" in obj


def test_deterministic_serialization(spark):
    rows = [("e1", "http://p", "literal", str(i), None) for i in range(20)]
    rows += [("e1", "http://q", "iri", f"http://n{i}", None)
             for i in range(5)]
    a = sorted(r.value for r in
               jsonld_node_lines(_triples(spark, rows)).collect())
    b = sorted(r.value for r in
               jsonld_node_lines(
                   _triples(spark, list(reversed(rows)))).collect())
    assert a == b


def test_file_roundtrip_extracted_kg(spark, tmp_path):
    from openapi_to_rdf_spark.operators.extract import (
        extract_transcript_triples)
    from openapi_to_rdf_spark.sources.transcripts import (
        class_vocab_df, synth_transcripts)

    kg = extract_transcript_triples(synth_transcripts(spark, 200),
                                    class_vocab_df(spark))
    out = str(tmp_path / "jld")
    write_jsonld(kg, out)
    back = read_jsonld(spark, out)
    assert _norm(back) == _norm(kg)


def test_errors_quarantine(spark):
    lines = spark.createDataFrame(
        [('{"@id": "ok", "http://p": [{"@value": "v"}]}',),
         ('{"@id": "ok2"}',),               # id-only node: valid, 0 triples
         ('{"no_id": true}',),              # missing @id
         ('{broken json',),                 # unparseable
         ("",), ("   ",)],                  # blank: not errors
        ["value"])
    errs = [r.line for r in jsonld_errors(lines).collect()]
    assert sorted(errs) == ['{"no_id": true}', "{broken json"]
    parsed = parse_jsonld_lines(lines)
    assert {(r.s, r.o) for r in parsed.collect()} == {("ok", "v")}


def test_foreign_numeric_value_tokens(spark):
    """Foreign docs carry raw JSON numbers/booleans in @value — captured
    as lexical text, treated as plain literals."""
    lines = spark.createDataFrame(
        [('{"@id": "n", "http://p": [{"@value": 42}, {"@value": true}]}',)],
        ["value"])
    got = {(r.o, r.o_datatype) for r in parse_jsonld_lines(lines).collect()}
    assert got == {("42", XSD_STRING), ("true", XSD_STRING)}
