"""Distributed N-Triples SOURCE (sources/ntriples.py): codegen parse,
escape round-trip with the sink, error quarantine, plan purity."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from openapi_to_rdf_spark.sources.ntriples import (  # noqa: E402
    RDF_LANGSTRING, XSD_STRING, ntriples_errors, parse_ntriples_lines,
    read_ntriples)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _lines(spark, *ls):
    return spark.createDataFrame([(line,) for line in ls], ["value"])


def test_parse_terms_and_datatypes(spark):
    rows = parse_ntriples_lines(_lines(
        spark,
        '<http://x/s> <http://x/p> <http://x/o> .',
        '_:b0 <http://x/p> _:b1 .',
        '<http://x/s> <http://x/p> "plain" .',
        f'<http://x/s> <http://x/p> "42"^^<{XSD}integer> .',
        '<http://x/s> <http://x/p> "hej"@sv .',
        '# a comment',
        '',
    )).collect()
    got = {(r.s, r.p, r.o_kind, r.o, r.o_datatype, r.o_lang) for r in rows}
    assert got == {
        ("http://x/s", "http://x/p", "iri", "http://x/o", None, None),
        ("_:b0", "http://x/p", "bnode", "_:b1", None, None),
        ("http://x/s", "http://x/p", "literal", "plain", XSD_STRING, None),
        ("http://x/s", "http://x/p", "literal", "42", XSD + "integer", None),
        ("http://x/s", "http://x/p", "literal", "hej", RDF_LANGSTRING, "sv"),
    }


def test_escape_roundtrip_with_sink(spark, tmp_path):
    """write_ntriples -> read_ntriples is the identity on the triple set,
    including every escape the sink can produce."""
    from openapi_to_rdf_spark.sinks import write_ntriples

    rows = [
        ("f", "kg", "http://x/s", "http://x/p",
         'say "hi"\nback\\slash\ttab\rcr', "literal", None),
        ("f", "kg", "http://x/s", "http://x/p", r"trap\n not a newline",
         "literal", None),
        ("f", "kg", "http://x/s", "http://x/p", "http://x/o", "iri", None),
        ("f", "kg", "_:b7", "http://x/p", "b8", "bnode", None),
        ("f", "kg", "http://x/s", "http://x/p", "3.5", "literal",
         XSD + "decimal"),
    ]
    df = spark.createDataFrame(
        rows, "file string, graph string, s string, p string, o string, "
              "o_kind string, o_datatype string")
    out = str(tmp_path / "nt")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    want = {(r[2], r[3],
             "b8" if r[5] == "bnode" else r[4],  # sink prefixes _: on write
             r[5], r[6] if r[6] else (XSD_STRING if r[5] == "literal"
                                      else None)) for r in rows}
    want = {(s, p, "_:b8" if k == "bnode" else o, k, d)
            for s, p, o, k, d in want}
    got = {(r.s, r.p, r.o, r.o_kind, r.o_datatype) for r in back.collect()}
    assert got == want


def test_parse_is_pure_codegen(spark):
    df = parse_ntriples_lines(_lines(spark, '<a> <b> <c> .'))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan


def test_errors_quarantine(spark):
    lines = _lines(
        spark,
        '<http://x/s> <http://x/p> "ok" .',
        'not a triple at all',
        '<http://x/s> missing-brackets <http://x/o> .',
        '# comment lines are NOT errors',
        '   ',
    )
    assert parse_ntriples_lines(lines).count() == 1
    errs = {r.line for r in ntriples_errors(lines).collect()}
    assert errs == {"not a triple at all",
                    "<http://x/s> missing-brackets <http://x/o> ."}


def test_kg_pipeline_graph_roundtrips_through_ntriples(spark, tmp_path):
    """The real extracted KG survives export+reparse as an exact triple
    set (wide schema, o_datatype normalized through xsd:string)."""
    from openapi_to_rdf_spark.operators.extract import (
        extract_transcript_triples)
    from openapi_to_rdf_spark.sinks import write_ntriples
    from openapi_to_rdf_spark.sources.transcripts import synth_transcripts

    turns = synth_transcripts(spark, n_convs=30, seed=11)
    kg = extract_transcript_triples(turns).select(
        "s", "p", "o", "o_kind", "o_datatype").dropDuplicates()
    out = str(tmp_path / "kg_nt")
    write_ntriples(kg, out)
    back = read_ntriples(spark, out).select(
        "s", "p", "o", "o_kind", "o_datatype")
    norm = F.when(F.col("o_kind") == "literal",
                  F.coalesce("o_datatype", F.lit(XSD_STRING)))
    a = {tuple(r) for r in kg.withColumn("o_datatype", norm).collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b and len(a) > 100
