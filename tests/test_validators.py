"""The reference's own test queries (completeness + semantic correctness,
reference tests/test_completeness.py and test_semantic_correctness.py)
re-expressed as DataFrame queries — and shown to return IDENTICAL results on
our converted corpus and on the reference's committed golden graphs: its own
test suite cannot distinguish our output from the reference's."""

import pathlib
import sys

import yaml
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from conftest import FIXTURE_DIR, GOLDEN_RDF, GOLDEN_SHACL, fixture_names  # noqa: E402

from openapi_to_rdf_spark.operators.validators import (  # noqa: E402
    completeness_report, semantic_report, syntax_report,
)


def _golden_triples_df(spark):
    """Golden .ttl files parsed into the engine's triple-table layout."""
    from openapi_to_rdf_spark.triplecore.turtle import parse_turtle

    rows = []
    for stem in fixture_names():
        fstem = stem.replace("-", "_")
        for graph, path in [("rdf", GOLDEN_RDF / f"{fstem}_rdf.ttl"),
                            ("shacl", GOLDEN_SHACL / f"{fstem}_shacl.ttl")]:
            for s, p, o in parse_turtle(path.read_text()):
                rows.append((f"{stem}.yaml", graph,
                             s[1] if s[0] == "i" else "_:" + s[1], p[1],
                             {"i": "iri", "b": "bnode", "l": "literal"}[o[0]],
                             o[1], o[2] if o[0] == "l" else None))
    return spark.createDataFrame(
        rows, "file string, graph string, s string, p string, o_kind string, "
              "o string, o_datatype string")


def _our_triples_df(spark):
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.sources.specs import spec_paths_df, with_content

    specs = with_content(spec_paths_df(spark, [str(FIXTURE_DIR)]))
    return convert_specs_df(specs)


def _schemas_df(spark):
    rows = []
    for p in sorted(FIXTURE_DIR.glob("*.yaml")):
        data = yaml.safe_load(p.read_text()) or {}
        for name in (data.get("components") or {}).get("schemas", {}) or {}:
            rows.append((p.name, name))
    return spark.createDataFrame(rows, ["file", "schema_name"])


def test_reference_test_suite_results_identical(spark):
    schemas = _schemas_df(spark).cache()
    ours = _our_triples_df(spark).localCheckpoint()
    golden = _golden_triples_df(spark).localCheckpoint()

    ours_comp = completeness_report(ours, schemas).orderBy("file")
    gold_comp = completeness_report(golden, schemas).orderBy("file")
    a = [(r.file, r.n_schemas, r.n_converted, r.missing) for r in ours_comp.collect()]
    b = [(r.file, r.n_schemas, r.n_converted, r.missing) for r in gold_comp.collect()]
    assert a == b

    ours_sem = {(r.file, r.iri, r.issue) for r in semantic_report(ours).collect()}
    gold_sem = {(r.file, r.iri, r.issue) for r in semantic_report(golden).collect()}
    assert ours_sem == gold_sem

    # the headline numbers the reference's run_tests.py would print
    tot = ours_comp.agg(F.sum("n_schemas").alias("s"),
                        F.sum("n_converted").alias("c")).collect()[0]
    assert (tot.s, tot.c) == (1801, 1769)  # 32 gaps = reference quirks §2.5
    by_issue = {r.issue: r.n for r in
                semantic_report(ours).groupBy("issue")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_issue.get("property_without_domain", 0) == 0
    assert by_issue.get("property_without_range", 0) == 0

    # --- syntax validator (reference tests/test_shacl_syntax.py) ---------
    ours_syn = {(r.file, r.severity, r.issue, r.detail)
                for r in syntax_report(ours).collect()}
    gold_syn = {(r.file, r.severity, r.issue, r.detail)
                for r in syntax_report(golden).collect()}
    assert ours_syn == gold_syn
    # no REAL leaks on either side: every 'error' is the reference regex's
    # known false positive on long enum literals (quoted_bnode_id matches
    # e.g. "NE_HARDWARE_ERROR_DELECTED"); true leaks (invalid_anonymous_id,
    # unbound namespace) are absent
    import re

    errors = {t for t in ours_syn if t[1] == "error"}
    assert {t[2] for t in errors} <= {"quoted_bnode_id"}
    # none of them is an actual rdflib-style leaked bnode label
    assert all(not re.fullmatch(r"N[a-f0-9]{32}", t[3]) for t in errors)
    # the reference's own sh:or_ quirk IS warned about (whitelist has sh:or
    # without underscore), matching its test's behavior on its own goldens
    or_warned = {t[0] for t in ours_syn
                 if t[2] == "potentially_invalid_shacl_property"
                 and t[3].endswith("#or_")}
    assert len(or_warned) > 0


def test_coverage_scores_mirror_reference_harness(spark):
    """run_tests.py's summary scores re-expressed: hand-built YAML with a
    known hole in each dimension — one unconverted schema name, one
    top-level property the graph lacks, one description dropped."""
    from openapi_to_rdf_spark.operators.validators import (
        coverage_scores, spec_inventory,
    )

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    ns = "http://x#"
    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      description: an alarm
      properties:
        severity: {type: string}
        count: {type: integer}
    Dangling-Schema:
      type: object
      description: never converted
      properties:
        ghost: {type: string}
"""
    specs = spark.createDataFrame([("a.yaml", yaml_text)],
                                  ["path", "content"])
    triples = spark.createDataFrame([
        ("a.yaml", "rdf", ns + "Alarm", rdf + "type", "iri",
         rdfs + "Class", None),
        ("a.yaml", "rdf", ns + "Alarm", rdfs + "comment", "literal",
         "an alarm", None),
        ("a.yaml", "rdf", ns + "severity", rdf + "type", "iri",
         rdf + "Property", None),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    r = coverage_scores(triples, spec_inventory(specs)).collect()[0]
    assert r.schema_pct == 50.0        # Alarm yes, Dangling_Schema no
    # severity converted; count + ghost not: 1 of 3
    assert r.property_pct == 33.3
    assert r.description_pct == 50.0   # Alarm commented, Dangling not
    assert r.grade == "POOR"


def test_coverage_scores_on_reference_fixture_parity(spark):
    """On the reference's own HeartbeatNtf fixture the scores must
    reproduce the reference harness's OWN quirks: schema 100 (all three
    schemas emit classes), property 0 (its validator only reads
    TOP-LEVEL `properties:`, and this file nests them in allOf — so the
    yaml set is empty → the reference's zero-denominator 0 branch)."""
    import pathlib

    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.validators import (
        coverage_scores, spec_inventory,
    )

    src = pathlib.Path("/root/reference/assets/MnS-Rel-19-OpenAPI/"
                       "OpenAPI/TS28532_HeartbeatNtf.yaml")
    specs = spark.createDataFrame([(src.name, src.read_text())],
                                  ["path", "content"])
    r = coverage_scores(convert_specs_df(specs),
                        spec_inventory(specs)).collect()[0]
    assert r.schema_pct == 100.0
    assert r.property_pct == 0.0
    assert r.description_pct == 100.0


def test_cli_validate_subcommand(spark, capsys):
    from openapi_to_rdf_spark.cli import main

    rc = main(["validate",
               "/root/reference/assets/MnS-Rel-19-OpenAPI/OpenAPI/"
               "TS28623_ComDefs.yaml"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "TS28623_ComDefs.yaml" in out and "[EXCELLENT]" in out
    assert "overall 100.0%" in out
