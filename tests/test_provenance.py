"""PROV-O lineage triples (plans/provenance.py): manifests -> queryable
provenance subgraph, consistent with the real pipeline's manifest layout."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.plans.provenance import (  # noqa: E402
    KG_NS, PROV, RDF_TYPE, prov_triples)


def _mani(fp, rows, lineage=None, stage_extra=None):
    m = {"fingerprint": fp, "snapshot": f"snap-{fp}",
         "committed_at": "2026-08-20T00:00:00Z", "wall_seconds": 1.5,
         "metrics": {"rows": rows}, "lineage": lineage or {}}
    m.update(stage_extra or {})
    return m


def test_prov_graph_structure(spark):
    manifests = {
        "transcripts": _mani("aaa", 100, {"part-0.parquet": 100}),
        "extract": _mani("bbb", 500, {"part-0.parquet": 300,
                                      "part-1.parquet": 200}),
    }
    g = prov_triples(spark, manifests)
    got = {(r.s, r.p, r.o) for r in g.collect()}
    assert ("urn:prov:activity:bbb", RDF_TYPE, PROV + "Activity") in got
    assert ("urn:prov:snapshot:bbb", PROV + "wasGeneratedBy",
            "urn:prov:activity:bbb") in got
    # DAG edge: extract used the transcripts snapshot
    assert ("urn:prov:activity:bbb", PROV + "used",
            "urn:prov:snapshot:aaa") in got
    # per-file lineage members with row counts
    assert ("urn:prov:snapshot:bbb", PROV + "hadMember",
            "urn:prov:file:bbb/part-1.parquet") in got
    assert ("urn:prov:file:bbb/part-1.parquet", KG_NS + "rowCount",
            "200") in got
    # absent upstreams are skipped, not broken IRIs
    assert not any(o == "urn:prov:snapshot:None" for _, _, o in got)


def test_prov_from_real_pipeline_and_sparql(spark, tmp_path):
    """End to end: run the mini pipeline, emit PROV from its manifests, and
    answer a lineage question over the subgraph with the SPARQL front-end."""
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.sparql import sparql_query

    res = run_pipeline(spark, tmp_path / "wd", n_convs=40, seed=7)
    g = prov_triples(spark, res)
    assert g.count() > 0
    rows = sparql_query(g, """
        SELECT ?stage ?rows WHERE {
          ?act <http://www.w3.org/2000/01/rdf-schema#label> ?stage .
          ?snap <http://www.w3.org/ns/prov#wasGeneratedBy> ?act .
          ?snap <http://ericsson.com/models/3gpp/kg#rowCount> ?rows .
        }""").collect()
    stages = {r["stage"] for r in rows}
    assert {"transcripts", "extract", "graph"} <= stages
    # every recorded row count is a non-negative integer literal
    assert all(int(r["rows"]) >= 0 for r in rows)
    # lineage file members sum to the stage row count for the graph stage
    gm = res["graph"]
    assert sum(gm["lineage"].values()) == gm["metrics"]["rows"]
