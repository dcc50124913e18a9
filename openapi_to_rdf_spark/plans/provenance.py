"""W3C PROV-O provenance emission over the pipeline's snapshot manifests.

north_rule requires "per-partition lineage + metrics written alongside each
Iceberg snapshot" — plans.snapshot records that as manifest JSON. This
module lifts those sidecars INTO the graph as PROV-O triples, so lineage is
queryable with the same SPARQL/BGP surface as the data it describes
("which activity generated this snapshot", "which inputs did the graph
stage use", "row counts per output file") and exports through the
Turtle/N-Triples sinks like any other subgraph.

Model (PROV-O core):

    urn:prov:activity:<fp>  a prov:Activity ;
        rdfs:label "<stage>" ; prov:endedAtTime "<committed_at>" ;
        kg:wallSeconds "<sec>" ; prov:used <upstream snapshot entity>* .
    urn:prov:snapshot:<fp>  a prov:Entity ;
        prov:wasGeneratedBy urn:prov:activity:<fp> ;
        prov:atLocation "snap-<fp>" ; kg:rowCount "<rows>" ;
        prov:hadMember urn:prov:file:<fp>/<path>* .
    urn:prov:file:<fp>/<path>  a prov:Entity ; kg:rowCount "<rows>" .

Scale note: manifests are per-stage JSON sidecars — vocabulary-sized by
construction (one per snapshot, one lineage row per output FILE, not per
data row), so building the triple rows driver-side and parallelizing the
result is the right plan at any corpus size; the 10^12-row instance data
is never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
XSD = "http://www.w3.org/2001/XMLSchema#"
KG_NS = "http://ericsson.com/models/3gpp/kg#"

# the run_pipeline stage DAG (plans/pipeline.py docstring): stage -> upstreams
PIPELINE_DAG: dict[str, list[str]] = {
    "extract": ["transcripts"],
    "entities": ["extract"],
    "canonical_map": ["entities"],
    "graph": ["extract", "canonical_map"],
    "violations": ["graph"],
    "coref": ["extract", "canonical_map"],
    "links": ["canonical_map"],
    "provenance": ["transcripts"],
    "entailed": ["graph"],
}

TRIPLES_DDL = ("file string, graph string, s string, p string, "
               "o_kind string, o string, o_datatype string")


def prov_triples(spark: SparkSession, manifests: dict[str, dict],
                 dag: dict[str, list[str]] | None = None,
                 file: str = "prov", graph: str = "prov") -> DataFrame:
    """run_pipeline's ``manifests`` dict -> PROV-O triples (wide schema).

    ``dag`` maps stage name -> upstream stage names (defaults to the
    run_pipeline DAG); upstream edges whose stage is absent from
    ``manifests`` are skipped, so partial pipelines emit consistent PROV.
    """
    dag = PIPELINE_DAG if dag is None else dag
    rows: list[tuple] = []

    def t(s, p, o_kind, o, dt=None):
        rows.append((file, graph, s, p, o_kind, o, dt))

    for stage in sorted(manifests):
        m = manifests[stage]
        fp = m["fingerprint"]
        act, ent = f"urn:prov:activity:{fp}", f"urn:prov:snapshot:{fp}"
        t(act, RDF_TYPE, "iri", PROV + "Activity")
        t(act, RDFS_LABEL, "literal", stage)
        if m.get("committed_at"):
            t(act, PROV + "endedAtTime", "literal", m["committed_at"],
              XSD + "dateTime")
        if m.get("wall_seconds") is not None:
            t(act, KG_NS + "wallSeconds", "literal",
              str(m["wall_seconds"]), XSD + "decimal")
        t(ent, RDF_TYPE, "iri", PROV + "Entity")
        t(ent, PROV + "wasGeneratedBy", "iri", act)
        t(ent, PROV + "atLocation", "literal",
          m.get("snapshot", f"snap-{fp}"))
        rows_n = (m.get("metrics") or {}).get("rows")
        if rows_n is not None:
            t(ent, KG_NS + "rowCount", "literal", str(rows_n),
              XSD + "integer")
        for up in dag.get(stage, []):
            if up in manifests:
                t(act, PROV + "used", "iri",
                  f"urn:prov:snapshot:{manifests[up]['fingerprint']}")
        for path in sorted((m.get("lineage") or {})):
            fent = f"urn:prov:file:{fp}/{path}"
            t(ent, PROV + "hadMember", "iri", fent)
            t(fent, RDF_TYPE, "iri", PROV + "Entity")
            t(fent, KG_NS + "rowCount", "literal",
              str(m["lineage"][path]), XSD + "integer")
    return spark.createDataFrame(rows, TRIPLES_DDL)
