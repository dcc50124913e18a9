"""The reference's own test queries re-expressed as DataFrame queries.

Reference tests/ run SPARQL validators over the converted graphs
(tests/test_completeness.py:37-74,121-148 — schema↔class and
property↔rdf:Property coverage; tests/test_semantic_correctness.py:49-104 —
every property has domain+range, every class has a NodeShape with matching
sh:targetClass). Here the same checks are anti-joins/aggregations over the
triple DataFrame, so they run distributed over any corpus size.

A user of the reference can run the equivalent of its whole test suite with
``completeness_report`` + ``semantic_report``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SH = "http://www.w3.org/ns/shacl#"


def _local(col):
    return F.regexp_extract(col, r"([^#/]+)$", 1)


def completeness_report(triples: DataFrame, schemas: DataFrame) -> DataFrame:
    """Schema↔class coverage per file (reference test_completeness.py:37-74).

    schemas: (file, schema_name) — the YAML side, e.g. from the parsed specs.
    Names are normalized dash→underscore like the converter
    (format_name, shacl_converter.py:940-943).
    """
    classes = (triples.filter((F.col("graph") == "rdf")
                              & (F.col("p") == RDF + "type")
                              & (F.col("o") == RDFS + "Class"))
               .select("file", _local(F.col("s")).alias("name"))
               .withColumn("converted", F.lit(True)))
    expected = schemas.select(
        "file", F.regexp_replace("schema_name", "-", "_").alias("name"))
    joined = expected.join(classes, ["file", "name"], "left")
    return (joined.groupBy("file")
            .agg(F.count(F.lit(1)).alias("n_schemas"),
                 F.count("converted").alias("n_converted"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("converted").isNull(), F.col("name"))))
                 .alias("missing"))
            .withColumn("coverage_pct",
                        F.round(F.col("n_converted") * 100.0 / F.col("n_schemas"), 2)))


def semantic_report(triples: DataFrame) -> DataFrame:
    """W3C-compliance checks (reference test_semantic_correctness.py:49-104):
    properties lacking rdfs:domain or rdfs:range; classes lacking a NodeShape
    with matching sh:targetClass. Returns one row per violation."""
    rdf_g = triples.filter(F.col("graph") == "rdf")
    shacl_g = triples.filter(F.col("graph") == "shacl")

    props = (rdf_g.filter((F.col("p") == RDF + "type") & (F.col("o") == RDF + "Property"))
             .select("file", F.col("s").alias("iri")))
    domains = rdf_g.filter(F.col("p") == RDFS + "domain") \
        .select("file", F.col("s").alias("iri")).distinct()
    ranges = rdf_g.filter(F.col("p") == RDFS + "range") \
        .select("file", F.col("s").alias("iri")).distinct()

    no_domain = (props.join(domains, ["file", "iri"], "left_anti")
                 .select("file", "iri", F.lit("property_without_domain").alias("issue")))
    no_range = (props.join(ranges, ["file", "iri"], "left_anti")
                .select("file", "iri", F.lit("property_without_range").alias("issue")))

    classes = (rdf_g.filter((F.col("p") == RDF + "type") & (F.col("o") == RDFS + "Class"))
               .select("file", F.col("s").alias("iri")))
    targeted = (shacl_g.filter(F.col("p") == SH + "targetClass")
                .select("file", F.col("o").alias("iri")).distinct())
    no_shape = (classes.join(targeted, ["file", "iri"], "left_anti")
                .select("file", "iri", F.lit("class_without_nodeshape").alias("issue")))

    return no_domain.unionByName(no_range).unionByName(no_shape)
