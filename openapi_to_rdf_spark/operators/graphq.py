"""Graph-query operators over the materialized triple table — the access
patterns a KG consumer runs against the subject/predicate/object tables.

The triple table is predicate-partitioned (plans/pipeline.py), so every
operator here starts from a partition-pruned single-predicate scan; the
co-mention self-join shuffles only the mentions slice, salted implicitly by
turn IRI (high cardinality). For repeated analytics, write the mentions
slice bucketed by entity (see tests/test_bucketing.py) and these joins
become exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_mentions(graph: DataFrame, kg_ns: str) -> DataFrame:
    """(turn, ent) mention edges — single-predicate scan."""
    return (graph.filter(F.col("p") == kg_ns + "mentions")
            .select(F.col("s").alias("turn"), F.col("o").alias("ent")))


def co_mention_edges(graph: DataFrame, kg_ns: str) -> DataFrame:
    """Entity pairs co-mentioned in one turn, with co-occurrence counts.
    Self-equi-join on the turn IRI; count aggregation is map-side partial."""
    m = entity_mentions(graph, kg_ns)
    return (m.alias("a").join(m.alias("b"), "turn")
            .filter(F.col("a.ent") < F.col("b.ent"))
            .groupBy(F.col("a.ent").alias("ent_a"), F.col("b.ent").alias("ent_b"))
            .agg(F.count(F.lit(1)).alias("n_cooccur")))


def entity_degree(graph: DataFrame, kg_ns: str) -> DataFrame:
    """Mention count + distinct-turn count per canonical entity."""
    m = entity_mentions(graph, kg_ns)
    return (m.groupBy("ent")
            .agg(F.count(F.lit(1)).alias("n_mentions"),
                 F.countDistinct("turn").alias("n_turns")))


def class_histogram(graph: DataFrame) -> DataFrame:
    """Entities per rdfs/owl class — single-predicate scan of rdf:type."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    return (graph.filter(F.col("p") == rdf_type)
            .groupBy(F.col("o").alias("class_iri"))
            .agg(F.countDistinct("s").alias("n_entities")))
