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


# --------------------------------------------------------------------------
# Bipartite graph projections (document-term). Same join shapes as the KG
# co-mention queries above, but built from SQL-expressible extraction, so
# these two are EXACT-oracle-checked against DuckDB (unlike the transcript
# KG, whose synthetic generator is not ANSI-SQL-expressible).
# --------------------------------------------------------------------------

def doc_term_edges(docs: DataFrame, pattern: str, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc, term) bipartite edges: distinct pattern matches per document."""
    return (docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(
            F.expr(f"regexp_extract_all({text_col}, '{pattern}', 1)")))
        .alias("term")))


def term_co_mentions(edges: DataFrame) -> DataFrame:
    """Term pairs co-occurring in >=1 document, with document counts —
    the bipartite projection onto the term side. Self-equi-join on the doc
    key (high cardinality → well-distributed); map-side partial count."""
    return (edges.alias("a").join(edges.alias("b"), "doc")
            .filter(F.col("a.term") < F.col("b.term"))
            .groupBy(F.col("a.term").alias("term_a"),
                     F.col("b.term").alias("term_b"))
            .agg(F.count(F.lit(1)).alias("n_docs")))


def related_docs(edges: DataFrame, min_shared: int = 2) -> DataFrame:
    """Document pairs sharing >= min_shared distinct terms — the projection
    onto the doc side (2-hop doc→term→doc reachability with support).
    Self-equi-join on term; a hot term's posting list concentrates one
    reducer, so at corpus scale feed this a stop-listed edge set (drop
    terms with df above a cap — same skew trick as the dedup paths)."""
    return (edges.alias("a").join(edges.alias("b"), "term")
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
