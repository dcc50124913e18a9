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


def pmi_relations(edges: DataFrame, container_col: str = "doc",
                  item_col: str = "term", min_pairs: int = 2) -> DataFrame:
    """PMI/NPMI-weighted co-occurrence relations — the statistical
    relation-mining step of KG construction: which co-mentioned pairs are
    ASSOCIATED (co-occur more than their marginals predict) rather than
    merely both frequent.

    Input: bipartite (container, item) edges — turn→entity mentions
    (entity_mentions) or doc→term (doc_term_edges). Output per surviving
    pair (item_a < item_b):

    - n_ab: distinct containers holding both,
    - pmi_e6:  round(ln(n_ab·N / (n_a·n_b)), 6)·1e6 as BIGINT,
    - npmi_e6: PMI normalized by -ln(n_ab/N) into [-1, 1] (1e6-scaled;
      exactly-always-co-occurring pairs pin to 1.0 rather than 0/0).

    Scale shape: everything runs on DISTINCT edges, so counts are container
    counts, never mention counts. The pair join is the same container
    self-equi-join as co_mention_edges (high-cardinality key, map-side
    partial counts); pairs are pruned to n_ab >= min_pairs BEFORE the
    marginal joins, and the marginal table (one row per item, vocab-sized)
    is joined twice — AQE broadcasts it when small. N arrives as a
    broadcast 1-row cross join, not a driver collect. Hot items (stop-words
    / hub entities) should be stop-listed upstream exactly as related_docs
    documents — PMI of a hub is near-zero anyway.
    """
    e = (edges.select(F.col(container_col).alias("c"),
                      F.col(item_col).alias("i"))
         .dropDuplicates())
    total = e.agg(F.countDistinct("c").alias("n_total"))
    marg = e.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))

    pairs = (e.alias("a").join(e.alias("b"), "c")
             .filter(F.col("a.i") < F.col("b.i"))
             .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_pairs))

    scored = (pairs
              .join(marg.select(F.col("i").alias("item_a"),
                                F.col("n_i").alias("n_a")), "item_a")
              .join(marg.select(F.col("i").alias("item_b"),
                                F.col("n_i").alias("n_b")), "item_b")
              .crossJoin(F.broadcast(total)))
    pmi = F.log(F.col("n_ab") * F.col("n_total") / (F.col("n_a") * F.col("n_b")))
    denom = -F.log(F.col("n_ab") / F.col("n_total"))
    npmi = F.when(denom == 0, F.lit(1.0)).otherwise(pmi / denom)

    def e6(col):
        return F.round(F.round(col, 6) * 1e6).cast("long")

    return scored.select("item_a", "item_b", "n_ab",
                         e6(pmi).alias("pmi_e6"), e6(npmi).alias("npmi_e6"))


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


def graph_asof(changelog: DataFrame, at, s_col: str = "s",
               p_col: str = "p", o_col: str = "o", op_col: str = "op",
               ts_col: str = "ts") -> DataFrame:
    """Triple-level time travel: given a triple CHANGELOG (s, p, o, op,
    ts) with op ∈ {'I','D'}, reconstruct the graph as of instant ``at`` —
    a triple is present iff its latest event at-or-before ``at`` is an
    insert. The temporal companion of plans/snapshot time travel: that
    reads a materialized snapshot, this derives any instant from the
    event log (CDC feeds, retraction streams).

    Pinned semantics: events strictly after ``at`` are invisible; at an
    exact (s, p, o, ts) tie the INSERT wins (max-struct order 'I' > 'D',
    replayed by the oracle's ORDER BY ts DESC, op DESC). One shuffle on
    the (s, p, o) key — the same high-cardinality key profile as every
    graph groupBy, AQE-skew territory for hot triples rewritten often.
    """
    hist = changelog.filter(F.col(ts_col) <= F.lit(at))
    latest = (hist.groupBy(F.col(s_col).alias("s"),
                           F.col(p_col).alias("p"),
                           F.col(o_col).alias("o"))
              .agg(F.max(F.struct(F.col(ts_col).alias("ts"),
                                  F.col(op_col).alias("op")))
                   .alias("last")))
    return latest.filter(F.col("last.op") == "I").select("s", "p", "o")


def dangling_objects(triples: DataFrame, iri_prefix: str,
                     s_col: str = "s", p_col: str = "p",
                     o_col: str = "o") -> DataFrame:
    """Referential-integrity audit: per predicate, how many DISTINCT
    objects under ``iri_prefix`` are referenced but never occur as a
    subject anywhere in the graph — the broken edges that appear after
    filtering/sampling/quarantining upstream of materialization (the KG
    sibling of a foreign-key check).

    Returns (p, n_refs, n_dangling). One distinct-subject projection
    (anti-join build side), one pruned reference rollup — both shuffles
    on the node key; nothing corpus-wide beyond the two scans.
    """
    subs = (triples.select(F.col(s_col).alias("node"))
            .dropDuplicates())
    refs = (triples.filter(F.col(o_col).startswith(iri_prefix))
            .select(F.col(p_col).alias("p"), F.col(o_col).alias("node"))
            .dropDuplicates())
    n_refs = refs.groupBy("p").agg(F.count(F.lit(1)).alias("n_refs"))
    n_dang = (refs.join(subs, "node", "left_anti")
              .groupBy("p").agg(F.count(F.lit(1)).alias("n_dangling")))
    return (n_refs.join(n_dang, "p", "left")
            .select("p", "n_refs",
                    F.coalesce("n_dangling", F.lit(0)).alias("n_dangling")))


def ppr_subgraph(triples: DataFrame, seeds: DataFrame, rounds: int = 2,
                 top_n: int = 10, damping_e3: int = 850,
                 seed_col: str = "id") -> DataFrame:
    """GraphRAG context retrieval -> (seed, s, p, o): run integer
    personalized PageRank (graphrank.personalized_pagerank) over the
    UNDIRECTED entity graph of the triple table, keep each seed's top_n
    nodes by (mass_e9 DESC, node) — a deterministic tiebreak both
    engines order identically — and return the triples INDUCED by each
    seed's node set (both endpoints selected).

    Scale shape: the PPR state is (seed, node) rows; the top-n window
    partitions by seed (n_seeds × candidate nodes, never the corpus);
    the induced-triples step joins the corpus against a seed×top_n-row
    node table — broadcastable by construction — twice (subject arm,
    then object arm constrained to the same seed). This is the
    local-subgraph extractor an entity-centric RAG pipeline runs per
    query batch."""
    from pyspark.sql import Window

    from openapi_to_rdf_spark.operators.graphrank import (
        personalized_pagerank)

    pos = triples.select("s", "p", "o").dropDuplicates()
    edges = (pos.select(F.col("s").alias("src"), F.col("o").alias("dst"))
             .unionAll(pos.select(F.col("o").alias("src"),
                                  F.col("s").alias("dst"))))
    mass = personalized_pagerank(edges, seeds, rounds=rounds,
                                 damping_e3=damping_e3,
                                 seed_col=seed_col)
    w = Window.partitionBy("seed").orderBy(F.desc("mass_e9"), "node")
    top = (mass.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= top_n).select("seed", "node"))
    a = top.select("seed", F.col("node").alias("s"))
    b = top.select("seed", F.col("node").alias("o"))
    return (pos.join(F.broadcast(a), "s")
            .join(F.broadcast(b), ["seed", "o"])
            .select("seed", "s", "p", "o"))
