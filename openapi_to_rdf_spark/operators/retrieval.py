"""BM25 ranked retrieval over the documents table as DataFrame ops.

Architecture mirrors how retrieval actually deploys at scale: an INDEX
BUILD pass (one scan of the corpus → a (doc, term, tf, dl) inverted-index
table, meant to be written out partitioned/bucketed by term) and a QUERY
path that touches only the query terms' postings — a semi-filter on term
that partition-prunes when the index is term-partitioned, then a
broadcast of the per-term document frequencies and global stats. Nothing
in the query path shuffles more than the query terms' posting lists; the
full corpus is never rescanned per query.

Scoring is Robertson/Sparck-Jones BM25 with Lucene's non-negative idf:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, q)     = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Scores are e6-fixed before ranking so the ordering is integer-determined
— the driver's ``bm25_topk`` oracle reproduces the entire pipeline
(tokenize → index → idf → score → top-k) in DuckDB SQL and must agree
row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = "([a-z0-9]+)"


def build_term_index(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     pattern: str = TOKEN_PATTERN) -> DataFrame:
    """Inverted index rows (doc, term, tf, dl) in ONE corpus scan: the
    token array is bound once per row, its size is the document length,
    and the explode→groupBy carries dl through the aggregation key (dl is
    functionally dependent on the doc, so the extra key changes no
    groups). Write this partitioned (or bucketed) by term — queries then
    prune to their terms' postings."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 1)")
    return (docs
            .select(F.col(id_col).alias("doc"),
                    F.size(toks).cast("long").alias("dl"),
                    F.explode(toks).alias("term"))
            .groupBy("doc", "term", "dl")
            .agg(F.count(F.lit(1)).alias("tf")))


def corpus_stats(index: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) frame from the index (not the corpus —
    the index is the smaller, already-materialized artifact). dl repeats
    per posting, so aggregate per doc first; both aggs are narrow."""
    per_doc = index.groupBy("doc").agg(F.first("dl").alias("dl"))
    return per_doc.agg(F.count(F.lit(1)).alias("n_docs"),
                       F.avg("dl").alias("avgdl"))


def bm25_topk(index: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              stats: DataFrame | None = None) -> DataFrame:
    """Top-k documents for a bag of query terms: (doc, score_e6, rank).

    Postings are filtered to the query terms FIRST (the pruned scan),
    per-term document frequencies are computed over that slice and
    broadcast back, and the global (n_docs, avgdl) scalar row is
    broadcast-crossed in — so the only per-corpus-size work is reading
    the matching posting lists. Pass a materialized ``stats`` frame to
    keep even the stats pass off the query path.
    """
    if not query_terms:
        raise ValueError("empty query")
    if stats is None:
        stats = corpus_stats(index)
    q = index.filter(F.col("term").isin(list(query_terms)))
    df_t = q.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    scored = (q.join(F.broadcast(df_t), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    per_doc = (scored.select("doc", (idf * norm).alias("_s"))
               .groupBy("doc")
               .agg(F.round(F.sum("_s") * 1000000).cast("long")
                    .alias("score_e6")))
    # distributed top-k (TakeOrderedAndProject: per-partition heads + one
    # singleton reduce), THEN a rank window over only the k survivors — a
    # bare row_number window here would drag every matching doc into one
    # partition
    top = per_doc.orderBy(F.col("score_e6").desc(), F.col("doc").asc()) \
        .limit(k)
    w = Window.orderBy(F.col("score_e6").desc(), F.col("doc").asc())
    return top.withColumn("rank",
                          F.row_number().over(w).cast("long"))


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", rank_col: str = "rank",
             group_cols: list[str] | None = None) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-retrieval combiner (BM25 ∪ dense ∪ anything ranked):
    ``rrf(d) = Σ_lists 1/(k + rank_list(d))``, higher = better. Items
    missing from a list simply contribute nothing — RRF's robustness is
    exactly that absence isn't a zero score but a no-op.

    ``group_cols`` scopes the fusion (e.g. per query_id). One union +
    one groupBy on (group, id) — rankings are top-k-sized, so this is
    vocabulary-scale work no matter the corpus; the heavy lifting
    happened inside each retriever. rrf_e6 is emitted as an e6-scaled
    integer (engine-portable; exact DuckDB twin ``rrf_events``), with
    (rrf desc, id) ordering made deterministic by the id tiebreak.
    """
    gc = group_cols or []
    parts = [r.select(*gc, F.col(id_col),
                      (F.lit(1.0) / (F.lit(k) + F.col(rank_col)))
                      .alias("contrib"))
             for r in rankings]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = (un.groupBy(*gc, id_col)
             .agg(F.round(F.sum("contrib") * 1e6).cast("long")
                  .alias("rrf_e6"),
                  F.count(F.lit(1)).alias("n_lists")))
    from pyspark.sql import Window
    w = Window.partitionBy(*gc).orderBy(F.desc("rrf_e6"), F.col(id_col))
    return fused.withColumn("fused_rank", F.row_number().over(w))


def maxsim_topk(queries: DataFrame, docs: DataFrame, k: int = 10,
                q_id: str = "q_id", q_vecs: str = "q_vecs",
                d_id: str = "doc_id", d_vecs: str = "d_vecs") -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval -> (q_id,
    doc_id, score, rank): score(q, d) = Σ over query token vectors of
    the max dot product against any document token vector, over INTEGER
    token embeddings (quantize floats upstream, e.g. featprop.
    quantize_embeddings per token) — so every score is a BIGINT both
    engines agree on, and top-k ordering ties break on doc_id.

    Scale shape: the query table is request-sized — broadcast against
    one corpus pass (exactly cosine_topk's shape; never a corpus
    self-join); the MaxSim itself is a nested fold entirely inside
    whole-stage codegen (no Python). Token counts are small constants
    (ColBERT uses ~32), so per-pair work is O(|q_toks|·|d_toks|·dim).
    At 10^9 docs you put an ANN/IVF prefilter in front (similarity.py)
    and MaxSim only the survivors — the standard two-stage deployment."""
    pair = docs.select(d_id, d_vecs).crossJoin(
        F.broadcast(queries.select(q_id, q_vecs)))

    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    score = F.aggregate(
        F.transform(F.col(q_vecs),
                    lambda qt: F.array_max(
                        F.transform(F.col(d_vecs), lambda dt: dot(qt, dt)))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)

    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col(d_id))
    return (pair.select(q_id, d_id, score.alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
