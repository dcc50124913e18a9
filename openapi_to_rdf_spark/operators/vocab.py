"""Vocabulary induction + out-of-vocabulary coverage over a corpus.

The tokenizer-adjacent half of a training-data pipeline: pick the top-V
terms by corpus frequency (the fixed vocabulary a WordPiece/BPE trainer
would seed from) and score every document's coverage against it — OOV
rate is a standard corpus-quality / domain-shift signal, and the same
explode→broadcast-join shape computes tokens-per-doc for free.

Scale shape: the vocabulary is top-V of a partial-aggregated term count
(TakeOrderedAndProject — no full sort), and V is small by construction,
so the per-doc scoring pass broadcasts the vocab and never shuffles the
corpus; one explode-scan does all documents. Tokenization reuses the
retrieval module's pattern so index, BM25, CMS and OOV all agree on what
a term is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.retrieval import TOKEN_PATTERN


def _flat_terms(docs: DataFrame, id_col: str, text_col: str,
                pattern: str) -> DataFrame:
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 1)")
    return docs.select(F.col(id_col), F.explode(toks).alias("term"))


def build_vocab(docs: DataFrame, size: int = 500, id_col: str = "doc_id",
                text_col: str = "text",
                pattern: str = TOKEN_PATTERN) -> DataFrame:
    """Top-``size`` terms by corpus frequency: (term, term_count,
    term_rank), ties broken lexicographically so the vocabulary is a
    deterministic function of the corpus (reruns and engines agree)."""
    counts = (_flat_terms(docs, id_col, text_col, pattern)
              .groupBy("term")
              .agg(F.count(F.lit(1)).alias("term_count")))
    order = [F.col("term_count").desc(), F.col("term").asc()]
    top = counts.orderBy(*order).limit(size)
    w = Window.orderBy(*order)
    return top.withColumn("term_rank",
                          F.row_number().over(w).cast("long"))


def oov_stats(docs: DataFrame, vocab: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              pattern: str = TOKEN_PATTERN) -> DataFrame:
    """Per-document coverage against a vocabulary: (id, n_tokens, n_oov,
    oov_rate_e6). Documents with no tokens at all stay in the result
    (rate 0) — they are exactly the ones a quality gate wants to see.
    One corpus explode + one BROADCAST join against vocab; the corpus
    itself never shuffles (the final agg re-keys on the doc id, which
    parquet row-group locality keeps narrow)."""
    flat = _flat_terms(docs, id_col, text_col, pattern)
    marked = flat.join(
        F.broadcast(vocab.select("term").withColumn("_in", F.lit(1))),
        "term", "left")
    per_doc = (marked.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.count(F.when(F.col("_in").isNull(), 1))
                    .alias("n_oov")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                    F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0))
                    .otherwise(F.round(F.col("n_oov") * 1000000
                                       / F.col("n_tokens")))
                    .cast("long").alias("oov_rate_e6")))
