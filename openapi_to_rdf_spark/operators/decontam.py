"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set — the standard contamination control an
LLM training pipeline runs before a corpus ships (the n-gram-overlap
method popularized by GPT-3/PaLM/Dolma-style dedup-against-eval).

Semantics (pinned for the driver's DuckDB oracle, ``decontaminate``):

- Both sides normalize + shingle with functions.text.word_ngrams — the
  SAME distinct-3-gram basis the hash-verified ngram/minhash dedup path
  uses, so "overlap" means one thing across the repo.
- A train doc's ``n_hits`` = number of its DISTINCT n-grams that occur
  anywhere in the eval set (eval grams are a set — which eval doc they
  came from doesn't matter, matching how decontamination is practiced).
- ``contaminated`` = n_hits >= min_hits. Docs too short to have any
  n-gram are reported with n_grams = n_hits = 0 (clean by definition).

Scale design:

- The EVAL side is small by nature (benchmark suites: 10^4-10^7 distinct
  n-grams) → build its distinct gram set once and BROADCAST it into the
  train-side probe: the 100 TB side is never shuffled, the whole job is
  one scan + map-side semi-join + per-doc count (partial aggregation,
  near-unique keys, no skew). ``broadcast_eval=False`` flips to a plain
  shuffle join for pathological eval sets too big to broadcast.
- Exploding DISTINCT grams per doc bounds the explode factor at the token
  count; the gram strings never leave the executor that derived them
  except as join probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams


def eval_ngram_set(eval_docs: DataFrame, n: int = 3,
                   text_col: str = "text") -> DataFrame:
    """The eval side's distinct n-gram set -> one ``gram`` column."""
    return (eval_docs
            .select(F.explode(word_ngrams(F.col(text_col), n))
                    .alias("gram"))
            .dropDuplicates(["gram"]))


def contamination_report(docs: DataFrame, eval_docs: DataFrame,
                         n: int = 3, min_hits: int = 1,
                         id_col: str = "doc_id", text_col: str = "text",
                         broadcast_eval: bool = True) -> DataFrame:
    """(id, n_grams, n_hits, contaminated) per training document."""
    evals = eval_ngram_set(eval_docs, n=n, text_col=text_col)
    if broadcast_eval:
        evals = F.broadcast(evals)
    grams = docs.select(F.col(id_col).alias("id"),
                        word_ngrams(F.col(text_col), n).alias("grams"))
    sizes = grams.select("id", F.size("grams").alias("n_grams"))
    hits = (grams.select("id", F.explode("grams").alias("gram"))
            .join(evals, "gram")
            .groupBy("id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (sizes.join(hits, "id", "left")
            .select(F.col("id").alias(id_col), "n_grams",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") >= min_hits))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = 3, min_hits: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_eval: bool = True) -> DataFrame:
    """The clean corpus: ``docs`` minus contaminated rows (all original
    columns preserved) — report + semi-join composed."""
    flagged = contamination_report(
        docs, eval_docs, n=n, min_hits=min_hits, id_col=id_col,
        text_col=text_col, broadcast_eval=broadcast_eval)
    bad = flagged.filter("contaminated").select(id_col)
    return docs.join(bad, id_col, "left_anti")
