"""Character n-gram language-model perplexity scoring (CCNet-style quality
filtering).

The CCNet / RedPajama / Dolma pipelines score every document with a small
language model trained on a trusted corpus and keep/bucket documents by
perplexity. This module is that operator, Spark-first:

- ``train_char_lm`` is ONE linear scan -> explode -> groupBy over character
  n-grams of the LM-normalized text ([a-z0-9 ] alphabet). Over that 37-char
  alphabet the trigram vocabulary is bounded by 37^3 = 50,653 rows no matter
  the corpus size, so the trained model is always broadcastable.
- ``lm_perplexity`` scores a (possibly different) corpus: explode grams,
  TWO BROADCAST joins (gram counts + context counts — both tiny), one
  linear groupBy(doc_id). No sort, no wide shuffle: at 100 TB this is a
  single scan with map-side partial aggregation on the doc key.

Probability model: add-alpha smoothed conditional
``p(g) = (c(g) + alpha) / (C(ctx(g)) + alpha * V)`` where ``ctx`` is the
(n-1)-char prefix, ``C`` sums trigram counts by prefix (self-consistent with
the gram table), and ``V = 37`` (alphabet size incl. space). Unseen grams in
an unseen context back off to the uniform 1/V.

Everything is pyspark.sql.functions (JVM codegen) — no Python in the hot
path — and has an exact DuckDB twin in ``__spark_entry__.py`` (query
``lm_perplexity``).

Reference parity note: the reference (EricssonResearch/openapi-to-rdf) has no
quality-scoring stage; this is part of the mandated training-data-pipeline
surface, following the published CCNet design (Wenzek et al., 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams_all

# |{a-z}| + |{0-9}| + space — the closed alphabet lm_normalized maps into.
ALPHABET_SIZE = 37


def train_char_lm(docs: DataFrame, text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Count character n-grams over the LM-normalized corpus.

    Returns ``(gram string, ctx string, n_gram long)`` — at most
    ALPHABET_SIZE**n rows, broadcastable at any corpus size. ``ctx`` is the
    (n-1)-char prefix used as the conditioning context.
    """
    return (docs
            .select(F.explode(char_ngrams_all(F.col(text_col), n))
                    .alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_gram"))
            .withColumn("ctx", F.substring("gram", 1, n - 1)))


def lm_perplexity(docs: DataFrame, lm: DataFrame | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, alpha: float = 0.1) -> DataFrame:
    """Per-document char-LM perplexity.

    ``lm`` is a ``train_char_lm`` output (train on a TRUSTED corpus, score
    the target corpus — the CCNet pattern); if None, trains on ``docs``
    itself (self-perplexity, the repetition/garbage signal).

    Returns ``(id_col, n_grams long, nlp_e6 long, ppl_e6 long)`` — average
    negative log-likelihood per gram and its exp (perplexity), e6-fixed for
    cross-engine comparison. Documents with fewer than n normalized chars
    get ``n_grams = 0`` and NULL scores.
    """
    if lm is None:
        lm = train_char_lm(docs, text_col=text_col, n=n)
    ctx_counts = lm.groupBy("ctx").agg(F.sum("n_gram").alias("n_ctx"))

    grams = docs.select(
        F.col(id_col),
        F.explode(char_ngrams_all(F.col(text_col), n)).alias("gram"))
    scored = (grams
              .withColumn("ctx", F.substring("gram", 1, n - 1))
              .join(F.broadcast(lm.select("gram", "n_gram")), "gram", "left")
              .join(F.broadcast(ctx_counts), "ctx", "left")
              .withColumn("lp", F.log(
                  (F.coalesce(F.col("n_gram"), F.lit(0)) + F.lit(alpha))
                  / (F.coalesce(F.col("n_ctx"), F.lit(0))
                     + F.lit(alpha * ALPHABET_SIZE))))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.avg(-F.col("lp")).alias("nlp")))

    e6 = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    return (docs.select(id_col)
            .join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    e6(F.col("nlp")).alias("nlp_e6"),
                    e6(F.exp("nlp")).alias("ppl_e6")))


def perplexity_filter(docs: DataFrame, lm: DataFrame,
                      max_ppl: float, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      alpha: float = 0.1) -> DataFrame:
    """Keep documents whose LM perplexity is at most ``max_ppl`` (docs too
    short to score are kept — no evidence against them). Returns the input
    rows + a ``ppl_e6`` column."""
    scores = lm_perplexity(docs, lm, id_col=id_col, text_col=text_col,
                           n=n, alpha=alpha)
    return (docs.join(scores.select(id_col, "ppl_e6"), id_col)
            .filter(F.col("ppl_e6").isNull()
                    | (F.col("ppl_e6") <= max_ppl * 1e6)))
