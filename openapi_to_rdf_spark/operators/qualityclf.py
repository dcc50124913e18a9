"""Hashed-feature logistic-regression quality classifier, trained
entirely in DataFrame ops — the fastText/CCNet-style discriminative
quality filter (classify "looks like target corpus" vs not), the
complement of DSIR's generative importance weights.

Training is full-batch gradient descent where THE MODEL IS DRIVER
STATE: weights live as a dict of e9-scaled integers (bucket -> w_e9,
vocabulary-sized by construction), broadcast into each iteration's
margin join. Per iteration, the corpus is touched twice (margin pass,
gradient pass), both as (doc, bucket)-keyed joins and rollups — the
same WebPIE small-schema/large-instance asymmetry every other stage
here uses. No Python UDFs anywhere; sigmoid is codegen (`1/(1+exp(-m))`).

Determinism / oracle design: margins are e9-quantized before the
sigmoid and weight steps are e9-quantized after the learning-rate
multiply, so the weight trajectory is a sequence of INTEGER states any
engine reproduces from the same data — the driver's DuckDB twin unrolls
two iterations and matches every final weight and score. (The only
float entry points are one exp() per doc per iter on an identical
quantized argument and the final sum-then-round per bucket — 1-ulp
engine differences sit ~1e8 below the rounding quantum.)

At 10^12 docs you would subsample the training set (a classifier needs
10^5-10^6 labeled docs, not the corpus) and score the corpus in ONE
codegen pass — scoring is a broadcast join + rollup with no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.dsir import ngram_buckets


def hashed_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_buckets: int = 4096) -> DataFrame:
    """(id, bucket, c, n_grams): per-doc hashed uni+bigram counts with
    the doc's total gram count — the sparse feature rows; the model uses
    x = c / n_grams (length-normalized term frequency)."""
    per = (docs
           .select(F.col(id_col),
                   F.explode(ngram_buckets(F.col(text_col), n_buckets))
                   .alias("bucket"))
           .groupBy(id_col, "bucket")
           .agg(F.count(F.lit(1)).alias("c")))
    tot = per.groupBy(id_col).agg(F.sum("c").cast("long").alias("n_grams"))
    return per.join(tot, id_col)


def _margins(feats: DataFrame, labels: DataFrame, id_col: str,
             weights: dict[int, int], bias_e9: int) -> DataFrame:
    """Per-doc e9-quantized margin under the current integer weights.
    Docs with no feature rows get the bare bias."""
    spark = feats.sparkSession
    if weights:
        wdf = spark.createDataFrame(
            [(int(b), int(w)) for b, w in weights.items()],
            "bucket long, w_e9 long")
        dot = (feats.join(F.broadcast(wdf), "bucket")
               .groupBy(id_col)
               .agg(F.sum((F.col("c") / F.col("n_grams"))
                          * (F.col("w_e9") / F.lit(1e9))).alias("dot")))
    else:
        dot = labels.select(id_col, F.lit(0.0).alias("dot")).limit(0)
    return (labels.select(id_col)
            .join(dot, id_col, "left")
            .select(id_col,
                    F.round((F.coalesce(F.col("dot"), F.lit(0.0))
                             + F.lit(bias_e9) / F.lit(1e9)) * 1e9)
                    .cast("long").alias("m_e9")))


def train_quality_lr(docs: DataFrame, label_col: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 4096, iters: int = 2,
                     lr: float = 4.0) -> tuple[dict[int, int], int]:
    """Full-batch GD logistic regression on hashed n-gram frequencies.
    ``label_col`` is 0/1. Returns (weights {bucket: w_e9}, bias_e9).

    Per iteration: one broadcast margin join, one residual pass, one
    bucket rollup (<= n_buckets rows collected — the model is driver
    state like every other vocabulary-sized structure here)."""
    feats = hashed_features(docs, id_col, text_col,
                            n_buckets).localCheckpoint(eager=True)
    labels = (docs.select(id_col,
                          F.col(label_col).cast("double").alias("y"))
              .localCheckpoint(eager=True))
    n_docs = labels.count()
    weights: dict[int, int] = {}
    bias_e9 = 0
    for _ in range(iters):
        m = _margins(feats, labels, id_col, weights, bias_e9)
        # residual r = sigmoid(m) - y on the e9-quantized margin
        resid = (labels.join(m, id_col)
                 .select(id_col,
                         (F.lit(1.0)
                          / (F.lit(1.0) + F.exp(-F.col("m_e9") / F.lit(1e9)))
                          - F.col("y")).alias("r")))
        grad = (feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(F.round(F.sum((F.col("c") / F.col("n_grams"))
                                   * F.col("r"))
                             * F.lit(lr * 1e9) / F.lit(n_docs))
                     .cast("long").alias("step_e9"))
                .collect())
        bias_step = resid.agg(
            F.round(F.sum("r") * F.lit(lr * 1e9) / F.lit(n_docs))
            .cast("long")).first()[0]
        for row in grad:
            weights[row.bucket] = weights.get(row.bucket, 0) - row.step_e9
        bias_e9 -= int(bias_step)
    return weights, bias_e9


def score_quality(docs: DataFrame, weights: dict[int, int], bias_e9: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_buckets: int = 4096) -> DataFrame:
    """One codegen scoring pass: (id, margin_e9, prob_e6). Stateless —
    a broadcast join + rollup, the shape you run over the full corpus."""
    feats = hashed_features(docs, id_col, text_col, n_buckets)
    labels = docs.select(id_col)
    m = _margins(feats, labels, id_col, weights, bias_e9)
    return m.select(
        id_col, "m_e9",
        F.round(F.lit(1e6)
                / (F.lit(1.0) + F.exp(-F.col("m_e9") / F.lit(1e9))))
        .cast("long").alias("prob_e6"))
