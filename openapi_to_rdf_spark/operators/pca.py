"""Distributed PCA / whitening over embedding columns.

Embedding post-processing for the similarity/dedup stack: centering,
principal components, and whitening (unit-variance rotation) are the
standard preconditioners before ANN indexing (OPQ-style) and SemDeDup-style
semantic clustering. The expensive part — the d×d second-moment (Gram)
matrix — is computed as a TREE AGGREGATION:

  1. ``mapInPandas`` emits one tiny partial row per Arrow batch
     (n, sum-vector, flattened Gram), all numpy float64 — O(batches) rows
     total regardless of corpus size;
  2. the partials reduce JVM-side via posexplode + groupBy(pos) — at most
     d*d running-sum cells per batch, so a 100 TB corpus reduces through
     kilobytes of state. No shuffle ever carries row-level data.

The eigen-decomposition itself is a driver-side numpy ``eigh`` on the d×d
covariance (microseconds for d <= a few thousand) — the correct place for
it; distributing an O(d^3) dense solve over a d=64..4096 matrix is waste.
Projection back over the corpus is pure JVM (``zip_with`` dot products
against literal component vectors) — whole-stage codegen, no Python.

No counterpart in the reference (it has no numeric columns at all); this is
part of the training-data-pipeline surface. Covariance is oracle-checked by
DuckDB (query ``embedding_cov``); eigenvectors/projection are parity-tested
against numpy in tests/test_pca.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-batch partial moments: one row (n long, s array<double>,
    g array<double> row-major d*d) per Arrow batch. Internal building block;
    callers reduce with ``_reduce_moments`` or the covariance view below."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "n": [len(x)],
                "s": [x.sum(axis=0)],
                "g": [(x.T @ x).ravel()],
            })

    return emb.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>")


def embedding_cov(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Population covariance entries (i int, j int, cov double) for i <= j,
    fully distributed: batch partials -> posexplode -> groupBy(pos) sums ->
    broadcast-join the (tiny) mean vector. d*(d+1)/2 output rows."""
    parts = embedding_moments(emb, vec_col).localCheckpoint()
    n = parts.agg(F.sum("n")).first()[0]
    if not n:
        raise ValueError("embedding_cov: empty input")

    sums = (parts.select(F.posexplode("s").alias("i", "v"))
            .groupBy("i").agg((F.sum("v") / F.lit(float(n))).alias("mean")))
    gram = (parts.select(F.posexplode("g").alias("pos", "v"))
            .groupBy("pos").agg(F.sum("v").alias("sg")))
    d = sums.count()
    mi = sums.select(F.col("i"), F.col("mean").alias("mi"))
    mj = sums.select(F.col("i").alias("j"), F.col("mean").alias("mj"))
    return (gram
            .select((F.col("pos") / d).cast("int").alias("i"),
                    F.pmod("pos", F.lit(d)).cast("int").alias("j"),
                    F.col("sg"))
            .filter(F.col("i") <= F.col("j"))
            .join(F.broadcast(mi), "i")
            .join(F.broadcast(mj), "j")
            .select("i", "j",
                    (F.col("sg") / F.lit(float(n))
                     - F.col("mi") * F.col("mj")).alias("cov")))


def pca_fit(emb: DataFrame, k: int, vec_col: str = "embedding"):
    """Fit PCA: returns (mean[d], components[k, d], eigvals[k]) as numpy,
    components sorted by descending eigenvalue with a deterministic sign
    convention (largest-|coordinate| entry made positive)."""
    parts = embedding_moments(emb, vec_col).localCheckpoint()
    rows = parts.collect()  # O(batches) tiny partial rows — not corpus data
    n = sum(r["n"] for r in rows)
    if not n:
        raise ValueError("pca_fit: empty input")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = len(s)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # (k, d)
    # deterministic signs: flip so the max-|x| coordinate is positive
    for c in comps:
        peak = np.argmax(np.abs(c))
        if c[peak] < 0:
            c *= -1.0
    return mean, comps, vals[order]


def pca_project(emb: DataFrame, mean: np.ndarray, components: np.ndarray,
                eigvals: np.ndarray | None = None,
                vec_col: str = "embedding",
                out_col: str = "pca") -> DataFrame:
    """Project (and optionally whiten, when ``eigvals`` is given) the
    embedding column onto the fitted components: pure-JVM dot products
    against literal vectors (whole-stage codegen, zero Python per row).
    Adds ``out_col: array<double>`` of length k."""
    scale = (1.0 / np.sqrt(np.maximum(eigvals, 1e-12))
             if eigvals is not None else np.ones(len(components)))
    x = F.col(vec_col)
    outs = []
    for c, (w, sc) in enumerate(zip(components, scale)):
        lit_w = F.array(*[F.lit(float(v)) for v in w])
        bias = float(np.dot(mean, w))
        dot = F.aggregate(
            F.zip_with(x, lit_w, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, v: acc + v)
        outs.append((dot - F.lit(bias)) * F.lit(float(sc)))
    return emb.withColumn(out_col, F.array(*outs))
