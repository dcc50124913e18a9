"""Deterministic sampling & dataset-split operators for training data.

Random sampling is useless at 10^12 rows if it isn't reproducible across
reruns, engines, and partitionings — so these assign rows by a content hash
(md5 of the key), never by RNG state: the same row always lands in the same
split/sample regardless of cluster size, executor count, or engine
(ANSI-SQL-expressible, so the DuckDB oracle reproduces the exact rows).

hash_fraction(key) = first 8 hex chars of md5(key) as a uniform uint32 /
2^32 — stable, engine-portable, and fine-grained enough for per-mille
sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column) -> Column:
    """Uniform [0,1) fraction derived from md5(key) — deterministic and
    identical in any engine with md5 + hex parsing."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("double") / (2.0 ** 32)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str) -> DataFrame:
    """Keep rows with hash_fraction(key) < fraction. Content-addressed: the
    sample is a stable subset — append-only growth never reshuffles it."""
    return df.filter(hash_fraction(F.col(key_col)) < fraction)


def train_val_test_split(df: DataFrame, key_col: str,
                         val: float = 0.1, test: float = 0.1) -> DataFrame:
    """Adds a ``split`` column ∈ {train, val, test} by content hash. The
    same key always lands in the same split — the leakage-safe way to split
    when near-duplicate documents share a canonical key after dedup."""
    h = hash_fraction(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(h < test, F.lit("test"))
        .when(h < test + val, F.lit("val"))
        .otherwise(F.lit("train")))
