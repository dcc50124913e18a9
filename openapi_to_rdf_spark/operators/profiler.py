"""Key-distribution profiler — the measurement half of skew handling.

Every skew mitigation in this repo (salted CC in components.py, rarity
ordering in dedup.py, AQE skew-join) presumes you KNOW a key is hot. At
100 TB you can't eyeball that; this operator computes the decision inputs
— top share, skew ratio, entropy — in ONE aggregation pass over the
per-key counts (itself one partial-aggregated shuffle), so profiling a
join key costs the same as counting it.

Entropy trick: H = ln(n) - (Σ c·ln c)/n over per-key counts c, so the
whole profile is a single groupBy().agg() over the count table — no
second pass to normalize probabilities, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _e6(col):
    return F.round(col * 1000000).cast("long")


def key_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row distribution profile of the given key:

    - n_rows, n_keys, max_key_count
    - max_share_e6: hottest key's fraction of all rows (salting trigger)
    - skew_ratio_e6: max_count / mean_count (1.0 = perfectly uniform)
    - entropy_e6: Shannon entropy in nats of the key distribution
    - entropy_norm_e6: entropy / ln(n_keys) — 1.0 = uniform, → 0 =
      one key dominates (NULL for a single-key frame, where it's
      undefined)
    """
    counts = (df.groupBy(*key_cols)
              .agg(F.count(F.lit(1)).alias("c")))
    n = F.sum("c")
    n_keys = F.count(F.lit(1))
    mx = F.max("c")
    # H = ln(n) - sum(c*ln c)/n  (exact algebra, one pass)
    entropy = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return counts.agg(
        n.alias("n_rows"),
        n_keys.alias("n_keys"),
        mx.alias("max_key_count"),
        _e6(mx / n).alias("max_share_e6"),
        _e6(mx * n_keys / n).alias("skew_ratio_e6"),
        _e6(entropy).alias("entropy_e6"),
        F.when(n_keys > 1, _e6(entropy / F.log(n_keys)))
        .alias("entropy_norm_e6"))


def top_keys(df: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """The k hottest keys with counts and rank — deterministic ties
    (count desc, then keys asc). TakeOrderedAndProject top-k, then the
    rank window runs over only the k survivors."""
    counts = (df.groupBy(*key_cols)
              .agg(F.count(F.lit(1)).alias("key_count")))
    order = [F.col("key_count").desc()] + \
        [F.col(c).asc() for c in key_cols]
    top = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def equidepth_histogram(df: DataFrame, value_col: str,
                        tiebreak_cols: list[str], k: int = 10) -> DataFrame:
    """Equi-DEPTH histogram: k buckets of (near-)equal row count with
    per-bucket [lo, hi] value bounds — the quantile-sketch summary a
    planner or drift monitor wants where the equi-WIDTH histogram
    (value_histogram) hides skew in a few fat bins. NTILE over a total
    order made deterministic by ``tiebreak_cols``; remainder rows land in
    the leading buckets (NTILE's standard split, identical in DuckDB —
    exact oracle ``value_equidepth``). One sort-shuffle; at corpus scale
    swap the window for repartitionByRange + per-partition bounds, the
    same trade zorder_locality documents."""
    from pyspark.sql import Window as W

    order = [F.col("v")] + [F.col(c) for c in tiebreak_cols]
    tile = F.ntile(k).over(W.orderBy(*order))
    return (df.select(F.col(value_col).alias("v"), *tiebreak_cols)
            .withColumn("bucket", tile)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 _e6(F.min("v")).alias("lo_e6"),
                 _e6(F.max("v")).alias("hi_e6")))
