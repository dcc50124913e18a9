"""Burst detection over keyed event streams (trending entities).

KG curation wants to know when an entity's mention rate departs from its
own history — alarm storms, trending tickets, novel entities. The classic
signal (Kleinberg bursts, simplified to the ops-monitoring form) compares a
bucket's count against the TRAILING mean of the previous ``baseline``
buckets:

  burst(key, bucket)  iff  n >= min_count  AND  n > factor * trailing_mean

Spark shape — groupBy + one window, both on the same key:

- bucketing is pure codegen date arithmetic (``unix_timestamp div
  bucket_secs``);
- the (key, bucket) count is ONE aggregation with map-side partials (a
  hot entity's fan-in collapses per task before the shuffle);
- the trailing mean is a window over rows ``-baseline .. -1`` PARTITIONED
  BY THE SAME KEY the groupBy just shuffled on — Catalyst reuses the
  exchange, so the whole operator costs a single shuffle;
- emitted fixed-point (``trailing_mean_e6``) so engines compare exactly.

Buckets with zero events are NOT materialized (at 10^12 turns a dense
(entity x bucket) grid is its own scale problem); the trailing mean is
therefore over the last ``baseline`` ACTIVE buckets — the standard sparse
formulation (a gap in activity resets slowly rather than instantly, which
is the desired curation behavior: a returning entity is not a burst just
because it slept).

First buckets (no history) are never bursts: a new entity's first
appearance is novelty, reported by first_seen, not burstiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_counts(events: DataFrame, key_col: str, ts_col: str = "ts",
                  bucket_secs: int = 86_400) -> DataFrame:
    """(key, ts) -> (key, bucket, n) with bucket = floor(epoch / secs)."""
    bucket = (F.unix_timestamp(F.col(ts_col)) / bucket_secs).cast("long")
    return (events.select(F.col(key_col).alias("key"),
                          bucket.alias("bucket"))
            .groupBy("key", "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def detect_bursts(events: DataFrame, key_col: str, ts_col: str = "ts",
                  bucket_secs: int = 86_400, baseline: int = 3,
                  factor: float = 2.0, min_count: int = 3) -> DataFrame:
    """(key, bucket, n, trailing_mean_e6, burst) per active bucket.

    ``burst`` is false wherever no history exists (first active bucket).
    """
    counts = bucket_counts(events, key_col, ts_col, bucket_secs)
    w = (Window.partitionBy("key").orderBy("bucket")
         .rowsBetween(-baseline, -1))
    mean = F.avg("n").over(w)
    return (counts
            .withColumn("trailing_mean_e6",
                        F.round(mean * 1_000_000).cast("long"))
            .withColumn(
                "burst",
                F.col("trailing_mean_e6").isNotNull()
                & (F.col("n") >= min_count)
                & (F.col("n") * 1_000_000
                   > F.lit(factor) * F.col("trailing_mean_e6"))))


def first_seen(events: DataFrame, key_col: str,
               ts_col: str = "ts") -> DataFrame:
    """(key, first_ts, last_ts, n_total) — the novelty/lifetime companion
    table (one aggregation, same key shuffle)."""
    return (events.groupBy(F.col(key_col).alias("key"))
            .agg(F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts"),
                 F.count(F.lit(1)).alias("n_total")))


def value_anomalies(events: DataFrame, key_col: str, value_col: str = "value",
                    ts_col: str = "ts", order_extra: list[str] | None = None,
                    window: int = 20, z: float = 3.0,
                    min_history: int = 5) -> DataFrame:
    """Per-key trailing z-score anomaly flags — the value-based companion
    to the count-based burst detector above: each event is scored against
    the mean/stddev of its key's PREVIOUS ``window`` values (current row
    excluded: an outlier must not dilute its own baseline), flagged when
    ``|x - mean| > z * std`` with at least ``min_history`` priors and a
    nonzero std.

    One window pass over the (key, time) partitioning every keyed op here
    uses — single shuffle, O(window) state per row, no self-joins. z_e6
    is emitted e6-rounded (engine-portable; exact DuckDB twin
    ``value_anomalies``).
    """
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-window, -1))
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    score = F.when((n >= min_history) & (std > 0),
                   F.abs(F.col(value_col) - mean) / std)
    return (events.select(key_col, ts_col, *(order_extra or []), value_col,
                          n.alias("n_history"),
                          F.round(score * 1e6).cast("long").alias("z_e6"))
            .withColumn("is_anomaly",
                        F.coalesce(F.col("z_e6") > z * 1e6, F.lit(False))))
