"""Watermarked windowed aggregations over the transcript stream.

The remaining Structured-Streaming primitive the engine exposes (ingest =
foreachBatch exactly-once, stateful = applyInPandasWithState, incremental
= canonical-map merge): event-time WINDOWS with late-data handling. Both
aggregations here run in append mode — a window's row is emitted exactly
once, when the watermark passes its end, and rows arriving later than the
watermark delay for an already-closed window are DROPPED by the engine
(tested in tests/test_streaming_windows.py by replaying a too-late row —
the closed window's count must not change).

State is bounded by construction: open windows only exist within the
watermark horizon, and the distinct-conversation sketch keeps at most
m=2^p register rows per (window, role) instead of one state row per
conversation — the md5 HLL from operators/sketch is MAX-mergeable, which
is exactly the shape streaming incremental aggregation needs (no
COUNT(DISTINCT) exists in streaming; a per-key dedup would hold every
conversation id in state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import hll_registers


def windowed_turn_counts(stream: DataFrame, window: str = "10 minutes",
                         slide: str | None = None,
                         watermark: str = "15 minutes") -> DataFrame:
    """Per-(window, role) turn counts and distinct-conv lower machinery:
    tumbling by default, sliding when ``slide`` is given. Streaming-safe
    aggregation (count/sum only); emitted once per closed window in
    append mode."""
    wm = stream.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (wm.groupBy(win.alias("win"), "role")
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "role", "n_turns"))


def windowed_conv_sketch(stream: DataFrame, window: str = "10 minutes",
                         watermark: str = "15 minutes",
                         p: int = 8) -> DataFrame:
    """Distinct-conversation HLL registers per (window, role): the
    streaming form of COUNT(DISTINCT conv_id), which streaming forbids.
    MAX over ranks is an order-insensitive, retractless aggregate, so the
    incremental micro-batch merge equals the batch sketch exactly —
    estimate downstream with operators.sketch.hll_estimate over the
    materialized registers."""
    wm = stream.withWatermark("ts", watermark)
    win = F.window("ts", window)
    return hll_registers(
        wm.select(win.alias("win"), "role", "conv_id"),
        "conv_id", ["win", "role"], p=p) \
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "role", "register", "max_rank")


def session_turn_stats(stream: DataFrame, gap: str = "5 minutes",
                       watermark: str = "15 minutes") -> DataFrame:
    """Event-time SESSION windows per conversation: turns closer than
    ``gap`` merge into one session; a session closes (and its single row
    emits, append mode) when the watermark passes last_ts + gap. This is
    the dynamic-window counterpart to the tumbling/sliding aggregations
    above — the window's extent comes from the data, not the clock grid.

    State bound: one open session per conversation within the watermark
    horizon (Spark merges session fragments across micro-batches; the
    merge is count/min/max, all retractless). The same expression runs in
    batch — F.session_window is a grouping expression, not a streaming-
    only construct — which is how tests pin stream == batch equality.

    Output: (conv_id, sess_start, sess_end, n_turns, first_turn,
    last_turn); ``sess_end`` is last event ts + gap (Spark's session
    close semantics), so session DURATION is sess_end - sess_start - gap
    for point events.
    """
    wm = stream.withWatermark("ts", watermark)
    return (wm.groupBy("conv_id", F.session_window("ts", gap).alias("sw"))
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.min("turn_idx").alias("first_turn"),
                 F.max("turn_idx").alias("last_turn"))
            .select("conv_id",
                    F.col("sw.start").alias("sess_start"),
                    F.col("sw.end").alias("sess_end"),
                    "n_turns", "first_turn", "last_turn"))
