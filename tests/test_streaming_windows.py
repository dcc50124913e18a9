"""Watermarked windowed aggregations (streaming/windows): append-mode
emission, LATE-DATA DROP for closed windows, and the streaming
distinct-conversation sketch equalling its batch counterpart."""

import datetime as dt
import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.streaming.windows import (  # noqa: E402
    windowed_conv_sketch, windowed_turn_counts,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, " \
         "tool string, ts timestamp"


def _t(minute, second=0):
    return dt.datetime(2026, 3, 1, 10, minute, second)


def _rows_on_time():
    # window W1 = [10:00, 10:10): 3 user + 2 assistant turns
    rows = [("c1", i, "user", "x", None, _t(1 + i)) for i in range(3)]
    rows += [("c2", i, "assistant", "x", None, _t(5 + i)) for i in range(2)]
    # watermark pusher: 10:30 row → wm after batch0 = 10:15 > W1 end
    rows += [("c9", 0, "user", "x", None, _t(30))]
    return rows


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    import time

    src = tmp_path / "src"
    # batch 0 advances the watermark to 10:15 (> W1's end); batch 1 is an
    # unrelated on-time row (Spark applies the advanced watermark to late
    # filtering one batch later); batch 2 carries the LATE row into the
    # closed W1 plus a final watermark pusher so W1 flushes in append mode
    spark.createDataFrame(_rows_on_time(), SCHEMA) \
        .coalesce(1).write.parquet(str(src / "b0"))
    time.sleep(1.1)   # file source orders batches by modification time
    spark.createDataFrame([("c8", 0, "user", "x", None, _t(31))], SCHEMA) \
        .coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)
    spark.createDataFrame(
        [("c3", 0, "user", "x", None, _t(3)),
         ("c9", 1, "user", "x", None, dt.datetime(2026, 3, 1, 11, 0))],
        SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (windowed_turn_counts(stream, window="10 minutes",
                              watermark="15 minutes")
         .writeStream.format("memory").queryName("wincounts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.win_start, r.role): r.n_turns
           for r in spark.table("wincounts").collect()}
    # W1 closed with ONLY the on-time rows — the late c3 turn is dropped
    assert got[(_t(0), "user")] == 3
    assert got[(_t(0), "assistant")] == 2
    # no duplicate emission of W1 (append mode emits a window once)
    w1 = [r for r in spark.table("wincounts").collect()
          if r.win_start == _t(0) and r.role == "user"]
    assert len(w1) == 1


def test_windowed_counts_sliding_semantics_batch(spark):
    """Sliding windows: each row lands in window_count = size/slide
    windows; verified in batch mode (the same code path Catalyst runs
    under streaming)."""
    df = spark.createDataFrame(_rows_on_time(), SCHEMA)
    got = windowed_turn_counts(df, window="10 minutes", slide="5 minutes")
    rows = {(r.win_start, r.role): r.n_turns for r in got.collect()}
    # the 10:01-10:03 user rows appear in [09:55,10:05) and [10:00,10:10)
    assert rows[(dt.datetime(2026, 3, 1, 9, 55), "user")] == 3
    assert rows[(_t(0), "user")] == 3
    assert rows[(_t(0), "assistant")] == 2
    assert rows[(_t(5), "assistant")] == 2


def test_windowed_conv_sketch_equals_batch(spark, tmp_path):
    from openapi_to_rdf_spark.operators.sketch import hll_registers

    src = tmp_path / "src"
    rows = [(f"c{i % 7}", i, "user", "x", None, _t(i % 9)) for i in range(40)]
    rows += [("cz", 0, "user", "x", None, _t(40))]  # watermark pusher
    df = spark.createDataFrame(rows, SCHEMA)
    df.filter(F.col("turn_idx") < 20).coalesce(1) \
        .write.parquet(str(src / "b0"))
    df.filter(F.col("turn_idx") >= 20).coalesce(1) \
        .write.parquet(str(src / "b1"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (windowed_conv_sketch(stream, window="10 minutes",
                              watermark="15 minutes")
         .writeStream.format("memory").queryName("winsketch")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.win_start, r.role, r.register): r.max_rank
           for r in spark.table("winsketch").collect()}
    # batch ground truth over the SAME on-time rows, same window
    win = F.window("ts", "10 minutes")
    expected = {(r.win_start, r.role, r.register): r.max_rank
                for r in hll_registers(
                    df.filter(F.col("ts") < _t(10))
                    .select(win.alias("win"), "role", "conv_id"),
                    "conv_id", ["win", "role"])
                .select(F.col("win.start").alias("win_start"), "role",
                        "register", "max_rank").collect()}
    assert got == expected and got


# ---- session windows --------------------------------------------------------

def test_session_window_batch_semantics(spark):
    from openapi_to_rdf_spark.streaming.windows import session_turn_stats

    rows = [
        ("c1", 0, "user", "x", None, _t(0, 0)),
        ("c1", 1, "assistant", "x", None, _t(0, 30)),   # within 1m gap
        ("c1", 2, "user", "x", None, _t(5, 0)),         # > gap: new session
        ("c2", 0, "user", "x", None, _t(0, 10)),
    ]
    got = {(r.conv_id, r.sess_start): r
           for r in session_turn_stats(
               spark.createDataFrame(rows, SCHEMA), gap="1 minute")
           .collect()}
    s1 = got[("c1", _t(0, 0))]
    assert (s1.n_turns, s1.first_turn, s1.last_turn) == (2, 0, 1)
    assert s1.sess_end == _t(1, 30)        # last event + gap
    s2 = got[("c1", _t(5, 0))]
    assert (s2.n_turns, s2.sess_end) == (1, _t(6, 0))
    assert got[("c2", _t(0, 10))].n_turns == 1
    assert len(got) == 3


def test_session_window_stream_merges_fragments(spark, tmp_path):
    import time

    from openapi_to_rdf_spark.streaming.windows import session_turn_stats

    src = tmp_path / "src"
    # one session SPLIT across micro-batches (state must merge fragments);
    # final batch pushes the watermark far past everything so all
    # sessions close and emit in append mode
    spark.createDataFrame(
        [("c1", 0, "user", "x", None, _t(0, 0)),
         ("c2", 0, "user", "x", None, _t(2, 0))], SCHEMA) \
        .coalesce(1).write.parquet(str(src / "b0"))
    time.sleep(1.1)
    spark.createDataFrame(
        [("c1", 1, "assistant", "x", None, _t(0, 40)),
         ("c1", 2, "user", "x", None, _t(7, 0))], SCHEMA) \
        .coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)
    spark.createDataFrame(
        [("c9", 0, "user", "x", None, dt.datetime(2026, 3, 1, 12, 0))],
        SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (session_turn_stats(stream, gap="1 minute", watermark="10 minutes")
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = session_turn_stats(
        spark.read.parquet(str(src), recursiveFileLookup=True),
        gap="1 minute").filter(F.col("conv_id") != "c9")
    got = {(r.conv_id, r.sess_start, r.sess_end, r.n_turns)
           for r in spark.table("sessions").collect()
           if r.conv_id != "c9"}
    expected = {(r.conv_id, r.sess_start, r.sess_end, r.n_turns)
                for r in batch.collect()}
    assert got == expected
    # the split session really merged: c1's first session has both turns
    assert ("c1", _t(0, 0), _t(1, 40), 2) in got
