"""Watermarked stream-stream interval join (streaming/joins): batch
semantics pinned by hand (bound honored, tool+conv keys honored, outer
rows NULL-padded), then stream == batch equivalence with both sides
arriving in two micro-batch chunks."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sources.transcripts import (  # noqa: E402
    synth_tool_results, synth_transcripts,
)
from openapi_to_rdf_spark.streaming.joins import (  # noqa: E402
    provenance_triples, tool_result_provenance,
)


def _expected_pairs(turns, results, bound_s=60):
    t = turns.filter(F.col("tool").isNotNull()) \
        .select("conv_id", "turn_idx", "tool", F.col("ts").alias("t_ts"))
    r = results.select(F.col("conv_id").alias("rc"),
                       F.col("tool").alias("rt"),
                       "result_id", F.col("ts").alias("r_ts"))
    j = t.join(r, (t.conv_id == r.rc) & (t.tool == r.rt)
               & (r.r_ts >= t.t_ts)
               & (F.unix_timestamp(r.r_ts)
                  - F.unix_timestamp(t.t_ts) <= bound_s))
    return {(x.conv_id, x.turn_idx, x.result_id) for x in j.collect()}


def test_batch_inner_join_matches_hand_join(spark):
    turns = synth_transcripts(spark, 60, seed=5)
    results = synth_tool_results(turns, seed=5)
    got = tool_result_provenance(turns, results).collect()
    assert ({(r.conv_id, r.turn_idx, r.result_id) for r in got}
            == _expected_pairs(turns, results))
    # latency is the synthetic 1-80s delay, always within (0, 60s] here
    assert all(0 < r.latency_ms <= 60_000 for r in got)
    # the 61-80s delays exist and are excluded — the bound does real work
    n_tool_turns = turns.filter(F.col("tool").isNotNull()).count()
    assert 0 < len(got) < n_tool_turns


def test_batch_left_outer_pads_unmatched(spark):
    turns = synth_transcripts(spark, 60, seed=5)
    results = synth_tool_results(turns, seed=5)
    out = tool_result_provenance(turns, results, how="leftOuter").collect()
    tool_turns = {(r.conv_id, r.turn_idx) for r in
                  turns.filter(F.col("tool").isNotNull())
                  .select("conv_id", "turn_idx").collect()}
    matched = [r for r in out if r.result_id is not None]
    unmatched = [r for r in out if r.result_id is None]
    # every invocation appears (matched 1+ times, or NULL-padded once);
    # a turn can match several results (same conv+tool within bound)
    assert {(r.conv_id, r.turn_idx) for r in out} == tool_turns
    assert ({(r.conv_id, r.turn_idx, r.result_id) for r in matched}
            == _expected_pairs(turns, results))
    assert unmatched and all(r.latency_ms is None for r in unmatched)
    assert not ({(r.conv_id, r.turn_idx) for r in unmatched}
                & {(r.conv_id, r.turn_idx) for r in matched})


def test_provenance_triples_shape(spark):
    turns = synth_transcripts(spark, 20, seed=5)
    prov = tool_result_provenance(turns, synth_tool_results(turns, seed=5))
    trip = provenance_triples(prov, kg_ns="kg:", turn_ns="turn:",
                              result_ns="res:")
    rows = trip.collect()
    n = prov.count()
    assert len(rows) == 2 * n
    preds = {r.p for r in rows}
    assert preds == {"kg:producedResult", "kg:resultStatus"}


def test_stream_matches_batch(spark, tmp_path):
    turns = synth_transcripts(spark, 80, seed=9)
    results = synth_tool_results(turns, seed=9)

    tdir, rdir = tmp_path / "turns", tmp_path / "results"
    # both sides arrive in two chunks split by conversation range, so
    # matches in the second chunk need state carried across micro-batches
    for df, d in ((turns, tdir), (results, rdir)):
        df.filter(F.col("conv_id") < "c000000040").coalesce(1) \
            .write.parquet(str(d / "c0"))
        df.filter(F.col("conv_id") >= "c000000040").coalesce(1) \
            .write.parquet(str(d / "c1"))

    ts = (spark.readStream.schema(turns.schema)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(str(tdir)))
    rs = (spark.readStream.schema(results.schema)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(str(rdir)))
    q = (tool_result_provenance(ts, rs).writeStream
         .format("memory").queryName("prov").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.conv_id, r.turn_idx, r.result_id)
           for r in spark.table("prov").collect()}
    assert got == _expected_pairs(turns, results)


def test_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """STREAMING left-outer semantics: an invocation with no result emits
    its NULL-padded row only once the watermark passes t_ts + bound —
    driven here by two later watermark-pusher batches (emission happens
    a batch after the advance, hence two)."""
    import datetime as dt
    import time

    SCHEMA_T = ("conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp")
    SCHEMA_R = "conv_id string, tool string, result_id string, " \
               "status string, ts timestamp"
    t0 = dt.datetime(2026, 6, 1, 10, 0, 0)

    tdir, rdir = tmp_path / "t", tmp_path / "r"
    # b0: one matched invocation (c1) and one that will NEVER match (c2)
    spark.createDataFrame(
        [("c1", 0, "tool", "x", "search", t0),
         ("c2", 0, "tool", "x", "query_nrm", t0)], SCHEMA_T) \
        .coalesce(1).write.parquet(str(tdir / "b0"))
    spark.createDataFrame(
        [("c1", "search", "res-1", "ok",
          t0 + dt.timedelta(seconds=30))], SCHEMA_R) \
        .coalesce(1).write.parquet(str(rdir / "b0"))
    # b1 + b2: watermark pushers far beyond t0 + bound + watermark,
    # on BOTH sides (the join watermark is the min of the two)
    for i, delta in ((1, dt.timedelta(hours=2)), (2, dt.timedelta(hours=4))):
        time.sleep(1.1)
        spark.createDataFrame(
            [("cz", 99, "tool", "x", "noop", t0 + delta)], SCHEMA_T) \
            .coalesce(1).write.parquet(str(tdir / f"b{i}"))
        spark.createDataFrame(
            [("cz", "noop", f"res-z{i}", "ok", t0 + delta)], SCHEMA_R) \
            .coalesce(1).write.parquet(str(rdir / f"b{i}"))

    ts = (spark.readStream.schema(SCHEMA_T)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(str(tdir)))
    rs = (spark.readStream.schema(SCHEMA_R)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(str(rdir)))
    q = (tool_result_provenance(ts, rs, watermark="10 minutes",
                                how="leftOuter")
         .writeStream.format("memory").queryName("prov_outer")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = {r.conv_id: r for r in spark.table("prov_outer").collect()}
    assert rows["c1"].result_id == "res-1"          # matched normally
    # the unmatched invocation DID emit, NULL-padded, after the
    # watermark passed — the streaming outer-join guarantee
    assert "c2" in rows and rows["c2"].result_id is None
    assert rows["c2"].latency_ms is None
