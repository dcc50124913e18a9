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
    trip = provenance_triples(prov, ent_ns="ent:", kg_ns="kg:")
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
