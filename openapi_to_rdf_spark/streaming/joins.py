"""Watermarked stream-stream interval join: tool-call → tool-result
provenance over live transcript streams.

The KG pipeline emits a turn's tool invocation as a triple
(operators/extract.py); when tool RESULTS arrive as a second event
stream, attaching each invocation to the result that follows within a
bound is the classic stream-stream interval join — the one Structured
Streaming operator class the rest of streaming/ (ingest, stateful,
windows, incremental) didn't yet cover.

Scale design:

- BOTH sides are watermarked and the join carries an explicit time-range
  condition (``r_ts`` in ``[t_ts, t_ts + bound]``), so Spark bounds the
  join state: left rows are dropped once the right watermark passes
  ``t_ts + bound``, right rows once the left watermark passes ``r_ts``.
  Without the range condition the state grows without bound — the same
  failure mode ADVICE r1 flagged for the dedup keys, avoided here by
  construction.
- The equi-part of the condition (conv_id, tool) hash-partitions both
  streams; the range part only filters within a partition. At 10^12-turn
  scale the state store holds ~(arrival rate × watermark) rows per key,
  independent of history length.
- The same function runs in BATCH (withWatermark is a documented no-op
  on batch DataFrames), which is how tests pin stream == batch
  equivalence, and how backfills reuse the exact streaming logic.

``how='leftOuter'`` emits unmatched invocations with NULL result columns
— in streaming mode those rows surface only after the watermark passes
(so a finite availableNow run may withhold trailing unmatched rows);
batch mode emits them immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tool_result_provenance(turns: DataFrame, results: DataFrame, *,
                           bound: str = "60 seconds",
                           watermark: str = "1 hour",
                           how: str = "inner") -> DataFrame:
    """Join each tool-invoking turn to the result event of the SAME
    (conv_id, tool) whose timestamp lands within ``[ts, ts + bound]``.

    ``turns``: (conv_id, turn_idx, role, text, tool, ts) — rows with NULL
    ``tool`` are not invocations and are filtered out. ``results``:
    (conv_id, tool, result_id, status, ts). Output: one row per matched
    (invocation, result) pair with ``latency_ms``.
    """
    t = (turns.filter(F.col("tool").isNotNull())
         .select("conv_id", "turn_idx", "tool",
                 F.col("ts").alias("t_ts"))
         .withWatermark("t_ts", watermark))
    r = (results.select(F.col("conv_id").alias("r_conv_id"),
                        F.col("tool").alias("r_tool"),
                        "result_id", "status",
                        F.col("ts").alias("r_ts"))
         .withWatermark("r_ts", watermark))
    cond = ((t["conv_id"] == r["r_conv_id"])
            & (t["tool"] == r["r_tool"])
            & (r["r_ts"] >= t["t_ts"])
            & (r["r_ts"] <= t["t_ts"] + F.expr(f"INTERVAL {bound}")))
    joined = t.join(r, cond, how)
    return joined.select(
        "conv_id", "turn_idx", "tool", "result_id", "status",
        "t_ts", "r_ts",
        (F.unix_millis(F.col("r_ts"))
         - F.unix_millis(F.col("t_ts"))).alias("latency_ms"))


def provenance_triples(prov: DataFrame, *, kg_ns: str, turn_ns: str,
                       result_ns: str) -> DataFrame:
    """Matched provenance rows → (s, p, o) triples: the turn IRI gets a
    ``producedResult`` edge and the result node a ``resultStatus`` — the
    enrichment the graph materializer appends alongside the extraction
    triples. ``turn_ns`` must be the SAME namespace extraction mints
    turn subjects under (operators/extract.TURN_NS, scheme
    ``{ns}{conv_id}/{turn_idx}``) so the edges attach to existing graph
    nodes rather than orphan IRIs."""
    turn_iri = F.concat(F.lit(turn_ns), F.col("conv_id"), F.lit("/"),
                        F.col("turn_idx").cast("string"))
    res_iri = F.concat(F.lit(result_ns), F.col("result_id"))
    produced = prov.select(turn_iri.alias("s"),
                           F.lit(kg_ns + "producedResult").alias("p"),
                           res_iri.alias("o"))
    status = prov.select(res_iri.alias("s"),
                         F.lit(kg_ns + "resultStatus").alias("p"),
                         F.col("status").alias("o"))
    return produced.unionByName(status)
