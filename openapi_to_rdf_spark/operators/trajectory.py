"""Agent-trajectory analytics over transcript turns — the tool-call
layer of the conversation tables (input_hint column ``tool``): per-
conversation action sequences, Markov transition counts, repeated-call
(retry-loop) detection, and per-trajectory quality features for agentic
training-data curation.

Reference scope note: the reference CLI has no transcript concept; this
extends the graft's transcript surface (operators/extract.py ingests the
same (conv_id, turn_idx, role, text, tool, ts) table) with the
aggregate views an SFT/agent-distillation pipeline filters on: "which
action chains are common", "which trajectories thrash on retries",
"how tool-heavy is this conversation".

Every operator is window/groupBy algebra over (conv_id, turn_idx) — the
partitioning key the whole engine already uses for transcripts, so at
10^12 turns these ride the same per-conversation locality as
sessionize/sft_pairs: one hash exchange on conv_id (bounded-length
conversations → no skew), then arbitrary-size rollups on tool keys
(vocabulary-sized). No Python anywhere; every output is integer counts
or strings, so the DuckDB twin matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START, END = "^", "$"


def _tool_turns(turns: DataFrame) -> DataFrame:
    return turns.filter(F.col("tool").isNotNull()) \
        .select("conv_id", "turn_idx", "tool")


def tool_transitions(turns: DataFrame) -> DataFrame:
    """(prev_tool, tool, n): first-order Markov transition counts over
    each conversation's tool-call sequence, with virtual start (``^``)
    and end (``$``) states — the action-graph edge list. One window per
    conversation + one vocabulary-keyed rollup."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = _tool_turns(turns).withColumn(
        "prev_tool", F.lag("tool", 1, START).over(w))
    last = _tool_turns(turns).groupBy("conv_id").agg(
        F.max_by("tool", "turn_idx").alias("prev_tool"))
    edges = t.select("prev_tool", "tool").unionByName(
        last.select("prev_tool", F.lit(END).alias("tool")))
    return (edges.groupBy("prev_tool", "tool")
            .agg(F.count(F.lit(1)).alias("n")))


def tool_chains(turns: DataFrame, k: int = 3) -> DataFrame:
    """(chain, n): count of each length-k consecutive tool-call sequence
    (sliding, within one conversation) — the common-action-pattern miner.
    ``chain`` is the ``>``-joined tool names. Windows never cross
    conversations; chains shorter than k (tail positions) are dropped."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = _tool_turns(turns)
    cols = [F.lead("tool", i).over(w) for i in range(k)]
    chained = t.select(F.concat_ws(">", *cols).alias("chain"),
                       cols[-1].isNotNull().alias("_full"))
    return (chained.filter(F.col("_full")).groupBy("chain")
            .agg(F.count(F.lit(1)).alias("n")))


def retry_runs(turns: DataFrame, min_len: int = 2) -> DataFrame:
    """(conv_id, tool, start_idx, run_len): maximal runs of the SAME tool
    called on consecutive tool-turns of a conversation with length ≥
    min_len — the retry-loop / thrash signal agentic curation filters
    on. Classic gaps-and-islands: run id = row_number − per-tool
    row_number, all inside the conversation's window."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wt = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    t = (_tool_turns(turns)
         .withColumn("_rn", F.row_number().over(w))
         .withColumn("_rt", F.row_number().over(wt))
         .withColumn("_grp", F.col("_rn") - F.col("_rt")))
    return (t.groupBy("conv_id", "tool", "_grp")
            .agg(F.min("turn_idx").alias("start_idx"),
                 F.count(F.lit(1)).alias("run_len"))
            .filter(F.col("run_len") >= min_len)
            .drop("_grp"))


def trajectory_stats(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_tool_calls, n_tools, max_run, tool_share_e6):
    per-trajectory quality features — total turns, tool-call turns,
    distinct tools, longest same-tool run, and the tool-call share of
    the conversation as an e6 integer. One conv-keyed rollup joined to
    the retry-run maxima (conversations without tool calls keep zeros)."""
    base = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("tool").isNotNull().cast("long"))
        .alias("n_tool_calls"),
        F.countDistinct("tool").alias("n_tools"))
    runs = (retry_runs(turns, min_len=1)
            .groupBy("conv_id").agg(F.max("run_len").alias("max_run")))
    return (base.join(runs, "conv_id", "left")
            .select("conv_id", "n_turns", "n_tool_calls", "n_tools",
                    F.coalesce(F.col("max_run"), F.lit(0)).cast("long")
                    .alias("max_run"),
                    # integer div: exact in any engine, no float rounding
                    F.expr("n_tool_calls * 1000000 div n_turns")
                    .cast("long").alias("tool_share_e6")))


def tool_latency(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(tool, n_calls, sum_wait_s, max_wait_s): how long each tool call
    waits for the NEXT turn of its conversation (the tool's visible
    round-trip in the trace) — latencies as exact integer seconds
    (unix-timestamp difference), rolled up per tool. Calls that end
    their conversation (no next turn) are excluded from the rollup and
    reported via n_unanswered.

    One window per conversation (lead over ALL turns, then filter to
    tool rows) + one tool-vocabulary rollup — same shape as every other
    trajectory operator."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (turns.select("conv_id", "turn_idx", "tool", ts_col)
         .withColumn("_next_ts", F.lead(ts_col).over(w))
         .filter(F.col("tool").isNotNull()))
    lat = (F.unix_timestamp("_next_ts")
           - F.unix_timestamp(ts_col)).cast("long")
    return (t.groupBy("tool")
            .agg(F.sum(F.col("_next_ts").isNotNull().cast("long"))
                 .alias("n_calls"),
                 F.sum(F.col("_next_ts").isNull().cast("long"))
                 .alias("n_unanswered"),
                 F.coalesce(F.sum(lat), F.lit(0)).cast("long")
                 .alias("sum_wait_s"),
                 F.coalesce(F.max(lat), F.lit(0)).cast("long")
                 .alias("max_wait_s")))


def trajectory_fingerprints(turns: DataFrame) -> DataFrame:
    """(conv_id, fp): md5 fingerprint of each conversation's ordered
    (role, tool) sequence — text-independent, so two conversations with
    identical ACTION structure collide even when their wording differs.
    One conv-keyed fold (array_sort on (turn_idx, ...) structs — the
    order-pinned groupBy discipline, no window)."""
    step = F.concat_ws("\x02", F.col("role"),
                       F.coalesce(F.col("tool"), F.lit("-")))
    return (turns.groupBy("conv_id")
            .agg(F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("turn_idx"), step.alias("s")))),
                    lambda x: x.s),
                "\x01")).alias("fp")))


def scripted_conversations(turns: DataFrame,
                           min_convs: int = 3) -> DataFrame:
    """(fp, n_convs, sample_conv): action-structure fingerprints shared
    by ≥ min_convs conversations — the scripted-bot / template-traffic
    detector agentic curation drops or downsamples (the trajectory-level
    sibling of sftpairs.boilerplate_turns' verbatim-text check).
    sample_conv = lexicographic min conv_id, a deterministic exemplar."""
    fp = trajectory_fingerprints(turns)
    return (fp.groupBy("fp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_convs"),
                 F.min("conv_id").alias("sample_conv"))
            .filter(F.col("n_convs") >= min_convs))
