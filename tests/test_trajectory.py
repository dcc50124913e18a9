"""Agent-trajectory analytics (operators/trajectory) against
hand-computed fixtures."""

import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.trajectory import (
    retry_runs, tool_chains, tool_transitions, trajectory_stats,
)

# conv A: tools  search, search, browse, None, code
# conv B: tools  None, code, code, code
# conv C: no tool calls at all
TURNS = [
    ("A", 0, "assistant", "t", "search"),
    ("A", 1, "assistant", "t", "search"),
    ("A", 2, "assistant", "t", "browse"),
    ("A", 3, "user", "t", None),
    ("A", 4, "assistant", "t", "code"),
    ("B", 0, "user", "t", None),
    ("B", 1, "assistant", "t", "code"),
    ("B", 2, "assistant", "t", "code"),
    ("B", 3, "assistant", "t", "code"),
    ("C", 0, "user", "t", None),
    ("C", 1, "assistant", "t", None),
]


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string, "
               "tool string")


def test_tool_transitions(turns):
    got = {(r["prev_tool"], r["tool"]): r["n"]
           for r in tool_transitions(turns).collect()}
    assert got == {
        ("^", "search"): 1, ("search", "search"): 1,
        ("search", "browse"): 1, ("browse", "code"): 1,
        ("code", "$"): 2,
        ("^", "code"): 1, ("code", "code"): 2,
    }


def test_tool_chains(turns):
    got = {r["chain"]: r["n"] for r in tool_chains(turns, k=3).collect()}
    # A: search>search>browse, search>browse>code; B: code>code>code
    assert got == {"search>search>browse": 1, "search>browse>code": 1,
                   "code>code>code": 1}
    got2 = {r["chain"]: r["n"] for r in tool_chains(turns, k=2).collect()}
    assert got2 == {"search>search": 1, "search>browse": 1,
                    "browse>code": 1, "code>code": 2}


def test_retry_runs(turns):
    got = {(r["conv_id"], r["tool"], r["start_idx"]): r["run_len"]
           for r in retry_runs(turns).collect()}
    assert got == {("A", "search", 0): 2, ("B", "code", 1): 3}
    # min_len=1 includes singleton runs
    all_runs = retry_runs(turns, min_len=1).collect()
    assert len(all_runs) == 4  # A: search,browse,code ; B: code


def test_trajectory_stats(turns):
    got = {r["conv_id"]: r for r in trajectory_stats(turns).collect()}
    a, b, c = got["A"], got["B"], got["C"]
    assert (a["n_turns"], a["n_tool_calls"], a["n_tools"],
            a["max_run"]) == (5, 4, 3, 2)
    assert a["tool_share_e6"] == 800000
    assert (b["n_turns"], b["n_tool_calls"], b["n_tools"],
            b["max_run"]) == (4, 3, 1, 3)
    assert b["tool_share_e6"] == 750000
    assert (c["n_turns"], c["n_tool_calls"], c["n_tools"],
            c["max_run"], c["tool_share_e6"]) == (2, 0, 0, 0, 0)


def test_transitions_conserve_mass(turns):
    """Σ out-edges from ^ == #convs with tool calls == Σ in-edges to $."""
    tr = tool_transitions(turns)
    starts = tr.filter(F.col("prev_tool") == "^") \
        .agg(F.sum("n")).collect()[0][0]
    ends = tr.filter(F.col("tool") == "$") \
        .agg(F.sum("n")).collect()[0][0]
    assert starts == ends == 2


def test_stream_tool_transitions_matches_batch(spark, tmp_path):
    """Stateful streaming transitions == batch tool_transitions (minus
    the '$' end rows a stream cannot emit), with conversations SPLIT
    across micro-batches so boundary transitions require state."""
    import pyspark.sql.functions as SF

    from openapi_to_rdf_spark.streaming.stateful import (
        stream_tool_transitions)

    turns = spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string, "
               "tool string")
    src = tmp_path / "src"
    turns.filter(SF.col("turn_idx") < 2).coalesce(1) \
        .write.parquet(str(src / "c0"))
    turns.filter(SF.col("turn_idx") >= 2).coalesce(1) \
        .write.parquet(str(src / "c1"))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    # generous quiet_ms: under full-suite load the default 30s CAN elapse
    # between availableNow micro-batches, firing the '$'-and-evict path
    # mid-test and restarting conversations with spurious '^' edges
    q = (stream_tool_transitions(stream, quiet_ms=600_000).writeStream
         .format("memory").queryName("ttrans").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["prev_tool"], r["tool"]): r["n"]
           for r in spark.table("ttrans")
           .groupBy("prev_tool", "tool")
           .agg(SF.count(SF.lit(1)).alias("n")).collect()}
    exp = {(r["prev_tool"], r["tool"]): r["n"]
           for r in tool_transitions(turns).collect()
           if r["tool"] != "$"}
    assert got == exp


def test_tool_latency(spark):
    from datetime import datetime

    from openapi_to_rdf_spark.operators.trajectory import tool_latency

    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        ("A", 0, "assistant", "t", "search", ts(0)),
        ("A", 1, "assistant", "t", None, ts(5)),      # search waits 5s
        ("A", 2, "assistant", "t", "search", ts(9)),
        ("A", 3, "user", "t", None, ts(21)),          # search waits 12s
        ("B", 0, "assistant", "t", "code", ts(0)),    # unanswered
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {r["tool"]: r for r in tool_latency(df).collect()}
    s = got["search"]
    assert (s["n_calls"], s["n_unanswered"], s["sum_wait_s"],
            s["max_wait_s"]) == (2, 0, 17, 12)
    c = got["code"]
    assert (c["n_calls"], c["n_unanswered"], c["sum_wait_s"],
            c["max_wait_s"]) == (0, 1, 0, 0)
    assert t0  # quiet lint


def test_trajectory_fingerprints_and_scripted(spark):
    from openapi_to_rdf_spark.operators.trajectory import (
        scripted_conversations, trajectory_fingerprints)

    rows = []
    # convs 1..3: identical (role, tool) structure, different text
    for c in ("c1", "c2", "c3"):
        rows += [(c, 0, "user", f"{c} hello", None),
                 (c, 1, "assistant", f"{c} reply", "search")]
    # conv 4: different structure (extra turn)
    rows += [("c4", 0, "user", "x", None),
             ("c4", 1, "assistant", "y", "search"),
             ("c4", 2, "user", "z", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")

    fps = {r["conv_id"]: r["fp"]
           for r in trajectory_fingerprints(df).collect()}
    assert fps["c1"] == fps["c2"] == fps["c3"]
    assert fps["c4"] != fps["c1"]

    got = scripted_conversations(df, min_convs=3).collect()
    assert len(got) == 1
    assert (got[0]["n_convs"], got[0]["sample_conv"]) == (3, "c1")
    # determinism under repartition
    again = scripted_conversations(df.repartition(5), min_convs=3) \
        .collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_stream_tool_transitions_evicts_state_with_end_edge(spark, tmp_path):
    """ADVICE r2: quiet conversations must be EVICTED (ProcessingTime
    timeout), emitting the batch operator's virtual '$' end edge — state
    is O(active convs), not O(all convs ever seen)."""
    import time

    import pyspark.sql.functions as SF

    from openapi_to_rdf_spark.streaming.stateful import (
        stream_tool_transitions)

    turns = spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string, "
               "tool string")
    src = tmp_path / "src"
    turns.coalesce(1).write.parquet(str(src / "c0"))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (stream_tool_transitions(stream, quiet_ms=500).writeStream
         .format("memory").queryName("ttrans_evict").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="1 second").start())
    try:
        # wait for the quiet-timeout batch to fire the '$' edges
        deadline = time.time() + 60
        while time.time() < deadline:
            ends = {(r["conv_id"], r["prev_tool"], r["turn_idx"])
                    for r in spark.table("ttrans_evict")
                    .filter(SF.col("tool") == "$").collect()}
            if len(ends) == 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    # conv A last tool 'code' at idx 4; conv B last tool 'code' at idx 3;
    # conv C never entered state (no tool calls)
    assert ends == {("A", "code", 4), ("B", "code", 3)}
