"""Custom stateful streaming operator: per-conversation progress tracking.

``applyInPandasWithState`` keeps one state row per conversation (turn count,
turn-index bounds, latest event time) and emits an updated summary on every
micro-batch that touches the conversation; a processing-time timeout fires a
final ``complete=true`` row when a conversation goes quiet — the streaming
analogue of "conversation finished, release its turns to the KG pipeline".

State is O(active conversations), not O(turns): each group's incoming batch
is reduced to four numbers before it touches state, so a 10^12-turn stream
holds state only for conversations inside the quiet window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, IntegerType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("n_turns", LongType(), False),
    StructField("min_turn_idx", IntegerType(), True),
    StructField("max_turn_idx", IntegerType(), True),
    StructField("complete", BooleanType(), False),
])

STATE_SCHEMA = StructType([
    StructField("n_turns", LongType(), False),
    StructField("min_turn_idx", IntegerType(), True),
    StructField("max_turn_idx", IntegerType(), True),
])


def track_conversations(stream: DataFrame, quiet_ms: int = 30_000) -> DataFrame:
    """Streaming transcript turns -> per-conversation running summaries."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        conv_id = key[0]
        if state.hasTimedOut:
            n, lo, hi = state.get
            state.remove()
            yield pd.DataFrame([(conv_id, n, lo, hi, True)],
                               columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return

        n, lo, hi = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_lo = int(pdf["turn_idx"].min())
            batch_hi = int(pdf["turn_idx"].max())
            lo = batch_lo if lo is None else min(lo, batch_lo)
            hi = batch_hi if hi is None else max(hi, batch_hi)
        state.update((n, lo, hi))
        state.setTimeoutDuration(quiet_ms)
        yield pd.DataFrame([(conv_id, n, lo, hi, False)],
                           columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return (stream.groupBy("conv_id").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.ProcessingTimeTimeout))


TRANSITION_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("prev_tool", StringType(), False),
    StructField("tool", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
])

TRANSITION_STATE = StructType([
    StructField("last_tool", StringType(), True),
    StructField("last_idx", IntegerType(), True),
])


def stream_tool_transitions(stream: DataFrame,
                            quiet_ms: int = 30_000) -> DataFrame:
    """Streaming agent-trajectory edges: one (conv_id, prev_tool, tool,
    turn_idx) row per tool-call turn, with the previous tool carried in
    per-conversation state across micro-batches ('^' when the
    conversation has no earlier tool call) — the stream counterpart of
    operators/trajectory.tool_transitions. When a conversation goes
    quiet for ``quiet_ms`` the batch operator's virtual '$' end edge is
    emitted and the state row is EVICTED (ProcessingTimeTimeout, the
    track_conversations discipline — ADVICE r2: NoTimeout made state
    grow with every conversation ever seen). State is therefore
    O(conversations active within the quiet window), not O(all convs).

    Contract: a conversation's turns arrive in non-decreasing turn_idx
    order across batches (the pipeline's stable (conv_id, turn_idx)
    ordering invariant); within a batch the group is sorted. Late
    (lower-idx) rows are DROPPED, never reordered. A conversation that
    resumes AFTER its quiet-timeout eviction starts a fresh episode
    ('^' again) — '$'/'^' bracket quiet-separated episodes, exactly the
    sessionization batch pipelines apply downstream."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        conv_id = key[0]
        cols = [f.name for f in TRANSITION_SCHEMA.fields]
        if state.hasTimedOut:
            last_tool, last_idx = state.get
            state.remove()
            yield pd.DataFrame([(conv_id, last_tool, "$", last_idx)],
                               columns=cols)
            return

        last_tool, last_idx = state.get if state.exists else (None, None)
        rows = []
        for pdf in pdfs:
            t = pdf[pdf["tool"].notna()].sort_values("turn_idx")
            for idx, tool in zip(t["turn_idx"], t["tool"]):
                idx = int(idx)
                if last_idx is not None and idx <= last_idx:
                    continue  # late arrival: dropped by contract
                rows.append((conv_id,
                             last_tool if last_tool is not None else "^",
                             tool, idx))
                last_tool, last_idx = tool, idx
        if last_idx is not None:
            state.update((last_tool, last_idx))
            state.setTimeoutDuration(quiet_ms)
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (stream.groupBy("conv_id").applyInPandasWithState(
        update, TRANSITION_SCHEMA, TRANSITION_STATE, "append",
        GroupStateTimeout.ProcessingTimeTimeout))
