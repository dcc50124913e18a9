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
