"""Dialogue topic segmentation (operators.segments)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.segments import (  # noqa: E402
    segment_stats, segment_turns,
)

SCHEMA = "conv_id string, turn_idx int, text string"


def _run(spark, rows, threshold=0.2):
    df = spark.createDataFrame(rows, SCHEMA)
    out = segment_turns(df, threshold=threshold).collect()
    return {(r.conv_id, r.turn_idx): (r.segment, r.jaccard_e6) for r in out}


def test_topic_shift_starts_new_segment(spark):
    got = _run(spark, [
        ("c1", 0, "alarm threshold config for the alarm record"),
        ("c1", 1, "raise the alarm threshold config value"),
        ("c1", 2, "unrelated billing invoice question entirely"),
        ("c1", 3, "billing invoice total question"),
    ])
    assert got[("c1", 0)][0] == 0
    assert got[("c1", 1)][0] == 0          # cohesive with turn 0
    assert got[("c1", 2)][0] == 1          # topic shift
    assert got[("c1", 3)][0] == 1          # cohesive with turn 2


def test_first_turn_jaccard_null(spark):
    got = _run(spark, [("c1", 0, "hello world")])
    assert got[("c1", 0)] == (0, None)


def test_jaccard_value_exact(spark):
    # tokens {a,b,c} then {b,c,d}: |∩|=2 |∪|=4 → 0.5
    got = _run(spark, [("c1", 0, "a b c"), ("c1", 1, "b c d")],
               threshold=0.2)
    assert got[("c1", 1)] == (0, 500000)


def test_conversations_independent(spark):
    got = _run(spark, [
        ("c1", 0, "alpha beta"), ("c1", 1, "gamma delta"),
        ("c2", 0, "alpha beta"),
    ])
    assert got[("c1", 0)][0] == 0 and got[("c1", 1)][0] == 1
    assert got[("c2", 0)][0] == 0


def test_segment_stats(spark):
    df = spark.createDataFrame([
        ("c1", 0, "alpha beta"), ("c1", 1, "alpha beta"),
        ("c1", 2, "omega zulu"),
    ], SCHEMA)
    stats = {(r.conv_id, r.segment): (r.first_turn, r.last_turn, r.n_turns)
             for r in segment_stats(segment_turns(df)).collect()}
    assert stats == {("c1", 0): (0, 1, 2), ("c1", 1): (2, 2, 1)}


def test_duplicate_tokens_are_set_semantics(spark):
    # "a a a b" vs "a b" are identical as sets → jaccard 1.0, same segment
    got = _run(spark, [("c1", 0, "a a a b"), ("c1", 1, "a b")])
    assert got[("c1", 1)] == (0, 1000000)
