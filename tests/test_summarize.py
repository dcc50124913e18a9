"""Extractive summarization (operators/summarize)."""

from openapi_to_rdf_spark.operators.summarize import (
    extractive_summary, turn_salience,
)

TURNS = [
    # conv A: opener (user), long assistant turn, short tool turn, filler
    ("A", 0, "user", "hi there", None),
    ("A", 1, "assistant", "one two three four five six", None),
    ("A", 2, "assistant", "ok", "search"),
    ("A", 3, "user", "thanks", None),
    # conv B: single turn
    ("B", 0, "assistant", "solo", "code"),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def ref_salience(turn_idx, role, text, tool, cap=50):
    toks = len([t for t in text.strip().split() if t])
    return ((2000 if turn_idx == 0 else 0)
            + (1000 if role == "assistant" else 0)
            + (500 if tool is not None else 0)
            + min(toks, cap) * 20)


def test_salience_matches_reference(spark):
    df = spark.createDataFrame(TURNS, SCHEMA)
    got = {(r["conv_id"], r["turn_idx"]): r["salience"]
           for r in turn_salience(df).collect()}
    for (c, i, role, text, tool) in TURNS:
        assert got[(c, i)] == ref_salience(i, role, text, tool)


def test_summary_selects_topk_in_original_order(spark):
    df = spark.createDataFrame(TURNS, SCHEMA)
    got = {r["conv_id"]: r for r in extractive_summary(df, k=2).collect()}
    # A scores: t0=2000+40=2040, t1=1000+120=1120, t2=1000+500+20=1520,
    # t3=20 -> top2 = t0, t2; rendered in turn order
    assert got["A"]["n_kept"] == 2
    assert got["A"]["summary"] == "user: hi there\nassistant: ok"
    assert got["B"]["n_kept"] == 1
    assert got["B"]["summary"] == "assistant: solo"


def test_tie_breaks_on_earlier_turn(spark):
    rows = [("C", 0, "user", "a b", None), ("C", 1, "user", "c d", None),
            ("C", 2, "user", "e f", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = extractive_summary(df, k=1).collect()[0]
    # turn 0 wins its opener bonus; with k=1 only it survives
    assert got["summary"] == "user: a b"
    # equal-score turns 1 vs 2: earlier wins at k=2
    got2 = extractive_summary(df, k=2).collect()[0]
    assert got2["summary"] == "user: a b\nuser: c d"
