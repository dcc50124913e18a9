"""Conversation-to-training-example operators (operators/sftpairs)."""

import pytest

from openapi_to_rdf_spark.operators.sftpairs import (
    boilerplate_turns, context_response_pairs, preference_pairs,
    render_conversations,
)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "weather?"),
        ("c1", 3, "assistant", "sunny"),
        ("c1", 4, "user", "thanks"),
        ("c1", 5, "assistant", "welcome"),
        # c2 opens with the assistant (empty context case)
        ("c2", 0, "assistant", "greetings"),
        ("c2", 1, "user", "hi"),
        ("c2", 2, "assistant", "hello"),
    ]
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "role", "text"])


def test_context_response_pairs(spark, turns):
    got = {(r.conv_id, r.turn_idx): (r.context, r.n_context, r.response)
           for r in context_response_pairs(turns, "assistant",
                                           max_context=2).collect()}
    assert got[("c1", 1)] == ("user: hi", 1, "hello")
    # bounded window: only the 2 preceding turns survive
    assert got[("c1", 3)] == ("assistant: hello\nuser: weather?", 2, "sunny")
    assert got[("c1", 5)] == ("assistant: sunny\nuser: thanks", 2, "welcome")
    # conversation opener: empty context, zero turns
    assert got[("c2", 0)] == ("", 0, "greetings")
    assert set(got) == {("c1", 1), ("c1", 3), ("c1", 5),
                        ("c2", 0), ("c2", 2)}


def test_render_conversations_order_pinned(spark, turns):
    # shuffle the input rows; the render must still be index-ordered
    got = {r.conv_id: (r.n_turns, r.rendered)
           for r in render_conversations(
               turns.orderBy("text").repartition(5)).collect()}
    assert got["c2"] == (3, "assistant: greetings\nuser: hi\n"
                            "assistant: hello")
    assert got["c1"][0] == 6
    assert got["c1"][1].startswith("user: hi\nassistant: hello")


def test_preference_pairs(spark):
    rows = [
        ("p1", "bad", 1, "a", 1), ("p1", "best", 9, "b", 2),
        ("p1", "mid", 5, "c", 3),
        ("p2", "only", 4, "d", 4),                    # single candidate
        ("p3", "tie-lo", 3, "e", 5), ("p3", "tie-hi", 3, "f", 6),  # no gap
    ]
    df = spark.createDataFrame(
        rows, ["context", "response", "score", "conv_id", "turn_idx"])
    out = preference_pairs(df, "score", min_margin=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.context, r.chosen, r.rejected) == ("p1", "best", "bad")
    assert (r.chosen_score, r.rejected_score, r.n_candidates) == (9, 1, 3)


def test_preference_tiebreak_deterministic(spark):
    # equal scores everywhere: chosen/rejected resolve by the id struct
    rows = [("p", f"r{i}", 7, f"c{i}", i) for i in range(4)]
    df = spark.createDataFrame(
        rows, ["context", "response", "score", "conv_id", "turn_idx"])
    out = preference_pairs(df, "score", min_margin=0).collect()
    assert len(out) == 1
    assert out[0].chosen == "r3" and out[0].rejected == "r0"


def test_boilerplate_turns(spark, turns):
    rep = {r.text: (r.n_convs, r.n_turns)
           for r in boilerplate_turns(turns, min_convs=2).collect()}
    # "hi" and "hello" each appear in both conversations
    assert rep == {"hi": (2, 2), "hello": (2, 2)}
