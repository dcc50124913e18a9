"""Recency anaphora resolution (operators.coref)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.coref import (  # noqa: E402
    coref_triples, resolve_anaphora,
)

SCHEMA = "conv_id string, turn_idx int, text string"


def _resolve(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.conv_id, r.turn_idx): (r.pronoun, r.antecedent)
            for r in resolve_anaphora(df).collect()}


def test_basic_recency(spark):
    got = _resolve(spark, [
        ("c1", 0, "create AlarmRecord#alarm-7 now"),
        ("c1", 1, "ack ManagedElement#me-3 too"),
        ("c1", 2, "then restart it"),
    ])
    assert got == {("c1", 2): ("it", "me-3")}


def test_pronoun_before_any_mention_unresolved(spark):
    got = _resolve(spark, [
        ("c1", 0, "restart it"),
        ("c1", 1, "create AlarmRecord#alarm-7"),
        ("c1", 2, "now delete it"),
    ])
    # turn 0 has no earlier mention; turn 2 resolves to alarm-7
    assert got == {("c1", 2): ("it", "alarm-7")}


def test_last_mention_in_turn_wins(spark):
    got = _resolve(spark, [
        ("c1", 0, "link AlarmRecord#a-1 to TraceJob#t-2 please"),
        ("c1", 1, "then disable it"),
    ])
    assert got[("c1", 1)] == ("it", "t-2")


def test_same_turn_mention_not_antecedent(spark):
    got = _resolve(spark, [
        ("c1", 0, "create AlarmRecord#a-1"),
        ("c1", 1, "clone TraceJob#t-9 and start it"),
    ])
    # strictly-earlier rule: antecedent is a-1, not the same-turn t-9
    assert got[("c1", 1)] == ("it", "a-1")


def test_conversations_isolated(spark):
    got = _resolve(spark, [
        ("c1", 0, "create AlarmRecord#a-1"),
        ("c2", 0, "ping it"),
    ])
    assert got == {}


def test_carries_across_gap_turns(spark):
    got = _resolve(spark, [
        ("c1", 0, "create AlarmRecord#a-1"),
        ("c1", 1, "no entities here"),
        ("c1", 2, "nor here"),
        ("c1", 3, "ok stop it"),
    ])
    assert got[("c1", 3)] == ("it", "a-1")


def test_coref_triples_shape(spark):
    df = spark.createDataFrame(
        [("c1", 0, "create AlarmRecord#a-1"), ("c1", 1, "kill it")], SCHEMA)
    t = coref_triples(resolve_anaphora(df), "urn:ent#").collect()
    assert len(t) == 1
    row = t[0]
    assert row.graph == "kg_coref"
    assert row.s.endswith("c1/1")
    assert row.o == "urn:ent#a-1"
    assert row.o_kind == "iri" and row.o_datatype is None
