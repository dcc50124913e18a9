"""Changelog MERGE + SCD2 (operators/cdc): latest-wins semantics vs a
pure-Python replay, base survival, delete/reinsert, interval chaining.
The driver's ``cdc_user_state`` / ``user_scd2`` oracles additionally pin
both operators against DuckDB window SQL on the events table."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.cdc import (  # noqa: E402
    apply_changelog, changelog_to_scd2,
)

BASE = [("a", 10), ("b", 20), ("c", 30)]
#            key  seq  op   val
CHANGES = [("a", 1, "U", 11),
           ("a", 3, "U", 13),   # latest 'a' → 13
           ("b", 2, "D", None),  # 'b' deleted…
           ("d", 1, "U", 41),
           ("d", 2, "D", None),
           ("d", 5, "U", 45),   # …'d' deleted then reinserted → 45
           ("e", 9, "D", None)]  # delete of a key that never existed


def _frames(spark):
    base = spark.createDataFrame(BASE, ["key", "val"])
    changes = spark.createDataFrame(CHANGES, ["key", "seq", "op", "val"])
    return base, changes


def test_apply_changelog_latest_wins(spark):
    base, changes = _frames(spark)
    got = {r.key: r.val
           for r in apply_changelog(base, changes, ["key"], ["seq"])
           .collect()}
    # c: base survives untouched; b deleted; d reinserted; e never exists
    assert got == {"a": 13, "c": 30, "d": 45}


def test_apply_changelog_matches_python_replay(spark):
    keys = [f"k{i % 37}" for i in range(400)]
    changes = [(k, s, "D" if (s * 7 + i) % 5 == 0 else "U", s * 100 + i)
               for i, k in enumerate(keys) for s in [(i * 13) % 101]]
    base = [(f"k{i}", -i) for i in range(0, 60, 2)]  # overlaps + extras
    state = {k: v for k, v in base}
    for k, s, op, v in sorted(changes, key=lambda c: (c[1], c[3])):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    got = {r.key: r.val for r in apply_changelog(
        spark.createDataFrame(base, ["key", "val"]),
        spark.createDataFrame(changes, ["key", "seq", "op", "val"])
        .repartition(13),
        ["key"], ["seq", "val"]).collect()}
    assert got == state


def test_scd2_intervals_chain(spark):
    _, changes = _frames(spark)
    rows = changelog_to_scd2(changes, ["key"], "seq").collect()
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.key, r.seq)):
        by_key.setdefault(r.key, []).append(r)
    # a: [1,3) then [3,NULL) current
    a = by_key["a"]
    assert [(r.seq, r.valid_to, r.is_current) for r in a] == \
        [(1, 3, False), (3, None, True)]
    # d: [1,2) closed by the delete, then [5,NULL) current
    d = by_key["d"]
    assert [(r.seq, r.valid_to, r.is_current) for r in d] == \
        [(1, 2, False), (5, None, True)]
    # deletes emit no rows; 'e' absent entirely
    assert "e" not in by_key and "b" not in by_key
    # at most one current version per key
    for k, rs in by_key.items():
        assert sum(r.is_current for r in rs) <= 1


def test_scd2_current_matches_merge(spark):
    """The SCD2 table's current rows == apply_changelog over empty base —
    the two views of the same changelog must agree."""
    base0, changes = _frames(spark)
    merged = {r.key: r.val for r in apply_changelog(
        base0.limit(0), changes, ["key"], ["seq"]).collect()}
    current = {r.key: r.val
               for r in changelog_to_scd2(changes, ["key"], "seq")
               .filter("is_current").collect()}
    assert current == merged


def test_snapshot_diff_added_removed_changed(spark):
    from openapi_to_rdf_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3")],
        ["s", "p", "o"])
    new = spark.createDataFrame(
        [("a", "p", "1"),            # unchanged → silent
         ("b", "p", "9"),            # changed → removed + added
         ("d", "p", "4")],           # new → added
        ["s", "p", "o"])             # c gone → removed
    got = {(r.op, r.s, r.o)
           for r in snapshot_diff(old, new).collect()}
    assert got == {("added", "b", "9"), ("added", "d", "4"),
                   ("removed", "b", "2"), ("removed", "c", "3")}


def test_snapshot_diff_single_shuffle_and_dup_collapse(spark):
    from openapi_to_rdf_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [("a", "p", "1"), ("a", "p", "1")], ["s", "p", "o"])
    new = spark.createDataFrame([("a", "p", "1")], ["s", "p", "o"])
    diff = snapshot_diff(old, new)
    assert diff.count() == 0  # duplicate within a side is not a change
    plan = diff._jdf.queryExecution().executedPlan().toString()
    # one hash-partition exchange (AQE may add nothing else); never a join
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
