"""Event operators: sessionization, as-of join, rollup — crafted-row
semantics tests (the DuckDB oracles cover them at table scale)."""

import datetime as dt
import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.events import (  # noqa: E402
    asof_join, event_rollup, hypertable_rollup, range_join, sessionize,
)


def _ts(minute):
    return dt.datetime(2026, 1, 1, 0, minute)


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 100, _ts(0)), (2, 100, _ts(10)),   # session 1 (gap 10m < 30m)
        (3, 100, _ts(50)),                     # session 2 (gap 40m)
        (4, 200, _ts(5)),                      # other user -> own session 1
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"]) \
        .withColumn("value", F.lit(1.0))
    got = {r.event_id: r.session_seq for r in sessionize(ev, 30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, _ts(20)), (12, 1, _ts(2)), (13, 2, _ts(9))],
        ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(3), 30), (1, _ts(20), 200), (2, _ts(50), 999)],
        ["user_id", "ts", "ref"])
    got = {r.event_id: r.ref for r in
           asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                     right_cols=["ref"]).collect()}
    assert got[10] == 30      # latest right at/before 00:05 is 00:03
    assert got[11] == 200     # equal timestamp counts (<=)
    assert got[12] is None    # nothing before 00:02
    assert got[13] is None    # user 2's only right row is later


def test_range_join_semantics_match_bruteforce(spark):
    """Bin-bucketed range join == naive inequality join, across bin
    widths that are shorter than, equal to, and longer than the
    intervals — including points exactly at a start (in, half-open)
    and exactly at an end (out)."""
    pts = spark.createDataFrame(
        [(i, 1 + i % 2, _ts(i)) for i in range(60)],
        ["event_id", "user_id", "ts"])
    iv = spark.createDataFrame(
        [(100, 1, _ts(0), _ts(10)), (101, 1, _ts(10), _ts(11)),
         (102, 2, _ts(5), _ts(45)), (103, 1, _ts(30), _ts(30)),  # empty
         (104, 2, _ts(59), _ts(59))],                            # empty
        ["win_id", "user_id", "start_ts", "end_ts"])
    expect = sorted(
        (p.event_id, w.win_id)
        for p in pts.collect() for w in iv.collect()
        if p.user_id == w.user_id and w.start_ts <= p.ts < w.end_ts)
    for bins in (1, 10, 120):
        got = sorted((r.event_id, r.win_id) for r in range_join(
            pts, iv, "ts", "start_ts", "end_ts", on="user_id",
            bin_minutes=bins, interval_cols=["win_id"]).collect())
        assert got == expect, f"bin_minutes={bins}"
    assert expect  # non-vacuous


def test_range_join_plans_equi_join_not_product(spark):
    """The whole point: the plan must be a hash equi-join on (bin, key),
    never BroadcastNestedLoopJoin / CartesianProduct."""
    pts = spark.createDataFrame([(1, 1, _ts(0))],
                                ["event_id", "user_id", "ts"])
    iv = spark.createDataFrame([(9, 1, _ts(0), _ts(5))],
                               ["win_id", "user_id", "start_ts", "end_ts"])
    plan = range_join(pts, iv, "ts", "start_ts", "end_ts", on="user_id",
                      interval_cols=["win_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hypertable_rollup_levels_consistent(spark):
    """Coarser levels (computed from finer partials) must equal a direct
    per-level aggregation of the raw events; every level conserves the
    total count and sum."""
    import pytest

    rows = [(i, dt.datetime(2026, 1, 1 + i % 3, i % 24, (7 * i) % 60),
             0.125 * i) for i in range(200)]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    got = hypertable_rollup(ev, widths_minutes=(15, 60, 1440)).collect()
    by_level = {}
    for r in got:
        by_level.setdefault(r.gran_min, {})[r.bucket_start_sec] = \
            (r.n, r.sum_value_e6)
    epoch = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp())  # noqa: E731
    for w in (15, 60, 1440):
        direct = {}
        for i, ts, v in rows:
            b = epoch(ts) // (w * 60) * (w * 60)
            n, s = direct.get(b, (0, 0))
            direct[b] = (n + 1, s + round(v * 1000000))
        assert by_level[w] == direct, f"gran={w}"
    # mixed widths where a coarser one isn't a multiple of the finest
    with pytest.raises(ValueError, match="multiple"):
        hypertable_rollup(ev, widths_minutes=(7, 60))
    # the one-scan property: all levels from a single pass over raw
    plan = hypertable_rollup(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_event_rollup_levels(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(0), 1.0), (2, "a", _ts(1), 2.0), (3, "b", _ts(2), 4.0)],
        ["event_id", "event_type", "ts", "value"])
    rows = event_rollup(ev).collect()
    total = [r for r in rows if r.grp == 3]
    assert len(total) == 1 and total[0].n == 3
    assert total[0].sum_value_e6 == 7_000_000
    by_type = {r.event_type: r.n for r in rows if r.grp == 1}
    assert by_type == {"a": 2, "b": 1}


def test_transition_counts_semantics(spark):
    from openapi_to_rdf_spark.operators.events import transition_counts

    rows = [  # (conv, idx, tool)
        ("c1", 0, "search"), ("c1", 1, "read"), ("c1", 2, "search"),
        ("c2", 0, "read"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tool"])
    got = {(r.src, r.dst): r.n
           for r in transition_counts(df, "conv_id", ["turn_idx"], "tool").collect()}
    assert got == {
        ("__START__", "search"): 1, ("search", "read"): 1,
        ("read", "search"): 1, ("search", "__END__"): 1,
        ("__START__", "read"): 1, ("read", "__END__"): 1,
    }
    inner = {(r.src, r.dst): r.n
             for r in transition_counts(df, "conv_id", ["turn_idx"], "tool",
                                        endpoints=False).collect()}
    assert inner == {("search", "read"): 1, ("read", "search"): 1}


def test_transition_counts_vs_python_on_transcripts(spark):
    from openapi_to_rdf_spark.operators.events import transition_counts
    from openapi_to_rdf_spark.sources.transcripts import synth_transcripts

    turns = synth_transcripts(spark, 60, seed=9).select(
        "conv_id", "turn_idx", "tool").localCheckpoint()
    got = {(r.src, r.dst): r.n
           for r in transition_counts(turns, "conv_id", ["turn_idx"],
                                      "tool").collect()}
    seqs = {}
    for r in turns.collect():
        seqs.setdefault(r.conv_id, []).append((r.turn_idx, r.tool))
    expected = {}
    for s in seqs.values():
        labs = [t for _, t in sorted(s)]
        for a, b in zip(["__START__"] + labs, labs + ["__END__"]):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    assert got == expected


def test_label_path_counts_vs_python(spark):
    from openapi_to_rdf_spark.operators.events import label_path_counts

    rows = [("c1", i, t) for i, t in
            enumerate(["a", "b", "a", "b", "c"])] + [("c2", 0, "a"), ("c2", 1, "b")]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tool"])
    got = {r.path: r.n_occurrences
           for r in label_path_counts(df, "conv_id", ["turn_idx"], "tool",
                                      n=3).collect()}
    assert got == {"a>b>a": 1, "b>a>b": 1, "a>b>c": 1}
    # groups shorter than n contribute nothing (and no ghost grams from
    # Spark's descending sequence())
    short = label_path_counts(
        spark.createDataFrame([("c", 0, "x")], ["conv_id", "turn_idx", "tool"]),
        "conv_id", ["turn_idx"], "tool", n=2)
    assert short.count() == 0


def test_label_path_n2_equals_endpointfree_transitions(spark):
    from openapi_to_rdf_spark.operators.events import (
        label_path_counts, transition_counts,
    )
    from openapi_to_rdf_spark.sources.transcripts import synth_transcripts

    turns = synth_transcripts(spark, 40, seed=4).select(
        "conv_id", "turn_idx", "tool").localCheckpoint()
    paths = {r.path: r.n_occurrences
             for r in label_path_counts(turns, "conv_id", ["turn_idx"],
                                        "tool", n=2).collect()}
    edges = {}
    for r in transition_counts(turns, "conv_id", ["turn_idx"],
                               "tool", endpoints=False).collect():
        s = r.src if r.src is not None else "__NULL__"
        d = r.dst if r.dst is not None else "__NULL__"
        edges[f"{s}>{d}"] = r.n
    assert paths == edges


# ---- conversation_quality ---------------------------------------------------

def _cq_rows(spark, rows, **kw):
    from openapi_to_rdf_spark.operators.events import conversation_quality

    schema = "conv_id string, turn_idx int, role string, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    return {r.conv_id: r for r in conversation_quality(df, **kw).collect()}


def test_conversation_quality_clean_dialogue(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 4, 1, 9, 0, 0)
    rows = [("c1", i, r, t0 + dt.timedelta(seconds=10 * i))
            for i, r in enumerate(["user", "assistant", "user", "assistant"])]
    r = _cq_rows(spark, rows)["c1"]
    assert (r.n_turns, r.n_roles, r.consec_same_role, r.n_target) == (4, 2, 0, 2)
    assert (r.first_role, r.last_role) == ("user", "assistant")
    assert r.max_gap_s == 10 and r.well_formed


def test_conversation_quality_flags_violations(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 4, 1, 9, 0, 0)
    # double user turn + ends on user + a 2h stall
    seq = ["user", "user", "assistant", "user"]
    rows = [("c1", i, r, t0 + dt.timedelta(hours=2 * (i == 3), seconds=i))
            for i, r in enumerate(seq)]
    r = _cq_rows(spark, rows)["c1"]
    assert r.consec_same_role == 1
    assert r.last_role == "user"
    assert not r.well_formed
    assert r.max_gap_s == 7201  # 2h stall + the 1s step


def test_conversation_quality_single_role_and_no_target(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 4, 1, 9, 0, 0)
    rows = [("c1", i, "user", t0) for i in range(3)]
    r = _cq_rows(spark, rows)["c1"]
    assert r.n_roles == 1 and r.n_target == 0 and not r.well_formed


def test_conversation_quality_without_timestamps(spark):
    rows = [("c1", 0, "user", None), ("c1", 1, "assistant", None)]
    r = _cq_rows(spark, rows, ts_col=None)["c1"]
    assert r.well_formed and "max_gap_s" not in r.asDict()


# ---- weighted_sample --------------------------------------------------------

def _es_reference(items, k):
    """Pure-python A-ES with the SAME md5-derived uniforms."""
    import hashlib
    import math

    def u_of(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32

    keyed = [(math.log(u_of(i)) / w, i) for (i, w) in items if w > 0]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [i for (_, i) in keyed[:k]]


def test_weighted_sample_matches_python_reference(spark):
    from openapi_to_rdf_spark.operators.sampling import weighted_sample

    items = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(items, ["item_id", "w"])
    got = (weighted_sample(df, 20, "w", "item_id")
           .orderBy("rank").collect())
    assert [r.item_id for r in got] == _es_reference(items, 20)
    assert [r.rank for r in got] == list(range(1, 21))


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from openapi_to_rdf_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], ["item_id", "w"])
    got = {r.item_id for r in weighted_sample(df, 10, "w", "item_id").collect()}
    assert got == {1, 4}


def test_weighted_sample_grouped_k_per_group(spark):
    from openapi_to_rdf_spark.operators.sampling import weighted_sample

    rows = [(g, i, 1.0 + i) for g in ("a", "b") for i in range(30)]
    df = spark.createDataFrame(rows, ["grp", "item_id", "w"])
    got = weighted_sample(df, 5, "w", "item_id", group_col="grp").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.grp, []).append(r.rank)
    assert set(by_g) == {"a", "b"}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_g.values())


def test_weighted_sample_heavy_weights_win_more(spark):
    from openapi_to_rdf_spark.operators.sampling import weighted_sample

    # weight 100 vs weight 1: the heavy half should dominate the sample
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["item_id", "w"])
    got = [r.item_id for r in weighted_sample(df, 20, "w", "item_id").collect()]
    assert sum(1 for i in got if i < 50) >= 15
