"""Burst detection (operators.bursts)."""

import datetime as dt
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.bursts import (  # noqa: E402
    detect_bursts, first_seen,
)

DAY = 86_400


def _events(spark, per_day):
    """per_day: {(key, day): count} -> events df."""
    rows = []
    for (key, day), n in per_day.items():
        for i in range(n):
            rows.append((key, dt.datetime(2026, 1, 1)
                         + dt.timedelta(days=day, seconds=i)))
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _bursts(spark, per_day, **kw):
    df = detect_bursts(_events(spark, per_day), "key", **kw)
    return {(r.key, r.bucket): (r.n, r.trailing_mean_e6, r.burst)
            for r in df.collect()}


def test_spike_over_baseline_bursts(spark):
    got = _bursts(spark, {("e", 0): 2, ("e", 1): 2, ("e", 2): 2,
                          ("e", 3): 9})
    day0 = min(b for (_, b) in got)
    n, mean, burst = got[("e", day0 + 3)]
    assert (n, mean, burst) == (9, 2_000_000, True)


def test_first_bucket_never_bursts(spark):
    got = _bursts(spark, {("e", 0): 50})
    (_, bucket), = got.keys()
    assert got[("e", bucket)] == (50, None, False)


def test_min_count_floor(spark):
    # 1 -> 2 doubles the rate but stays under min_count=3
    got = _bursts(spark, {("e", 0): 1, ("e", 1): 2})
    assert not any(v[2] for v in got.values())


def test_steady_rate_no_burst(spark):
    got = _bursts(spark, {("e", d): 5 for d in range(5)})
    assert not any(v[2] for v in got.values())


def test_sparse_buckets_use_active_history(spark):
    # activity at days 0 and 10: trailing window sees the ACTIVE bucket
    got = _bursts(spark, {("e", 0): 3, ("e", 10): 7})
    day0 = min(b for (_, b) in got)
    n, mean, burst = got[("e", day0 + 10)]
    assert (n, mean, burst) == (7, 3_000_000, True)


def test_keys_independent(spark):
    got = _bursts(spark, {("a", 0): 3, ("a", 1): 30, ("b", 1): 3})
    day0 = min(b for (_, b) in got)
    assert got[("a", day0 + 1)][2] is True
    assert got[("b", day0 + 1)][2] is False  # b has no history


def test_first_seen(spark):
    df = _events(spark, {("a", 0): 2, ("a", 3): 1})
    rows = {r.key: (r.first_ts, r.last_ts, r.n_total)
            for r in first_seen(df, "key").collect()}
    first, last, n = rows["a"]
    assert n == 3
    assert (last - first).days == 3


# ---- value_anomalies --------------------------------------------------------

def test_value_anomalies_flags_planted_spike(spark):
    import datetime as dt

    from openapi_to_rdf_spark.operators.bursts import value_anomalies

    t0 = dt.datetime(2026, 5, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 500.0, 10.1]
    rows = [("k1", t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    out = {r.ts: r for r in value_anomalies(
        spark.createDataFrame(rows, "key string, ts timestamp, value double"),
        "key").collect()}
    spike = out[t0 + dt.timedelta(minutes=6)]
    assert spike.is_anomaly and spike.n_history == 6
    # the spike does NOT poison the next row's baseline into silence:
    # 10.1 against a window CONTAINING 500 is itself unremarkable
    after = out[t0 + dt.timedelta(minutes=7)]
    assert not after.is_anomaly
    # warm-up rows (fewer than min_history priors) are never flagged
    assert not any(out[t0 + dt.timedelta(minutes=i)].is_anomaly
                   for i in range(5))


def test_value_anomalies_constant_series_never_divides_by_zero(spark):
    import datetime as dt

    from openapi_to_rdf_spark.operators.bursts import value_anomalies

    t0 = dt.datetime(2026, 5, 1)
    rows = [("k", t0 + dt.timedelta(minutes=i), 7.0) for i in range(10)]
    out = value_anomalies(
        spark.createDataFrame(rows, "key string, ts timestamp, value double"),
        "key").collect()
    assert all(not r.is_anomaly and r.z_e6 is None for r in out)
