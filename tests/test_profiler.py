"""Key-distribution profiler (operators/profiler): entropy algebra vs
hand-computed values, uniform/degenerate regimes, deterministic top-k.
Driver oracles ``key_skew_profile`` / ``hot_keys`` additionally pin both
against DuckDB on the events table."""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.profiler import (  # noqa: E402
    key_profile, top_keys,
)


def test_key_profile_skewed(spark):
    rows = [("a",)] * 8 + [("b",)] + [("c",)]
    df = spark.createDataFrame(rows, ["k"])
    r = key_profile(df, ["k"]).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_count) == (10, 3, 8)
    assert r.max_share_e6 == 800000
    assert r.skew_ratio_e6 == 2400000  # 8 / (10/3)
    h = math.log(10) - 8 * math.log(8) / 10  # ln n - Σ c·ln c / n
    assert abs(r.entropy_e6 - round(h * 1e6)) <= 1
    assert abs(r.entropy_norm_e6 - round(h / math.log(3) * 1e6)) <= 1


def test_key_profile_uniform_and_degenerate(spark):
    uni = spark.createDataFrame([(f"k{i % 5}",) for i in range(20)], ["k"])
    r = key_profile(uni, ["k"]).collect()[0]
    assert r.skew_ratio_e6 == 1000000 and r.entropy_norm_e6 == 1000000
    one = spark.createDataFrame([("x",)] * 7, ["k"])
    r1 = key_profile(one, ["k"]).collect()[0]
    assert r1.entropy_e6 == 0 and r1.entropy_norm_e6 is None


def test_top_keys_deterministic_ties(spark):
    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 5 + [("d",)]
    df = spark.createDataFrame(rows, ["k"])
    got = [(r.k, r.key_count, r.rank)
           for r in top_keys(df, ["k"], k=3).orderBy("rank").collect()]
    assert got == [("c", 5, 1), ("a", 3, 2), ("b", 3, 3)]


def test_equidepth_histogram_balanced_buckets_and_bounds(spark):
    from openapi_to_rdf_spark.operators.profiler import equidepth_histogram

    # skewed values: equi-width would put 90% in one bin; equi-depth
    # must split 100 rows into 4 buckets of exactly 25
    rows = [(i, float(i if i < 90 else i * 1000)) for i in range(100)]
    df = spark.createDataFrame(rows, ["rid", "v"])
    got = {r.bucket: r for r in
           equidepth_histogram(df, "v", ["rid"], k=4).collect()}
    assert [got[b].n for b in (1, 2, 3, 4)] == [25, 25, 25, 25]
    # bucket bounds are contiguous and ordered
    for b in (1, 2, 3):
        assert got[b].hi_e6 <= got[b + 1].lo_e6
    assert got[1].lo_e6 == 0 and got[4].hi_e6 == 99_000 * 10**6


def test_equidepth_remainder_goes_to_leading_buckets(spark):
    from openapi_to_rdf_spark.operators.profiler import equidepth_histogram

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               ["rid", "v"])
    got = {r.bucket: r.n for r in
           equidepth_histogram(df, "v", ["rid"], k=3).collect()}
    assert got == {1: 4, 2: 3, 3: 3}  # NTILE's remainder split
