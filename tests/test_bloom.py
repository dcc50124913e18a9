"""Bloom prefilter (operators/bloom): no false negatives ever, fp rate
within theory, bloom-pruned semi-join == plain semi-join, and the
prefilter stays a shuffle-free scan+filter. Bit positions are also
integer-exact vs DuckDB via the driver's ``bloom_bits`` oracle."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.bloom import (  # noqa: E402
    bloom_fp_rate, bloom_hex, bloom_positions, bloom_semi_join,
    might_contain,
)


def _bitmap(spark, keys, num_bits=1 << 14, k=5):
    df = spark.createDataFrame([(x,) for x in keys], ["key"])
    return bloom_hex(bloom_positions(df, "key", num_bits, k), num_bits)


def test_bloom_no_false_negatives(spark):
    keys = [f"member{i}" for i in range(500)]
    num_bits, k = 1 << 14, 5
    hexmap = _bitmap(spark, keys, num_bits, k)
    probe = spark.createDataFrame([(x,) for x in keys], ["key"])
    n_pass = probe.filter(
        might_contain(F.col("key"), hexmap, num_bits, k)).count()
    assert n_pass == len(keys)  # every true member MUST pass


def test_bloom_fp_rate_within_theory(spark):
    keys = [f"member{i}" for i in range(500)]
    num_bits, k = 1 << 14, 5
    hexmap = _bitmap(spark, keys, num_bits, k)
    outsiders = spark.createDataFrame(
        [(f"outsider{i}",) for i in range(20000)], ["key"])
    fp = outsiders.filter(
        might_contain(F.col("key"), hexmap, num_bits, k)).count()
    expected = bloom_fp_rate(len(keys), num_bits, k)  # ~8.5e-4 here
    assert fp / 20000 <= 5 * expected + 1e-3, (fp, expected)


def test_bloom_semi_join_equals_plain(spark):
    large = spark.createDataFrame(
        [(i, i % 400) for i in range(20000)], ["row_id", "fk"])
    small = spark.createDataFrame(
        [(j,) for j in range(0, 400, 7)] + [(9999,)], ["pk"])
    got = sorted(r.row_id for r in
                 bloom_semi_join(large, small, "fk", "pk",
                                 num_bits=1 << 14).collect())
    want = sorted(r.row_id for r in large.join(
        small, large.fk == small.pk, "left_semi").collect())
    assert got == want and want


def test_bloom_prefilter_plan_is_scan_side(spark):
    """The membership probe must compile to a bare filter — no join, no
    exchange — so at 100 TB it runs inside the scan stage."""
    large = spark.createDataFrame([(i,) for i in range(100)], ["fk"])
    hexmap = _bitmap(spark, [1, 2, 3], 1 << 14, 5)
    pruned = large.filter(might_contain(F.col("fk"), hexmap, 1 << 14, 5))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert pruned.count() >= 3
