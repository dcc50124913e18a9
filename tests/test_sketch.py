"""Deterministic HLL sketch (operators/sketch): estimator accuracy within
theory, exact merge property, partition-independence. The register table
itself is integer-exact vs DuckDB via the driver's ``user_hll`` oracle."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.sketch import (  # noqa: E402
    cms_estimate, cms_merge, cms_registers, hll_error_bound, hll_estimate,
    hll_merge, hll_registers,
)


def test_hll_estimate_within_error_bound(spark):
    # three groups spanning the linear-counting and raw-estimator regimes
    rows = ([("small", f"s{i}") for i in range(40)]
            + [("mid", f"m{i}") for i in range(3000)]
            + [("big", f"b{i}") for i in range(50000)])
    df = spark.createDataFrame(rows, ["grp", "key"])
    p = 10
    regs = hll_registers(df, "key", ["grp"], p=p)
    est = {r.grp: r.n_distinct_est
           for r in hll_estimate(regs, ["grp"], p=p).collect()}
    truth = {"small": 40, "mid": 3000, "big": 50000}
    for g, n in truth.items():
        rel = abs(est[g] - n) / n
        assert rel < 3 * hll_error_bound(p), (g, est[g], n, rel)


def test_hll_merge_equals_whole(spark):
    """sketch(A) max-merged with sketch(B) == sketch(A ∪ B), register by
    register — the property that makes sketches incrementally
    maintainable. Duplicated keys across the halves are exercised."""
    rows = [("g", f"k{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    half_a = df.filter(F.col("key") < "k5")       # lexicographic split
    half_b = df.filter(F.col("key") >= "k3")      # overlapping on purpose
    whole = {(r.grp, r.register): r.max_rank
             for r in hll_registers(df, "key", ["grp"]).collect()}
    merged = {(r.grp, r.register): r.max_rank
              for r in hll_merge(hll_registers(half_a, "key", ["grp"]),
                                 hll_registers(half_b, "key", ["grp"]))
              .collect()}
    assert merged == whole and whole


def test_cms_never_underestimates_and_bounds_error(spark):
    """CM guarantee: est >= true always; overestimate within the 2n/width
    bound for all of a Zipf-ish key set (heavy head, long tail)."""
    rows = [("g", f"hot{h}") for h in range(3) for _ in range(1000)] \
        + [("g", f"tail{i}") for i in range(4000) for _ in range(2)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    depth, width = 5, 512
    regs = cms_registers(df, "key", ["grp"], depth=depth, width=width)
    keys = spark.createDataFrame(
        [(f"hot{h}",) for h in range(3)] + [("tail7",), ("absent",)],
        ["key"])
    est = {r.key: r.freq_est
           for r in cms_estimate(regs, keys, "key",
                                 depth=depth, width=width).collect()}
    truth = {"hot0": 1000, "hot1": 1000, "hot2": 1000,
             "tail7": 2, "absent": 0}
    n = len(rows)
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] - t <= 2 * n / width, (k, est[k], t)


def test_cms_merge_equals_whole(spark):
    """cms(A) +-merged with cms(B) == cms(A ++ B) register by register —
    bag semantics, so the overlapping split must double-count exactly."""
    rows_a = [("g", f"k{i % 50}") for i in range(1200)]
    rows_b = [("g", f"k{i % 50}") for i in range(800, 3000)]  # overlap
    half_a = spark.createDataFrame(rows_a, ["grp", "key"])
    half_b = spark.createDataFrame(rows_b, ["grp", "key"])
    whole_df = spark.createDataFrame(rows_a + rows_b, ["grp", "key"])
    whole = {(r.grp, r.row, r.bucket): r.cnt
             for r in cms_registers(whole_df, "key", ["grp"]).collect()}
    merged = {(r.grp, r.row, r.bucket): r.cnt for r in cms_merge(
        cms_registers(half_a, "key", ["grp"]),
        cms_registers(half_b, "key", ["grp"])).collect()}
    assert merged == whole and whole


def test_cms_registers_partition_independent(spark):
    rows = [("g", str(i % 97)) for i in range(4000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    a = sorted((r.row, r.bucket, r.cnt) for r in
               cms_registers(df, "key", ["grp"]).collect())
    b = sorted((r.row, r.bucket, r.cnt) for r in
               cms_registers(df.repartition(17), "key", ["grp"]).collect())
    assert a == b


def test_hll_registers_partition_independent(spark):
    rows = [("g", str(i * 7919)) for i in range(5000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    a = sorted((r.register, r.max_rank) for r in
               hll_registers(df, "key", ["grp"]).collect())
    b = sorted((r.register, r.max_rank) for r in
               hll_registers(df.repartition(23), "key", ["grp"]).collect())
    assert a == b


# ---- hll_setop_estimates ----------------------------------------------------

def test_hll_setops_accuracy_and_union_losslessness(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        hll_estimate, hll_registers, hll_setop_estimates,
    )

    # A = 0..1999, B = 1000..3999 -> |A|=2000 |B|=3000 |A∩B|=1000 |A∪B|=4000
    rows = [("A", i) for i in range(2000)] + \
           [("B", i) for i in range(1000, 4000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    regs = hll_registers(df, "key", ["grp"], p=10)
    got = hll_setop_estimates(regs, "grp", p=10).collect()[0]
    assert (got.ga, got.gb) == ("A", "B")
    # 3-sigma-ish tolerance at p=10 (~3.25% per estimate)
    assert abs(got.n_a - 2000) < 2000 * 0.1
    assert abs(got.n_b - 3000) < 3000 * 0.1
    assert abs(got.n_union - 4000) < 4000 * 0.1
    # intersection inherits summed error: generous floor, still informative
    assert 500 < got.n_inter < 1500
    assert 100_000 < got.jaccard_e6 < 450_000  # true jaccard 0.25

    # union losslessness: pairwise-union estimate == estimate of the
    # sketch built from the concatenated keys
    both = df.select(F.lit("U").alias("grp"), "key")
    direct = hll_estimate(hll_registers(both, "key", ["grp"], p=10),
                          ["grp"], p=10).collect()[0].n_distinct_est
    assert got.n_union == direct


def test_hll_setops_disjoint_and_identical(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        hll_registers, hll_setop_estimates,
    )

    rows = [("A", f"a{i}") for i in range(500)] + \
           [("B", f"a{i}") for i in range(500)] + \
           [("C", f"c{i}") for i in range(500)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    got = {(r.ga, r.gb): r for r in hll_setop_estimates(
        hll_registers(df, "key", ["grp"], p=10), "grp", p=10).collect()}
    ab = got[("A", "B")]          # identical sets
    assert ab.n_union == ab.n_a == ab.n_b
    assert ab.n_inter == ab.n_a and ab.jaccard_e6 == 1_000_000
    ac = got[("A", "C")]          # disjoint sets
    assert ac.jaccard_e6 < 150_000


# --------------------------------------------------------------------------
# quantile sketch (significant-digit buckets)
# --------------------------------------------------------------------------

def _py_bucket(v, sig=2):
    s = str(int(v))
    return int(v) if len(s) <= sig else int(s[:sig] + "0" * (len(s) - sig))


def test_qsketch_bucket_arithmetic_matches_python(spark):
    from openapi_to_rdf_spark.operators.sketch import qsketch_registers

    vals = [0, 1, 9, 10, 99, 100, 101, 1234, 56789, 49002, -5]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r.bucket: r.n for r in qsketch_registers(df, "v").collect()}
    expect = {}
    for v in vals:
        if v < 0:
            continue  # negatives dropped
        b = _py_bucket(v)
        expect[b] = expect.get(b, 0) + 1
    assert got == expect


def test_qsketch_merge_equals_whole_corpus(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        qsketch_merge, qsketch_registers)

    rows = [(i % 3, (i * 37) % 1000) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "v"])
    whole = qsketch_registers(df, "v", ["g"])
    parts = [qsketch_registers(df.filter(F.col("v") % 2 == k), "v", ["g"])
             for k in (0, 1)]
    merged = qsketch_merge(*parts)
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_qsketch_quantiles_match_rank_rule(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        qsketch_quantiles, qsketch_registers)

    vals = [(i * i) % 7919 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r.pct: (r.value, r.n_total)
           for r in qsketch_quantiles(
               qsketch_registers(df, "v"), [50, 90, 99, 100]).collect()}
    srt = sorted(vals)
    for pct in (50, 90, 99, 100):
        rank = (len(srt) * pct + 99) // 100
        assert out[pct] == (_py_bucket(srt[rank - 1]), len(srt))


def test_qsketch_grouped_quantiles_and_relative_error(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        qsketch_quantiles, qsketch_registers)

    rows = [("a", i) for i in range(1, 1001)] + \
           [("b", 10 * i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["g", "v"])
    regs = qsketch_registers(df, "v", ["g"])
    out = {(r.g, r.pct): r.value
           for r in qsketch_quantiles(regs, [50, 99], ["g"]).collect()}
    # estimate = true quantile rounded down to 2 significant digits:
    # within 10% below the true value, never above
    for (g, pct), est in out.items():
        vals = sorted(v for gg, v in rows if gg == g)
        true = vals[(len(vals) * pct + 99) // 100 - 1]
        assert est <= true < max(est * 1.112, est + 10)


def test_qsketch_guards(spark):
    from openapi_to_rdf_spark.operators.sketch import (
        qsketch_quantiles, qsketch_registers)

    df = spark.createDataFrame([(1,)], ["v"])
    with pytest.raises(ValueError):
        qsketch_registers(df, "v", sig_digits=0)
    regs = qsketch_registers(df, "v")
    with pytest.raises(ValueError):
        qsketch_quantiles(regs, [])
    with pytest.raises(ValueError):
        qsketch_quantiles(regs, [0, 50])
