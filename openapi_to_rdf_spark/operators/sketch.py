"""Deterministic HyperLogLog distinct-count sketch as pure DataFrame ops.

Spark ships approx_count_distinct (a JVM HLL++), but its register layout
is engine-private: the sketch can't be stored, merged by other systems, or
verified against an independent implementation. This one is built from
md5 — the same engine-portable hash the sampling operators use — so the
register table is a DETERMINISTIC function of the data: the driver's
DuckDB oracle recomputes it bit-for-bit (``user_hll``), reruns and
engines agree, and sketches materialized as tables can be merged later by
anyone (register-wise MAX, tested).

Why a sketch at all: at 10^12 turns, per-group exact COUNT(DISTINCT user)
shuffles every (group, user) pair; the register form shuffles at most
m=2^p rows per group (a few KB), supports streaming/incremental updates
by max-merge, and keeps relative error ~1.04/sqrt(m) regardless of
cardinality.

Hash layout per key: h = md5(key); register index = first 32 hash bits
mod m, rank = (leading zeros of the next 32 bits) + 1 ∈ [1, 33]. Both
halves are hex-substring→integer conversions that DuckDB reproduces
verbatim; Spark's bin() and DuckDB's bin() agree on the no-leading-zeros
binary form, so rank = 33 - length(bin(h2)) is portable too.

Estimator: standard HLL (Flajolet et al. 2007): E = alpha_m * m^2 /
(sum of 2^-M_j over all m registers, absent registers contributing 2^0),
with the small-range linear-counting correction E <= 2.5m -> m*ln(m/V)
when V empty registers remain.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  p: int = 8) -> DataFrame:
    """Per-group HLL register table: (group..., register, max_rank) with
    one row per OCCUPIED register (absent register == rank 0). The only
    shuffle is the final (group, register) aggregation, which Spark
    partial-aggregates map-side — the wire carries at most m rows per
    group regardless of input size."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    h = F.md5(F.col(key_col).cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(33)) \
        .otherwise(F.lit(33) - F.length(F.bin(h2)))
    return (df.select(*group_cols,
                      (h1 % m).alias("register"),
                      rank.cast("long").alias("rank"))
            .groupBy(*group_cols, "register")
            .agg(F.max("rank").alias("max_rank")))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union sketches: register-wise MAX. HLL's defining property —
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly, which is what
    makes the register table an incrementally-maintainable materialized
    aggregate (tested in test_sketch.py)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c not in ("max_rank",)]
    return out.groupBy(*keys).agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(registers: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Distinct-count estimate per group from a register table, with the
    small-range linear-counting correction. Pure column arithmetic over
    at most m rows per group."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_present"),
        F.count(F.lit(1)).alias("_occupied"))
    zeros = F.lit(m) - F.col("_occupied")
    raw = F.lit(alpha * m * m) / (F.col("_present") + zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
        .otherwise(raw)
    return agg.select(*group_cols,
                      F.round(est).cast("long").alias("n_distinct_est"))


def hll_error_bound(p: int) -> float:
    """Theoretical relative standard error 1.04/sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


# --------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency registers
# --------------------------------------------------------------------------
#
# Same design goals as the HLL above: Spark has no frequency sketch at all
# (count_min_sketch exists in the JVM but its serialized form is
# engine-private), so this one is a DETERMINISTIC function of the data —
# row r of the sketch hashes key k to bucket md5(r || ':' || k) (first 32
# hash bits) mod width, and the register value is a plain SUM, which DuckDB
# recomputes bit-for-bit and which merges across partitions / days / tables
# by register-wise addition. At 10^12 turns a per-group exact term count
# table is unbounded; the sketch caps state at depth*width rows per group
# with overestimate error ≤ 2n/width at confidence 1 - 2^-depth.


def _cms_bucket(row: int, key, width: int):
    h = F.md5(F.concat(F.lit(str(row) + ":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  depth: int = 4, width: int = 1024) -> DataFrame:
    """Per-group Count-Min register table (group..., row, bucket, cnt),
    one output row per OCCUPIED (row, bucket) — absent register == 0.
    The d per-row bucket columns are computed in one projection (no
    explode), then a single stack() pivots them to rows, so the only
    shuffle is the final partial-aggregated groupBy whose wire volume is
    capped at depth*width rows per group."""
    if depth < 1 or width < 2:
        raise ValueError("depth >= 1 and width >= 2 required")
    key = F.col(key_col)
    pairs = ", ".join(
        f"{r}, bigint(conv(substring(md5(concat('{r}:', cast(`{key_col}` "
        f"as string))), 1, 8), 16, 10)) % {width}" for r in range(depth))
    stacked = df.select(
        *group_cols, key,
        F.expr(f"stack({depth}, {pairs}) as (row, bucket)"))
    return (stacked.groupBy(*group_cols, "row", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*register_tables: DataFrame) -> DataFrame:
    """Union sketches: register-wise SUM — merge(cms(A), cms(B)) ==
    cms(A ++ B) exactly, making the register table an incrementally
    maintainable aggregate (streaming appends just add registers)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(registers: DataFrame, keys_df: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query estimates for every key in ``keys_df``: for each of the
    d rows look up the key's bucket and take the MIN — the classic CM
    overestimate bound (never underestimates; error ≤ 2n/width w.p.
    1 - 2^-depth). ``keys_df`` is the small side and broadcasts into the
    register join; the register table never moves."""
    key = F.col(key_col)
    probes = keys_df.select(
        key, F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_bucket(r, key, width).alias("bucket"))
            for r in range(depth)])).alias("pr")) \
        .select(key_col, F.col("pr.row").alias("row"),
                F.col("pr.bucket").alias("bucket"))
    # LEFT join: a probe landing in an empty bucket means count 0 — an
    # inner join would drop it and turn the min into an overestimate.
    # The register table is capped at depth*width rows, so IT broadcasts.
    return (probes.join(F.broadcast(registers), ["row", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("freq_est")))


def hll_setop_estimates(registers: DataFrame, group_col: str,
                        p: int = 8) -> DataFrame:
    """Pairwise set-algebra cardinalities between every two groups of ONE
    register table (audience-overlap analytics from sketches alone):
    |A|, |B|, |A ∪ B| — the union is LOSSLESS sketch algebra
    (register-wise max IS the union's sketch) — plus inclusion-exclusion
    |A ∩ B| (clamped at 0) and the derived Jaccard. Intersection error
    compounds the three estimates' errors, so both operands and the
    union are reported alongside it, never just the derived number.

    Work is sketch-sized: the pair table is G², each pair's union holds
    ≤ m occupied registers — the 10^12-row side was consumed once by
    hll_registers; everything here is register arithmetic.
    """
    singles = hll_estimate(registers, [group_col], p)
    a = singles.select(F.col(group_col).alias("ga"),
                       F.col("n_distinct_est").alias("n_a"))
    b = singles.select(F.col(group_col).alias("gb"),
                       F.col("n_distinct_est").alias("n_b"))
    pairs = a.join(b, F.col("ga") < F.col("gb"))

    a_regs = (registers.join(F.broadcast(pairs.select("ga", "gb")),
                             registers[group_col] == F.col("ga"))
              .select("ga", "gb", "register", "max_rank"))
    b_regs = (registers.join(F.broadcast(pairs.select("ga", "gb")),
                             registers[group_col] == F.col("gb"))
              .select("ga", "gb", "register", "max_rank"))
    union_regs = (a_regs.unionByName(b_regs)
                  .groupBy("ga", "gb", "register")
                  .agg(F.max("max_rank").alias("max_rank")))
    union_est = (hll_estimate(union_regs, ["ga", "gb"], p)
                 .withColumnRenamed("n_distinct_est", "n_union"))

    out = pairs.join(union_est, ["ga", "gb"])
    inter = F.greatest(F.col("n_a") + F.col("n_b") - F.col("n_union"),
                       F.lit(0))
    # jaccard from the ROUNDED longs — integer arithmetic, engine-portable
    return out.select(
        "ga", "gb", "n_a", "n_b", "n_union",
        inter.cast("long").alias("n_inter"),
        F.when(F.col("n_union") > 0,
               F.round(inter.cast("double") * 1e6 / F.col("n_union"))
               .cast("long")).otherwise(F.lit(0)).alias("jaccard_e6"))


# --------------------------------------------------------------------------
# mergeable quantile sketch (significant-digit buckets)
# --------------------------------------------------------------------------

def qsketch_registers(df: DataFrame, value_col: str,
                      group_cols: list[str] | None = None,
                      sig_digits: int = 2) -> DataFrame:
    """Mergeable quantile sketch over NON-NEGATIVE INTEGER values:
    (group..., bucket, n), one row per occupied bucket.

    The bucket key is the value rounded DOWN to ``sig_digits`` significant
    decimal digits (1234 -> 1200 at 2 digits) — a decimal DDSketch: buckets
    guarantee relative error < 10^(1-sig_digits) (one part in ten at the
    default), the register table is bounded by 9*10^(d-1) buckets per
    decade regardless of input size, and merging sketches is a plain
    count-sum groupBy. Unlike percentile_approx's engine-private GK state,
    the bucket arithmetic is pure DECIMAL-STRING surgery (length/substr/
    pad) that any engine reproduces bit-for-bit — the driver's DuckDB
    oracle recomputes the register table exactly.

    Scale: one linear scan; the only shuffle is the (group, bucket)
    aggregation, map-side partial aggregation absorbs hot buckets — the
    wire carries at most (buckets-per-group) rows. Fractional inputs
    scale into an integer domain first (e.g. cents = round(x*100)),
    exactly the *_e6 discipline the driver contract already uses.
    """
    if sig_digits < 1:
        raise ValueError("sig_digits must be >= 1")
    gcols = list(group_cols or [])
    staged = df.select(*gcols,
                       F.col(value_col).cast("long").cast("string")
                       .alias("_vs"))
    s, d = F.col("_vs"), F.length("_vs")
    bucket = (F.when(F.substring(s, 1, 1) == "-", F.lit(None))
              .when(d <= sig_digits, s.cast("long"))
              .otherwise(F.concat(
                  F.substring(s, 1, sig_digits),
                  F.expr(f"repeat('0', length(_vs) - {sig_digits})"))
                  .cast("long")))
    return (staged.select(*gcols, bucket.alias("bucket"))
            .filter(F.col("bucket").isNotNull())
            .groupBy(*gcols, "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def qsketch_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches built with the same sig_digits: bucket counts add."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != "n"]
    return merged.groupBy(*keys).agg(F.sum("n").alias("n"))


def qsketch_quantiles(registers: DataFrame, percents: list[int],
                      group_cols: list[str] | None = None) -> DataFrame:
    """Quantile estimates from a qsketch register table:
    (group..., pct, value, n_total) for each integer percent in
    ``percents``. Pinned rank rule (pure integer arithmetic, portable):
    the p-th percentile is the value at rank ceil(n*p/100) =
    (n*p + 99) div 100 in the sorted multiset, answered as the smallest
    bucket whose cumulative count reaches that rank — so the estimate is
    the true quantile rounded down to the sketch's significant digits.

    All work is sketch-sized: one cumulative window over the register
    table + a tiny percent-list cross join.
    """
    from pyspark.sql import Window

    if not percents or any(not 1 <= p <= 100 for p in percents):
        raise ValueError("percents must be integers in [1, 100]")
    gcols = list(group_cols or [])
    w = (Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (registers
           .withColumn("cum", F.sum("n").over(w))
           .withColumn("n_total", F.sum("n").over(
               Window.partitionBy(*[F.col(c) for c in gcols]))))
    pcts = F.explode(F.array(*[F.lit(p) for p in sorted(set(percents))]))
    # rank = ceil(n_total * pct / 100) in pure integer arithmetic
    hit = (cum.select(*gcols, "bucket", "cum", "n_total",
                      pcts.alias("pct"))
           .filter(F.col("cum")
                   >= F.expr("(n_total * pct + 99) div 100")))
    return (hit.groupBy(*gcols, "pct")
            .agg(F.min("bucket").alias("value"),
                 F.max("n_total").alias("n_total"))
            .orderBy(*gcols, "pct"))
