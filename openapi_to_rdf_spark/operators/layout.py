"""Physical data-layout operators: vertex-cut edge partitioning and Z-order
multi-column clustering.

At 10^12 triples the dominant storage question is not WHAT to compute but
WHERE each edge lives. Two classic answers, re-expressed as pure DataFrame
column arithmetic so the assignment is computable inside a parquet write's
``partitionBy``/``repartitionByRange`` without any shuffle of its own:

- ``edge_partition_2d``: PowerGraph/GraphX-style 2D vertex-cut (grid)
  partitioning. 1D hash-by-subject puts EVERY edge of a hot entity (a
  celebrity node mentioned in millions of turns) into one partition; the
  2D grid bounds any vertex's spread to at most ``2*ceil(sqrt(P)) - 1``
  partitions regardless of degree, trading bounded vertex replication for
  skew-proof edge balance. Reference has no counterpart (its graphs are
  rdflib in-memory, openapi_to_rdf/shacl_converter.py holds one Graph
  object); this is the scale posture the north rule's 10^12-turn Iceberg
  graph tables demand.
- ``zorder_key``: Morton (bit-interleaved) clustering key over two int
  dimensions, the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.
  Range-partitioning by the interleaved key gives every file a small
  bounding box in BOTH dimensions, so min/max file statistics prune scans
  filtered on EITHER column — a 1D sort prunes only its leading column.

Everything is deterministic content-addressed arithmetic (uint32(md5)
buckets, no RNG, no Spark-internal hash), so the same layout decision is
reproducible in any engine — the DuckDB oracle recomputes assignments
bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_bucket(col: Column, m: int) -> Column:
    """uint32(first 8 md5 hex chars of the value) mod m — the repo's
    engine-portable bucket assignment (same idiom as sampling.hash_fraction).
    """
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % m)


def edge_partition_1d(edges: DataFrame, num_parts: int,
                      src: str = "src") -> Column:
    """Baseline 1D edge-cut: pid = h(src) % P. Co-locates every out-edge of
    a vertex (good for per-source scans) but a hot source key lands its
    whole degree in one partition — the layout that melts at 10^12 edges."""
    return portable_bucket(F.col(src), num_parts).cast("int")


def edge_partition_2d(edges: DataFrame, num_parts: int,
                      src: str = "src", dst: str = "dst") -> Column:
    """GraphX EdgePartition2D-style grid vertex-cut:

        r   = ceil(sqrt(P))
        pid = (h(src) % r) * r + h(dst) % r

    Any single vertex appears in at most 2r-1 of the r*r cells (one row of
    the grid as a source + one column as a destination), so replication is
    O(sqrt(P)) BOUNDED while a hot vertex's edges spread over r partitions
    instead of concentrating in one. P is rounded up to the next perfect
    square (GraphX does the same)."""
    r = math.isqrt(max(num_parts, 1) - 1) + 1 if num_parts > 1 else 1
    return (portable_bucket(F.col(src), r) * r
            + portable_bucket(F.col(dst), r)).cast("int")


def partition_stats(edges: DataFrame, pid: Column, src: str = "src",
                    dst: str = "dst", strategy: str = "2d") -> DataFrame:
    """The two numbers that decide whether a graph layout survives scale,
    for one assignment:

    - edge balance: max / mean edges per used partition (1.0 = perfect);
      under 1D hashing this is driven by the hottest vertex's degree.
    - replication factor: mean number of DISTINCT partitions a vertex's
      edges touch — the vertex-mirror cost a Pregel-style step pays.

    One row: (strategy, n_parts_used, n_edges, max_edges, balance_e6,
    replication_e6). Ratios are scaled to *_e6 BIGINT via INTEGER division
    (never a double) so the oracle hash comparison is bit-exact. Two
    aggregations over the assigned edges (both map-side partial); the
    vertex-side groupBy keys on the vertex id so hot-partition skew cannot
    re-enter through the metric itself."""
    assigned = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"),
                            pid.alias("_pid"))
    per_part = (assigned.groupBy("_pid")
                .agg(F.count(F.lit(1)).alias("n_edges")))
    part_row = per_part.agg(
        F.count(F.lit(1)).alias("n_parts_used"),
        F.sum("n_edges").alias("n_edges"),
        F.max("n_edges").alias("max_edges"),
        F.expr("(max(n_edges) * 1000000L * count(1)) div sum(n_edges)")
        .alias("balance_e6"))
    verts = (assigned.select(F.col("_s").alias("v"), "_pid")
             .unionAll(assigned.select(F.col("_d").alias("v"), "_pid"))
             .distinct()
             .groupBy("v").agg(F.count(F.lit(1)).alias("n_parts")))
    vert_row = verts.agg(
        F.expr("(sum(n_parts) * 1000000L) div count(1)")
        .alias("replication_e6"))
    return (part_row.crossJoin(vert_row)
            .select(F.lit(strategy).alias("strategy"), "n_parts_used",
                    "n_edges", "max_edges", "balance_e6", "replication_e6"))


def layout_comparison(edges: DataFrame, num_parts: int, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """1D edge-cut vs 2D vertex-cut stats for the same edge set, one row
    each — the evidence table for choosing the triple-store layout."""
    one_d = partition_stats(edges, edge_partition_1d(edges, num_parts, src),
                            src, dst, strategy="1d_src")
    two_d = partition_stats(edges, edge_partition_2d(edges, num_parts, src, dst),
                            src, dst, strategy="2d_grid")
    return one_d.unionAll(two_d)


# --------------------------------------------------------------------------
# Z-order clustering
# --------------------------------------------------------------------------

def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i. Pure
    codegen bit arithmetic (an unrolled sum of shifted masks — no UDF, no
    loop at runtime), identical in any engine with & and <<."""
    la, lb = a.cast("long"), b.cast("long")
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(la, i).bitwiseAND(F.lit(1)), 2 * i + 1)
             + F.shiftleft(F.shiftright(lb, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton interleave as an ANSI-SQL expression string
    (for the DuckDB oracle and for SQL-pushdown callers)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_locality(df: DataFrame, a_col: Column, b_col: Column,
                    n_buckets: int, a_name: str = "a", b_name: str = "b",
                    bits: int = 16) -> DataFrame:
    """Range-bucket rows by their Z-order key and report each bucket's
    bounding box in both dimensions — the file-statistics view a lakehouse
    scan planner prunes with. At cluster scale the bucketing is
    ``repartitionByRange(zkey)`` + per-file min/max stats; here the same
    cut points are computed exactly with NTILE so the oracle can reproduce
    them. Output: one row per bucket with n_rows and the two bounding
    boxes; tight boxes in BOTH dims = both filter columns prune."""
    from pyspark.sql import Window

    keyed = df.select(a_col.cast("long").alias("_a"),
                      b_col.cast("long").alias("_b"))
    keyed = keyed.withColumn("_z", zorder_key(F.col("_a"), F.col("_b"), bits))
    w = Window.orderBy("_z", "_a", "_b")
    bucketed = keyed.withColumn("bucket", F.ntile(n_buckets).over(w))
    return (bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("_a").alias(f"{a_name}_min"),
                 F.max("_a").alias(f"{a_name}_max"),
                 F.min("_b").alias(f"{b_name}_min"),
                 F.max("_b").alias(f"{b_name}_max")))
