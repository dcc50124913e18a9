"""Vertex-cut partitioning and Z-order layout — openapi_to_rdf_spark.operators.layout."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators import layout


@pytest.fixture(scope="module")
def skewed_edges(spark):
    # one celebrity source with 800 edges + 200 uniform edges
    rows = [("hot", f"d{i}") for i in range(800)]
    rows += [(f"s{i}", f"d{i % 50}") for i in range(200)]
    return spark.createDataFrame(rows, "src string, dst string")


def test_2d_replication_bound(spark, skewed_edges):
    num_parts = 16
    r = math.isqrt(num_parts - 1) + 1
    pid = layout.edge_partition_2d(skewed_edges, num_parts)
    assigned = skewed_edges.select("src", "dst", pid.alias("pid"))
    per_vertex = (assigned.select(F.col("src").alias("v"), "pid")
                  .unionAll(assigned.select(F.col("dst").alias("v"), "pid"))
                  .distinct().groupBy("v").count())
    worst = per_vertex.agg(F.max("count")).first()[0]
    assert worst <= 2 * r - 1
    # pids all in range
    lo, hi = assigned.agg(F.min("pid"), F.max("pid")).first()
    assert 0 <= lo and hi < r * r


def test_2d_beats_1d_on_skew(spark, skewed_edges):
    stats = {row["strategy"]: row
             for row in layout.layout_comparison(skewed_edges, 16).collect()}
    one_d, two_d = stats["1d_src"], stats["2d_grid"]
    # 1D puts the hot vertex's 800 edges in one partition
    assert one_d["max_edges"] >= 800
    # 2D spreads them across ~r partitions
    assert two_d["max_edges"] < 400
    assert two_d["balance_e6"] < one_d["balance_e6"]
    # replication is a bounded premium (avg <= 2r-1 = 7 parts per vertex);
    # no ordering claim vs 1D — shared hot DESTINATIONS replicate under 1D
    # src-hash too, which is this fixture's regime
    assert 1_000_000 <= two_d["replication_e6"] <= 7_000_000
    assert one_d["n_edges"] == 1000 == two_d["n_edges"]


def test_1d_colocates_sources(spark, skewed_edges):
    pid = layout.edge_partition_1d(skewed_edges, 16)
    n = (skewed_edges.select("src", pid.alias("pid")).distinct()
         .groupBy("src").count().agg(F.max("count")).first()[0])
    assert n == 1  # every source's edges in exactly one partition


def _morton_py(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference_and_sql(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (5, 9), (255, 17), (65535, 65535),
             (12345, 54321)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["a"], r["b"]): r["z"]
           for r in df.select("a", "b",
                              layout.zorder_key(F.col("a"), F.col("b")).alias("z"))
           .collect()}
    for a, b in pairs:
        assert got[(a, b)] == _morton_py(a, b)
    # the SQL rendering computes the identical key in DuckDB
    con = duckdb.connect()
    expr = layout.zorder_key_sql("a", "b")
    for a, b in pairs:
        (z,) = con.execute(
            f"SELECT {expr} FROM (SELECT {a}::BIGINT a, {b}::BIGINT b)").fetchone()
        assert z == _morton_py(a, b)


def test_zorder_locality_prunes_both_dims(spark):
    # 64x64 grid of points; 16 buckets of 256 rows each
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "a long, b long")
    boxes = layout.zorder_locality(df, F.col("a"), F.col("b"), 16).collect()
    assert sum(r["n_rows"] for r in boxes) == 4096
    # Morton buckets of a full 64x64 grid are exact 16x16 quadrants:
    # bounded in BOTH dimensions (a 1D sort would span all 64 b-values)
    for r in boxes:
        assert r["a_max"] - r["a_min"] <= 15
        assert r["b_max"] - r["b_min"] <= 15
