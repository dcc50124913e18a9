"""Graph feature propagation (SGC / LightGCN-style neighborhood
smoothing, Wu et al. 2019) as pure DataFrame algebra — the GNN
*preprocessing* stage of a KG/embedding pipeline: k rounds of
x_{k+1}(v) = (x_k(v) + Σ_{u→v} x_k(u)) div (in_deg(v) + 1)
over integer feature vectors, i.e. repeated mean-aggregation with a
self-loop, the linear part of a graph convolution with the
nonlinearities removed (which is exactly what SGC showed you can drop).

Reference scope note: no counterpart in the reference CLI — this is
engine surface for the mandated embedding/graph operator families
(similarity, clustering, graphrank), giving entity embeddings that mix
in graph structure before ANN/semantic-dedup consume them.

INTEGER-EXACT: features are integer vectors (quantize floats upstream,
e.g. floor(x * 1e3)); each round's mean uses integer division with
Spark ``div`` semantics (truncation toward zero), which DuckDB's ``//``
reproduces — so after any number of rounds every coordinate is a BIGINT
both engines agree on bit-for-bit. The price is one unit of rounding
per round, irrelevant for similarity/dedup consumers.

Scale shape: features travel in LONG FORM (node, dim, v) — dim is a
small constant, so this multiplies rows by dim but keeps every step an
equi-join / rollup on node ids (the keys the engine already shuffles
on). Per round: one src-keyed join, one (dst, dim) rollup — the dim
component spreads a hot hub over ``dim`` reducers, the same
skew-diffusion kgembed's delta rollup uses — and one node-keyed apply
join against the static in-degree table (computed ONCE, not per
round). For many rounds, localCheckpoint every few rounds exactly as
operators/components does; the default 2 rounds (SGC's sweet spot)
needs none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_features(feats: DataFrame, id_col: str = "id",
                     vec_col: str = "vec") -> DataFrame:
    """(id, dim, v): long-form view of an integer feature table."""
    return feats.select(F.col(id_col).alias("id"),
                        F.posexplode(vec_col).alias("dim", "v"))


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int | None = None,
                        scale: int = 1000) -> DataFrame:
    """(id, vec): float embeddings -> integer features via
    floor(double(x) * scale) per coordinate (optionally truncated to the
    first ``dim`` dims). float->double widening is exact and the product
    correctly rounded, so both engines floor the identical double."""
    v = F.col(vec_col) if dim is None else F.slice(vec_col, 1, dim)
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(v, lambda x: F.floor(x.cast("double") * scale)
                    .cast("long")).alias("vec"))


def propagate_features(edges: DataFrame, feats: DataFrame,
                       rounds: int = 2, id_col: str = "id",
                       vec_col: str = "vec", src: str = "src",
                       dst: str = "dst",
                       checkpoint_every: int = 0) -> DataFrame:
    """k rounds of self-loop mean aggregation over ``edges`` (directed,
    src→dst); returns (id, dim, v) long form for the node universe of
    ``feats``. Edges from nodes without features contribute nothing;
    edges into nodes without features are dropped (the feature table IS
    the universe). ``checkpoint_every`` > 0 localCheckpoints the state
    every that many rounds (long chains)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_deg"))
    x = explode_features(feats, id_col, vec_col)
    for i in range(rounds):
        contrib = (e.join(x.select(F.col("id").alias("src"), "dim", "v"),
                          "src")
                   .groupBy("dst", "dim")
                   .agg(F.sum("v").alias("_s")))
        x = (x.join(contrib.withColumnRenamed("dst", "id"),
                    ["id", "dim"], "left")
             .join(deg.withColumnRenamed("dst", "id"), "id", "left")
             .select("id", "dim",
                     F.expr("(v + coalesce(_s, 0)) div "
                            "(coalesce(_deg, 0) + 1)").cast("long")
                     .alias("v")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            x = x.localCheckpoint(eager=False)
    return x


def assemble_features(long_form: DataFrame) -> DataFrame:
    """(id, vec): fold the long form back to arrays (dims sorted)."""
    return (long_form.groupBy("id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: s.v).alias("vec")))
