"""Connected components over an edge DataFrame (iterative min-label
propagation) — the resolution step of entity canonicalization.

Spark has no built-in graph operator (GraphFrames jars unavailable offline),
so this is hand-rolled DataFrame iteration designed for scale:

- **salted two-stage min-aggregation**: hot nodes (the Zipf-skewed entities
  the generator plants) would funnel every neighbor label into one reducer;
  `groupBy(node, salt).min` then `groupBy(node).min` spreads the first stage
  across SALT buckets (north_rule: "skew handled explicitly"). AQE skew-join
  splitting stays on as the second line of defense.
- **localCheckpoint per iteration** truncates lineage so plan size and task
  deserialization stay O(1) in the iteration count.
- convergence check is a single `count` of changed labels per round; alias
  clusters have tiny diameter (<=3 hops) so rounds, not data volume, dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """edges (src, dst) -> (node, component) where component is the
    lexicographic min node id of the component. Deterministic."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    # seed labels with one neighbor-min pass (salted like the loop): cliques
    # and stars — the dominant shapes for alias clusters — converge here in
    # round zero, so the loop usually runs only its convergence-verify round
    labels = (
        sym.select("a", "b",
                   F.pmod(F.xxhash64("b"), F.lit(SALT_BUCKETS)).alias("salt"))
        .groupBy("a", "salt").agg(F.min("b").alias("mb"))
        .groupBy("a").agg(F.min("mb").alias("nbr_min"))
        .select(F.col("a").alias("node"),
                F.least(F.col("a"), F.col("nbr_min")).alias("component"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # neighbor label messages; salted pre-aggregation tames hot nodes
        msgs = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .select(F.col("a").alias("node"), "component",
                    F.pmod(F.xxhash64("b"), F.lit(SALT_BUCKETS)).alias("salt"))
            .groupBy("node", "salt").agg(F.min("component").alias("component"))
            .groupBy("node").agg(F.min("component").alias("nbr_min"))
        )
        prop = (
            labels.join(msgs, on="node", how="left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component")))
                .alias("mid_component"),
                "component",
            )
        )
        # pointer jump (label doubling): component := component's component.
        # Neighbor-min alone moves labels ONE hop per round, so a
        # high-diameter graph (a 40-node chain) would silently exceed
        # max_iter; the jump halves label-tree height each round, making
        # convergence O(log diameter) — 2^25 diameter headroom.
        parents = prop.select(F.col("node").alias("p_node"),
                              F.col("mid_component").alias("p_comp"))
        updated = (
            prop.join(parents, prop.mid_component == parents.p_node, "left")
            .select("node",
                    F.least(F.col("mid_component"),
                            F.coalesce("p_comp", F.col("mid_component")))
                    .alias("new_component"),
                    "component")
        ).localCheckpoint()
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        # projection of the already-checkpointed `updated` — lineage stays
        # O(1) without a second materialization per round
        labels = updated.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            return labels

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(graph diameter beyond 2^max_iter is not plausible — check for "
        "label-order instability)")
