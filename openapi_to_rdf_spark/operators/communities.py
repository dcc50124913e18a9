"""Community detection via synchronous label propagation (LPA).

Connected components (components.py) answer "what merges"; communities
answer "what clusters" — denser-than-chance neighborhoods inside one giant
component (entity domains in the KG, topical groups in the doc-similarity
graph). Raghavan et al.'s label propagation is the standard near-linear-time
method and maps cleanly onto DataFrame iteration:

  label(v) <- the label most frequent among v's neighbors
              (ties -> smallest label; deterministic)

Scale design mirrors connected_components:
- neighbor-label counting is a (node, label) groupBy — map-side partial
  aggregation absorbs hot-node fan-in before the shuffle (a 10^8-degree
  celebrity contributes at most one partial row per task per label);
- the per-node argmax is ONE aggregation — ``min(struct(-n, label))``
  orders by count desc then label asc, so no join-back/window second pass;
- ``localCheckpoint`` per round keeps lineage O(1) in the iteration count;
- synchronous updates + smallest-label tie-breaks make every round a pure
  function of the previous labeling — deterministic under any partitioning
  (asynchronous LPA is order-dependent; that nondeterminism is exactly what
  a distributed engine must not inherit).

``iterations`` fixes the round count (the oracle-checkable mode — the
driver query unrolls the same rounds in SQL); ``until_stable=True`` adds a
changed-label convergence count per round (bounded by ``iterations``).
Pure synchronous LPA 2-cycles on bipartite-ish structure (an isolated edge
oscillates forever), so each node also casts ONE vote for its own current
label — the standard self-preference damping; implemented as a self-edge
union so the vote flows through the same groupBy. A hard round cap remains
the termination backstop (Raghavan et al. report ~5 rounds suffice; we
default to 10).

No counterpart in the reference (no graph algorithms there at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      iterations: int = 10,
                      until_stable: bool = False) -> DataFrame:
    """edges (src, dst) -> (node, community). Undirected simple graph
    (direction/multi-edges/self-loops collapse first); initial label = own
    node id; community = final label remapped to the smallest member node id
    so output ids are stable, human-readable members of each community."""
    fwd = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .filter(F.col("a") != F.col("b")))
    und = (fwd.unionByName(fwd.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
           .dropDuplicates(["a", "b"]))
    # self-preference vote: one (a, a) edge per node, so the node's own
    # current label enters the same neighbor-count groupBy with weight 1
    nodes = und.select("a").dropDuplicates()
    sym = (und.unionByName(nodes.withColumn("b", F.col("a")))
           .localCheckpoint())

    labels = (nodes.select(F.col("a").alias("node"))
              .withColumn("label", F.col("node"))
              .localCheckpoint())

    for _ in range(iterations):
        nbr = (sym.join(labels.withColumnRenamed("node", "b"), "b")
               .groupBy(F.col("a").alias("node"), "label")
               .agg(F.count(F.lit(1)).alias("n")))
        new = (nbr.groupBy("node")
               .agg(F.min(F.struct((-F.col("n")).alias("neg_n"),
                                   F.col("label").alias("l")))
                    .alias("best"))
               .select("node", F.col("best.l").alias("label")))
        if until_stable:
            changed = (new.join(labels.withColumnRenamed("label", "old"),
                                "node")
                       .filter(F.col("label") != F.col("old")).count())
            labels = new.localCheckpoint()
            if changed == 0:
                break
        else:
            labels = new.localCheckpoint()

    # canonical community id: smallest node id carrying each label
    canon = labels.groupBy("label").agg(F.min("node").alias("community"))
    return labels.join(canon, "label").select("node", "community")


def community_modularity(edges: DataFrame, assignment: DataFrame,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """Newman modularity of a node partition, in INTEGER arithmetic.

    For the undirected simple graph induced by ``edges`` (canonicalized
    to (min, max), self-loops and duplicates dropped) and a partition
    ``assignment`` (node, community), modularity is

        Q = sum_c [ intra_c / m  -  (deg_c / 2m)^2 ]

    Floats would make Q partition-order-dependent, so each community row
    carries the exact integer numerator over the common denominator 4m^2:

        q_num = 4*m*intra_c - deg_c^2        (Q = sum(q_num) / (4*m^2))

    Returns (community, n_nodes, intra_edges, degree_sum, q_num, m) —
    bit-reproducible anywhere, DuckDB included; callers divide at
    whatever precision they want. Unassigned endpoints contribute to m
    and to degrees but to no community (standard treatment when scoring
    a partial clustering).

    Scale: one canonicalization pass over edges, two node-keyed joins to
    attach communities, then community-keyed rollups — all shuffles on
    keys the clustering itself already produced; output is
    community-vocabulary sized. m travels as a broadcast one-row cross
    join, never a driver collect.
    """
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.least(src, dst).alias("a"),
                 F.greatest(src, dst).alias("b"))
         .dropDuplicates())
    m_row = e.agg(F.count(F.lit(1)).alias("m"))
    deg = (e.select(F.col("a").alias("node"))
           .unionAll(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    asg = assignment.select("node", "community").dropDuplicates(["node"])
    node_stats = (deg.join(asg, "node")
                  .groupBy("community")
                  .agg(F.count(F.lit(1)).alias("n_nodes"),
                       F.sum("deg").alias("degree_sum")))
    intra = (e.join(asg.withColumnRenamed("node", "a")
                    .withColumnRenamed("community", "ca"), "a")
             .join(asg.withColumnRenamed("node", "b")
                   .withColumnRenamed("community", "cb"), "b")
             .filter(F.col("ca") == F.col("cb"))
             .groupBy(F.col("ca").alias("community"))
             .agg(F.count(F.lit(1)).alias("intra_edges")))
    return (node_stats
            .join(intra, "community", "left")
            .withColumn("intra_edges",
                        F.coalesce("intra_edges", F.lit(0)))
            .crossJoin(F.broadcast(m_row))
            .select("community", "n_nodes", "intra_edges",
                    F.col("degree_sum").cast("long").alias("degree_sum"),
                    (F.lit(4) * F.col("m") * F.col("intra_edges")
                     - F.col("degree_sum") * F.col("degree_sum"))
                    .cast("long").alias("q_num"),
                    F.col("m").cast("long").alias("m")))
