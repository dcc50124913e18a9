"""Bounded-depth Brandes betweenness centrality (k-source).

Brandes' algorithm (Brandes 2001, "A faster algorithm for betweenness
centrality") restricted to shortest paths of length <= max_depth from a
source sample — the k-betweenness / sampled-pivot variant used by the
large-graph literature (GraphCT/STINGER, Bader et al.): with sources =
all nodes and max_depth >= diameter it IS exact betweenness; with a
hash-chosen pivot sample it is the standard unbiased estimator scaled by
n/k.

Two phases, both pure DataFrame joins keyed on node ids:
- FORWARD (one round per BFS level): frontier_{l+1} = frontier_l x edges,
  sigma (shortest-path counts) accumulated by a (source, node) rollup,
  visited-set anti-join enforcing BFS level = shortest distance.
- BACKWARD (one round per level, descending): dependency
  delta_l(v) = sum over successors w at level l+1 of
  sigma_l(v)/sigma_{l+1}(w) * (1 + delta_{l+1}(w)); betweenness(v) =
  sum of deltas over sources and levels >= 1 (endpoints excluded, the
  Brandes convention).

Scale design:
- State is (source, node) pairs — k x reachable-set, never edge^2; every
  join keys on a node id (AQE skew-split territory for celebrity nodes).
- Rounds are bounded by max_depth (not diameter discovery), so the
  driver-side loop is a fixed, known cost like k_core/pagerank; each
  level is localCheckpoint-ed to keep lineage flat.
- sigma ratios are divisions of small exact integers (IEEE-exact in any
  engine); only the final per-node sum is e6-rounded — the driver oracle
  unrolls the same fixed depth in SQL and reproduces the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bfs_levels(edges: DataFrame, sources: DataFrame, max_depth: int,
                src_col: str, dst_col: str, source_col: str):
    """Shared forward pass: per-level (s, node, sigma) frames where level
    index = shortest distance and sigma = shortest-path count. Returns
    (edge frame, [level frames])."""
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .dropDuplicates())
    lvl0 = (sources.select(F.col(source_col).alias("s")).dropDuplicates()
            .select("s", F.col("s").alias("node"),
                    F.lit(1).cast("long").alias("sigma")))

    levels = [lvl0.localCheckpoint(eager=True)]
    visited = levels[0].select("s", "node").localCheckpoint(eager=True)
    for _ in range(max_depth):
        fr = levels[-1]
        nxt = (fr.join(e, fr.node == e.u)
               .groupBy("s", F.col("v").alias("node"))
               .agg(F.sum("sigma").alias("sigma"))
               .join(visited, ["s", "node"], "left_anti")
               .localCheckpoint(eager=True))
        if nxt.isEmpty():          # frontier died before the horizon —
            break                  # bounded driver sync, like k_core
        levels.append(nxt)
        visited = (visited.unionByName(nxt.select("s", "node"))
                   .localCheckpoint(eager=True))
    return e, levels


def betweenness(edges: DataFrame, sources: DataFrame, max_depth: int = 3,
                src_col: str = "src", dst_col: str = "dst",
                source_col: str = "id") -> DataFrame:
    """Betweenness over shortest paths of length <= max_depth starting at
    ``sources``. Directed; parallel edges collapse (shortest-path counts
    are over simple edge relations). Returns (node, bc_e6) for every node
    that accumulates any dependency, bc_e6 = round(sum of deltas * 1e6).
    """
    e, levels = _bfs_levels(edges, sources, max_depth,
                            src_col, dst_col, source_col)

    # backward accumulation; deepest level's delta = 0
    deep = levels[-1]
    delta = deep.select("s", "node", "sigma",
                        F.lit(0.0).alias("delta"))
    acc = [delta] if len(levels) > 1 else []
    for l in range(len(levels) - 2, 0, -1):
        cur = levels[l]
        succ = delta.select("s", F.col("node").alias("w"),
                            F.col("sigma").alias("sigma_w"),
                            F.col("delta").alias("delta_w"))
        contrib = (cur.join(e, cur.node == e.u)
                   .join(succ, (cur.s == succ.s) & (e.v == succ.w))
                   .groupBy(cur.s.alias("s"), cur.node.alias("node"))
                   .agg(F.sum(F.col("sigma") / F.col("sigma_w")
                              * (1 + F.col("delta_w"))).alias("d")))
        delta = (cur.join(contrib, ["s", "node"], "left")
                 .select("s", "node", "sigma",
                         F.coalesce(F.col("d"), F.lit(0.0)).alias("delta"))
                 .localCheckpoint(eager=True))
        acc.append(delta)

    if not acc:
        return (edges.sparkSession
                .createDataFrame([], "node string, bc_e6 long"))
    out = acc[0]
    for d in acc[1:]:
        out = out.unionByName(d)
    return (out.groupBy("node")
            .agg(F.round(F.sum("delta") * 1e6).cast("long").alias("bc_e6"))
            .orderBy("node"))


def harmonic_centrality(edges: DataFrame, sources: DataFrame,
                        max_depth: int = 3, src_col: str = "src",
                        dst_col: str = "dst",
                        source_col: str = "id") -> DataFrame:
    """Sampled harmonic centrality (Eppstein–Wang style pivot estimator,
    depth-bounded): H(v) = sum over sources s != v of 1/d(s, v), with
    d from the same forward BFS the betweenness pass uses. Harmonic
    (not classic closeness) so unreachable pairs contribute 0 instead of
    poisoning the sum — the standard choice on disconnected graphs.
    Returns (node, n_sources, harmonic_e6) for every node reached by at
    least one source; 1/d terms are exact unit fractions so both engines
    agree to the e6 digit."""
    _, levels = _bfs_levels(edges, sources, max_depth,
                            src_col, dst_col, source_col)
    if len(levels) == 1:
        return (edges.sparkSession.createDataFrame(
            [], "node string, n_sources long, harmonic_e6 long"))
    out = None
    for d, lvl in enumerate(levels[1:], start=1):
        part = lvl.select("s", "node",
                          (F.lit(1.0) / F.lit(d)).alias("h"))
        out = part if out is None else out.unionByName(part)
    return (out.groupBy("node")
            .agg(F.count(F.lit(1)).alias("n_sources"),
                 F.round(F.sum("h") * 1e6).cast("long")
                 .alias("harmonic_e6"))
            .orderBy("node"))
