"""Iterative graph analytics over materialized graphs: PageRank and k-hop
neighborhoods — the "what matters / what's nearby" queries a KG consumer
runs after construction (entity importance for linker priors, neighborhood
expansion for context retrieval).

Scale design:

- PageRank is the classic iterative DataFrame job: rank state joined to the
  edge list, contributions aggregated per destination, damping applied —
  K rounds, one shuffle per round on the edge key. The per-destination
  aggregation is SALTED two-stage (same pattern as operators/components):
  a celebrity node with 10^8 in-edges would otherwise concentrate one
  reducer; salting splits its fan-in across ``salt_buckets`` partial sums.
- Ranks are the ONLY re-shuffled state (narrow: node, rank). The edge list
  is re-read each round with its existing partitioning; out-degrees are
  computed once. At 10^12 edges each round is a bounded-width join, and K
  is small (power iteration converges geometrically).
- Fixed iteration count keeps the operator deterministic and lets the
  driver hash-verify it: ``doc_pagerank`` unrolls the same K rounds in
  ANSI SQL (DuckDB) and must match to 6 decimals.
- k_hop is iterative sparse frontier expansion (semi-join per hop, distinct
  frontier state) — BFS layers, not transitive closure, so state stays
  O(reached nodes), never O(paths).

Semantics (pinned for the oracle):

- Directed edges (src, dst); multi-edges collapse to one (dedup inside).
- rank_0 = 1/n for the n nodes appearing in the edge list (either side).
- rank_{t+1}(v) = (1-d)/n + d * (sum of rank_t(u)/outdeg(u) over in-edges
  + dangling_mass/n), where dangling nodes (no out-edges) redistribute
  their rank uniformly — the standard stochastic-matrix completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             salt_buckets: int = SALT_BUCKETS) -> DataFrame:
    """Fixed-iteration PageRank -> (node, rank). See module docstring for
    pinned semantics; deterministic in (edges, iterations, damping)."""
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .dropDuplicates(["src", "dst"]))

    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .dropDuplicates(["node"])
             .localCheckpoint())  # cut lineage: reused every round
    n = nodes.count()

    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg"))
    # edge list annotated with source out-degree, one join, reused per round
    e_deg = (e.join(outdeg, e["src"] == outdeg["node"])
             .select("src", "dst", "outdeg")
             .localCheckpoint())

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    for _ in range(iterations):
        contribs = (e_deg.join(ranks, e_deg["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"), "src",
                            (F.col("rank") / F.col("outdeg")).alias("contrib")))
        # salted two-stage sum: partial per (dst, salt-of-src), then final —
        # a hot destination's fan-in spreads over salt_buckets reducers
        # (deterministic: the salt is a pure function of the edge source).
        # At cluster scale, bucket the edge table by src so the per-round
        # rank join is exchange-free on the big side.
        partial = (contribs
                   .withColumn("salt", F.pmod(F.xxhash64("src"),
                                              F.lit(salt_buckets)))
                   .groupBy("node", "salt").agg(F.sum("contrib").alias("psum")))
        summed = partial.groupBy("node").agg(F.sum("psum").alias("insum"))

        # dangling mass: rank held by nodes with no out-edges
        dangling = (ranks.join(outdeg, "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")))
        ranks = (nodes.join(summed, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * (F.coalesce(F.col("insum"), F.lit(0.0))
                                              + F.col("m") / n)).alias("rank"))
                 .localCheckpoint())  # materialize: keeps each round's plan flat

    return ranks


def k_hop(edges: DataFrame, sources: DataFrame, k: int = 2,
          src_col: str = "src", dst_col: str = "dst",
          node_col: str = "node") -> DataFrame:
    """Nodes within <= k directed hops of the source set -> (node, hops)
    with hops = the MINIMUM distance (BFS layers). Sources are hop 0.

    Frontier expansion: each round joins only the previous frontier to the
    edge list and anti-joins the already-reached set — state is the reached
    set (narrow), never paths. k is small in practice; each hop is one
    equi-join shuffle."""
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .dropDuplicates(["src", "dst"]))
    reached = (sources.select(F.col(node_col).cast("string").alias("node"))
               .dropDuplicates(["node"])
               .withColumn("hops", F.lit(0)))
    frontier = reached
    for hop in range(1, k + 1):
        nxt = (e.join(frontier.select(F.col("node").alias("src")), "src")
               .select(F.col("dst").alias("node"))
               .dropDuplicates(["node"])
               .join(reached.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(hop)))
        nxt = nxt.localCheckpoint()  # cut the per-hop lineage growth
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return reached


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts over the UNDIRECTED simple graph the
    edge list induces (direction and multi-edges collapse first).

    Degree-ordered wedge closing (the standard scale trick, cf. Cohen's
    MapReduce triangle enumeration / GraphFrames): every edge is oriented
    from its lower-degree endpoint to its higher-degree endpoint (ties by
    id), wedges (a->b, a->c) are built per pivot a, and a wedge closes iff
    the oriented edge (b->c) exists. Orientation bounds every node's
    out-degree by O(sqrt(m)) on any graph — a celebrity node with 10^8
    neighbors is never a wedge pivot, so the wedge join cannot go quadratic
    on skew (the unoriented algorithm would enumerate its 10^16 wedges).

    Each triangle is found exactly once (its unique lowest-order pivot).
    Returns (node, n_triangles) for every node in at least one triangle;
    total triangles = sum / 3.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
           .dropDuplicates())
    deg = (und.select(F.col("u").alias("n")).unionAll(und.select("v"))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))

    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | \
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = (und.join(du, "u").join(dv, "v")
                .select(F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
                        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b")))

    e1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("x"))
    e2 = oriented.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = (e1.join(e2, "p").filter(F.col("x") < F.col("y")))
    closed = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(oriented.select(F.col("b").alias("x"), F.col("a").alias("y"))),
        ["x", "y"], "left_semi")

    per_node = (closed.select(F.explode(F.array("p", "x", "y")).alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles")))
    return per_node


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node over the undirected simple
    graph: ``lcc = 2 * triangles(v) / (deg(v) * (deg(v) - 1))`` (0 when
    deg < 2). The mesoscale cohesion metric next to triangle counts —
    standard in KG quality profiling (how clique-like is each entity's
    neighborhood).

    Composition of two scale-safe pieces: degree-ordered triangle_count
    (wedge pivots bounded O(sqrt(m)) — see above) + one degree groupBy.
    Returns (node, degree long, n_triangles long, lcc_e6 long) for every
    node of the graph; e6 fixed-point so the DuckDB oracle hash-matches.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("u"),
                   F.greatest("u", "v").alias("v"))
           .dropDuplicates())
    deg = (und.select(F.col("u").alias("node")).unionAll(und.select("v"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(und, src="u", dst="v")
    lcc = (2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
           / (F.col("degree") * (F.col("degree") - 1)))
    return (deg.join(tri, "node", "left")
            .select("node", "degree",
                    F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
                    F.when(F.col("degree") >= 2, F.round(lcc * 1e6))
                    .otherwise(F.lit(0)).cast("long").alias("lcc_e6")))


def random_walks(edges: DataFrame, walk_len: int, walks_per_node: int = 1,
                 src: str = "src", dst: str = "dst",
                 seed: int = 42) -> DataFrame:
    """Deterministic uniform random walks over a directed graph — the
    GNN / node2vec corpus-generation step (each walk is one training
    sequence), derandomized with the repo's content-hash discipline:
    step t of walk (start, widx) picks neighbor number
    ``uint32(md5(start|widx|t|seed)) % out_degree(cur)`` from the
    current node's dst-sorted adjacency ranks. Same walks on any
    engine, partitioning, or rerun (exact DuckDB twin unrolls the steps
    as CTEs — driver query ``graph_walks``).

    Walks start at every distinct source node, ``walks_per_node`` each,
    and stop early at sinks (nodes without out-edges) — shorter walks
    are data, not errors. Output: (start, widx, step, node), step 0 =
    the start node.

    Scale design: ranking the adjacency is one window over the edge
    partitioning (rank = dense 0..deg-1 per src); each step is TWO
    equi-joins — (cur = deg.src) for the modulus, then
    (cur, pick) = (ranked.src, ranked.rk) — never a sample() or an
    RNG; walk state is one row per walk, localCheckpointed per step so
    the plan stays flat. Hot nodes concentrate the per-step join key
    exactly like PageRank's fan-in; AQE skew-split handles it (same
    argument as `pagerank` above).
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("e_src"),
                     F.col(dst).alias("e_dst")).dropDuplicates()
    w = Window.partitionBy("e_src").orderBy("e_dst")
    ranked = (e.withColumn("rk", F.row_number().over(w) - 1)
              .select(F.col("e_src").alias("r_src"), "e_dst", "rk")
              .localCheckpoint())
    deg = (ranked.groupBy("r_src")
           .agg(F.count(F.lit(1)).alias("deg"))
           .select(F.col("r_src").alias("d_src"), "deg")
           .localCheckpoint())

    starts = (deg.select(F.col("d_src").alias("start"))
              .withColumn("widx", F.explode(
                  F.sequence(F.lit(0), F.lit(walks_per_node - 1)))))
    state = starts.select("start", "widx", F.lit(0).alias("step"),
                          F.col("start").alias("node")).localCheckpoint()
    out = state
    for t in range(1, walk_len + 1):
        h = (F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("start"), F.col("widx").cast("string"),
            F.lit(str(t)), F.lit(str(seed)))), 1, 8), 16, 10)
            .cast("long"))
        nxt = (state.join(deg, state["node"] == deg["d_src"])
               .withColumn("pick", h % F.col("deg"))
               .join(ranked, (F.col("node") == ranked["r_src"])
                     & (F.col("pick") == ranked["rk"]))
               .select("start", "widx", F.lit(t).alias("step"),
                       F.col("e_dst").alias("node"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        state = nxt
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) skip-gram training pairs from random walks —
    node2vec/DeepWalk step 2 (each pair is one row of the embedding
    trainer's input). For every walk, emits (node_at(t), node_at(t+d))
    for all 0 < |d| <= window, with the signed offset kept (callers
    wanting symmetric bags just drop the column). BAG semantics — pair
    multiplicity IS the training signal.

    One self-equi-join on the walk identity (start, widx) with the
    |Δstep| window as a residual filter: per-walk groups are walk_len
    rows, so the join fan-out is bounded by walk_len·2·window per walk,
    and the shuffle key is the walk id — uniform by construction
    (hash-minted), no skew.
    """
    a = walks.select(F.col("start"), F.col("widx"),
                     F.col("step").alias("a_step"),
                     F.col("node").alias("center"))
    b = walks.select(F.col("start").alias("b_start"),
                     F.col("widx").alias("b_widx"),
                     F.col("step").alias("b_step"),
                     F.col("node").alias("context"))
    return (a.join(b, (a["start"] == b["b_start"])
                   & (a["widx"] == b["b_widx"])
                   & (b["b_step"] != a["a_step"])
                   & (b["b_step"] >= a["a_step"] - window)
                   & (b["b_step"] <= a["a_step"] + window))
            .select("center", "context",
                    (F.col("b_step") - F.col("a_step")).alias("offset")))


def k_core(edges: DataFrame, k: int, rounds: int | None = None,
           max_rounds: int = 50, src: str = "src",
           dst: str = "dst") -> DataFrame:
    """k-core of the undirected simple graph: iteratively peel nodes with
    degree < k until every survivor has >= k surviving neighbors — the
    standard graph-curation gate (keep densely-embedded entities, drop
    tendrils/noise before community/embedding stages; Seidman 1983).

    ``rounds=R`` fixes EXACTLY R peel rounds (each: degrees over the
    surviving subgraph, drop nodes below k) — deterministic and
    SQL-unrollable, the mode the driver's DuckDB oracle replays
    (``kg_kcore``), same fixed-rounds-for-oracle pattern as
    communities.label_propagation. ``rounds=None`` peels until a round
    removes nothing (the true k-core), with a loud ``max_rounds`` cap;
    the peel count is bounded by the graph's degeneracy ordering depth,
    tiny in practice (power-law graphs: a few dozen).

    Returns (node, degree): survivors with their k-core-subgraph degree.
    Pinned fixed-rounds semantics: after EXACTLY R peels, degrees are
    measured in the R-peeled subgraph and nodes below k are filtered
    (not peeled — their edges still count toward neighbors' degrees);
    converged mode makes the filter a no-op.

    Scale: each round is one endpoint-exploded degree count (map-side
    combine absorbs celebrity fan-in) + two anti-joins of the edge list
    against the SMALL removed-node set; the edge set only shrinks.
    ``localCheckpoint`` per round keeps lineage O(1); per-round driver
    sync (the removal count) is the same accepted cost as
    connected_components' convergence check.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    live = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .dropDuplicates().localCheckpoint())

    def degrees(e):
        return (e.select(F.col("u").alias("node")).unionAll(
            e.select(F.col("v").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))

    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        bad = degrees(live).filter(F.col("degree") < k).select("node")
        if rounds is None and bad.isEmpty():
            break
        live = (live.join(bad, live["u"] == bad["node"], "left_anti")
                .join(bad, live["v"] == bad["node"], "left_anti")
                .localCheckpoint())
    else:
        if rounds is None:
            raise RuntimeError(f"k_core did not converge in "
                               f"{max_rounds} rounds")
    return degrees(live).filter(F.col("degree") >= k)


def shortest_paths(edges: DataFrame, sources: DataFrame,
                   rounds: int | None = None, max_rounds: int = 50,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: str = "weight",
                   node_col: str = "node") -> DataFrame:
    """Weighted single/multi-source shortest paths -> (node, dist).

    Distributed Bellman-Ford with FRONTIER relaxation: each round joins only
    the nodes whose distance improved last round against the edge list,
    min-aggregates tentative distances per destination, and keeps the
    improvements. State is one (node, dist) row per reached node — never
    paths — and the per-round shuffle is bounded by the frontier's out-edge
    count, so late rounds on high-diameter graphs touch only the expanding
    rim (delta-stepping's win, without its bucket machinery).

    ``rounds=R`` pins EXACTLY R relaxation rounds: dist = the minimum weight
    over paths using <= R edges — deterministic and SQL-expressible (the
    driver oracle replays it as a step-bounded recursive CTE), the same
    fixed-rounds-for-oracle pattern as k_core/label_propagation.
    ``rounds=None`` relaxes to convergence (true shortest paths) with a
    loud ``max_rounds`` cap; rounds needed = the shortest-path tree's max
    edge count, small on small-world graphs.

    Semantics pinned for the oracle: directed edges; multi-edges collapse
    to the MINIMUM weight; negative weights rejected (Bellman-Ford would
    need n-1 rounds and cycle detection — out of scope, loudly); sources
    are dist 0; unreachable nodes are absent from the output. Weight sums
    accumulate along each path left-to-right in both engines, so even
    float weights compare hash-exactly.
    """
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"),
                      F.col(weight_col).cast("double").alias("w"))
         .groupBy("src", "dst").agg(F.min("w").alias("w"))
         .localCheckpoint())
    if e.filter(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("shortest_paths requires non-negative weights")

    dist = (sources.select(F.col(node_col).cast("string").alias("node"))
            .dropDuplicates(["node"])
            .withColumn("dist", F.lit(0.0))
            .localCheckpoint())
    frontier = dist

    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        cand = (e.join(frontier.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("new")))
        improved = (cand.join(dist, "node", "left")
                    .filter(F.col("dist").isNull()
                            | (F.col("new") < F.col("dist")))
                    .select("node", F.col("new").alias("dist"))
                    .localCheckpoint())
        if rounds is None and improved.isEmpty():
            break
        dist = (dist.unionByName(improved)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint())
        frontier = improved
    else:
        if rounds is None:
            raise RuntimeError(f"shortest_paths did not converge in "
                               f"{max_rounds} rounds")
    return dist


def hits(edges: DataFrame, iterations: int = 2, src_col: str = "src",
         dst_col: str = "dst", salt_buckets: int = SALT_BUCKETS) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) -> (node, auth, hub), each
    score normalized by its maximum (so max = 1.0).

    Semantics pinned for the oracle: hub_0 = 1 for every node; per round,
    auth_k(v) = sum of hub_{k-1}(u) over in-edges (u,v), then
    hub_k(u) = sum of auth_k(v) over out-edges (u,v); normalization happens
    ONCE at the end (divide by max), not per round. With integer seeds the
    intermediate scores stay integral, so distributed double summation is
    ORDER-EXACT below 2^53 and the DuckDB twin matches bit-for-bit after
    e6 rounding — the same determinism trick pagerank's damping sums can't
    use. Scores grow ~(max_degree)^(2*iterations); keep iterations small
    (2-3 — ranking stabilizes fast) or normalize offline for larger K.

    Scale: the edge list is the only big table; each round is two
    edge-keyed aggregations with salted two-stage sums (celebrity fan-in
    splits across ``salt_buckets`` partials, as pagerank does). State is
    (node, score) — narrow. One localCheckpoint per round truncates the
    iterative lineage."""
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .dropDuplicates(["src", "dst"])
         .localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .dropDuplicates(["node"]).localCheckpoint())

    def _salted_sum(df, key, val, out):
        salt = F.pmod(F.xxhash64(key, val), F.lit(salt_buckets))
        part = (df.groupBy(F.col(key).alias("node"), salt.alias("_salt"))
                .agg(F.sum(val).alias("_part")))
        return part.groupBy("node").agg(F.sum("_part").alias(out))

    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(iterations):
        auth = _salted_sum(
            e.join(hub.withColumnRenamed("node", "src"), "src"),
            "dst", "hub", "auth").localCheckpoint()
        hub = _salted_sum(
            e.join(auth.withColumnRenamed("node", "dst"), "dst"),
            "src", "auth", "hub").localCheckpoint()
    scored = (nodes
              .join(auth, "node", "left")
              .join(hub, "node", "left")
              .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth"),
                      F.coalesce("hub", F.lit(0.0)).alias("hub")))
    mx = scored.agg(F.max("auth").alias("ma"),
                    F.max("hub").alias("mh"))
    return (scored.crossJoin(F.broadcast(mx))
            .select("node",
                    (F.col("auth") / F.col("ma")).alias("auth"),
                    (F.col("hub") / F.col("mh")).alias("hub")))


def node_jaccard(edges: DataFrame, src: str = "src", dst: str = "dst",
                 min_shared: int = 1,
                 threshold: tuple[int, int] | None = None,
                 neighbor_cap: int | None = None) -> DataFrame:
    """Neighbor-set Jaccard similarity between source nodes: for every
    unordered pair (u, v) sharing at least ``min_shared`` distinct
    neighbors, returns (u, v, shared, union_size) where
    ``sim = shared / union_size``. Co-mention-style KG relatedness
    ("entities referenced by similar turn sets") without embeddings.

    INTEGER-EXACT by design: no float division anywhere — the optional
    ``threshold=(num, den)`` keeps pairs with sim ≥ num/den via the
    cross-multiplied inequality ``shared * den >= union_size * num``, so
    results are engine-portable bit-for-bit (the DuckDB oracle runs the
    same arithmetic).

    Scale shape: pairs are generated by the textbook co-neighbor
    self-join keyed on the NEIGHBOR — per-neighbor work is quadratic in
    that neighbor's fan-in, which is exactly where web-scale graphs
    explode (a celebrity neighbor shared by 10^6 sources = 10^12
    pairs). ``neighbor_cap`` drops neighbors whose fan-in exceeds the
    cap BEFORE pairing (the stop-list discipline ngram_jaccard_pairs
    uses); capped results are a documented under-count of ``shared``
    (union_size stays exact), the safe direction for similarity
    screening. Leave it None for exact results on bounded-fan-in
    graphs."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("n"))
         .dropDuplicates())
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))

    pair_src = e
    if neighbor_cap is not None:
        fan = (e.groupBy("n").agg(F.count("*").alias("fan"))
               .filter(F.col("fan") <= neighbor_cap)
               .select("n"))
        pair_src = e.join(F.broadcast(fan), "n", "left_semi")

    right = pair_src.select(F.col("u").alias("v"), "n")
    co = (pair_src.join(right, "n")
          .filter(F.col("u") < F.col("v"))
          .groupBy("u", "v").agg(F.count("*").alias("shared"))
          .filter(F.col("shared") >= min_shared))
    out = (co.join(deg, "u")
           .join(deg.select(F.col("u").alias("v"),
                            F.col("deg").alias("deg_v")), "v")
           .select("u", "v", "shared",
                   (F.col("deg") + F.col("deg_v") - F.col("shared"))
                   .alias("union_size")))
    if threshold is not None:
        num, den = threshold
        out = out.filter(F.col("shared") * den >= F.col("union_size") * num)
    return out


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          rounds: int = 2, damping_e3: int = 850,
                          src_col: str = "src", dst_col: str = "dst",
                          seed_col: str = "id") -> DataFrame:
    """Per-seed personalized PageRank -> (seed, node, mass_e9) — the
    GraphRAG / local-expansion workhorse: random walk with restart to
    ONE seed, k fixed push rounds, INTEGER-EXACT by construction.

    Mass is e9-scaled BIGINT: each round every (seed, u, m) pushes
    (m * damping_e3 div 1000) div outdeg(u) along each out-edge (integer
    division truncating toward zero — DuckDB's `//` agrees), and the
    seed re-injects its restart share (1000 - damping_e3) e6-scaled.
    Truncation remainders and dangling mass are DROPPED, so masses are
    deterministic lower bounds — ranking consumers only compare them,
    and any engine reproduces every value bit-for-bit (no float
    summation order anywhere).

    Scale shape: state is (seed, node) rows like betweenness; per round
    one src-keyed join + one (seed, dst) rollup (seed multiplicity
    spreads hot hubs exactly as the dim column does in featprop), then
    the restart union. Out-degree table computed once. For deep walks
    localCheckpoint every few rounds as pagerank does; the default 2
    rounds needs none."""
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .dropDuplicates(["src", "dst"]))
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg"))
    e_deg = (e.join(outdeg, e["src"] == outdeg["node"])
             .select("src", "dst", "outdeg"))

    restart = F.lit((1000 - damping_e3) * 1_000_000).cast("long")
    mass = seeds.select(F.col(seed_col).cast("string").alias("seed"),
                        F.col(seed_col).cast("string").alias("node"),
                        F.lit(1_000_000_000).cast("long").alias("mass_e9"))
    for _ in range(rounds):
        pushed = (e_deg.join(mass, e_deg["src"] == mass["node"])
                  .select("seed", F.col("dst").alias("node"),
                          F.expr(f"(mass_e9 * {damping_e3} div 1000) "
                                 "div outdeg").alias("m")))
        inflow = pushed.groupBy("seed", "node").agg(
            F.sum("m").cast("long").alias("m"))
        mass = (inflow
                .unionByName(seeds.select(
                    F.col(seed_col).cast("string").alias("seed"),
                    F.col(seed_col).cast("string").alias("node"),
                    restart.alias("m")))
                .groupBy("seed", "node")
                .agg(F.sum("m").cast("long").alias("mass_e9")))
    return mass


def resource_allocation_links(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              neighbor_cap: int | None = None,
                              min_score_e9: int = 0) -> DataFrame:
    """Topological link prediction -> (node_a, node_b, shared, score_e9):
    the Resource-Allocation index Σ_{z ∈ N(a)∩N(b)} 1/deg(z) for
    non-adjacent pairs, with each common neighbor's weight as the exact
    integer 1e9 div deg(z) — no logs, no floats, every score a BIGINT
    both engines agree on (RA is the float-free sibling of Adamic-Adar
    and outperforms it on most benchmarks, Zhou et al. 2009).

    Shape mirrors node_jaccard: undirected distinct adjacency, the
    candidate pairs come from a co-neighbor self-join KEYED ON THE
    NEIGHBOR (never node×node), existing edges anti-joined out.
    ``neighbor_cap`` stop-lists celebrity hubs (documented undercount:
    a dropped hub contributes at most 1e9/cap per pair — the same
    bounded-skew trick as the n-gram stop list)."""
    und = (edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
           .unionAll(edges.select(F.col(dst).alias("node"),
                                  F.col(src).alias("nbr")))
           .filter(F.col("node") != F.col("nbr"))
           .dropDuplicates(["node", "nbr"]))
    deg = und.groupBy("nbr").agg(F.count(F.lit(1)).alias("_deg"))
    w = deg.select("nbr",
                   F.expr("1000000000 div _deg").cast("long").alias("w_e9"),
                   "_deg")
    if neighbor_cap is not None:
        w = w.filter(F.col("_deg") <= neighbor_cap)
    a = und.select(F.col("node").alias("node_a"), "nbr")
    b = und.select(F.col("node").alias("node_b"), "nbr")
    cand = (a.join(b, "nbr").filter(F.col("node_a") < F.col("node_b"))
            .join(w.select("nbr", "w_e9"), "nbr")
            .groupBy("node_a", "node_b")
            .agg(F.count(F.lit(1)).cast("long").alias("shared"),
                 F.sum("w_e9").cast("long").alias("score_e9")))
    adj = und.select(F.col("node").alias("node_a"),
                     F.col("nbr").alias("node_b"))
    out = cand.join(adj, ["node_a", "node_b"], "left_anti")
    if min_score_e9 > 0:
        out = out.filter(F.col("score_e9") >= min_score_e9)
    return out
