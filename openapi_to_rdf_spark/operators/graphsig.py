"""Bnode-relabeling-invariant graph signatures at corpus scale.

triplecore/canon.py canonicalizes blank nodes per FILE with
Weisfeiler-Leman color refinement (vocabulary-sized graphs, driver-side).
This module is the same idea as a DISTRIBUTED fingerprint: a digest of
the whole KG that is stable under blank-node RELABELING (the identity of
`_:`-prefixed nodes carries no information, their structure does) and
sensitive to any triple change — the content-address you want for
snapshot dedup, cross-engine graph comparison, and change detection on
10^12-triple stores where byte-level comparison is meaningless under
nondeterministic bnode naming.

Design for scale — why this is NOT collect-sorted-multisets WL:

- classic WL aggregates each node's neighbor colors as a SORTED LIST;
  a hub node's list is degree-sized (10^8 elements on a popular entity)
  and kills the aggregation. Here every edge contributes a 60-bit hash
  and the refinement uses the SUM mod P (P = 2^61 - 1) — a COMMUTATIVE
  aggregate with O(1) state, map-side partial aggregation, no skew
  arrays. (Order-insensitive hashing trades a sliver of adversarial
  distinguishing power for unbounded scalability — the standard
  dataset-fingerprint construction.)
- colors live on the node table; each round is two edge-color joins
  (out + in) + one groupBy — the same shuffle keys every round.
- IRIs and literals are their OWN initial color (hash of the label):
  named nodes need no refinement rounds to be distinguished, so
  ``rounds`` only has to cover the DIAMETER OF BLANK-NODE REGIONS
  (RDF bnode islands are shallow — 2-3 rounds covers real data,
  mirroring canon.py's per-file iteration bound).

All hashing is md5-based and engine-portable (the first 15 hex digits as
a 60-bit integer), so an ANSI-SQL oracle can re-derive digests exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# largest Mersenne prime below 2^63: sums of 60-bit edge hashes stay
# exact in decimal(38,0) and reduce identically in any engine
P = 2305843009213693951


def _h(col) -> F.Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def wl_colors(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """(node, color): WL refinement colors after ``rounds`` iterations.

    color_0 = hash(label) for named nodes/literals, 0 for blank nodes
    (label carries no identity). color_{r+1}(v) = hash(color_r(v) | sum
    over incident edges of hash(direction | predicate | neighbor color)
    mod P). Two bnodes get the same color iff WL cannot distinguish
    their neighborhoods — exactly canon.py's equivalence, corpus-wide.
    """
    spo = triples.select("s", "p", "o")
    nodes = (spo.select(F.col("s").alias("node"))
             .unionAll(spo.select(F.col("o").alias("node")))
             .distinct())
    init = (F.when(F.col("node").startswith("_:"), F.lit(0).cast("long"))
            .otherwise(_h(F.col("node"))))
    colors = nodes.select("node", init.alias("color"))
    for _ in range(rounds):
        co = colors.select(F.col("node").alias("o"),
                           F.col("color").alias("nc"))
        cs = colors.select(F.col("node").alias("s"),
                           F.col("color").alias("nc"))
        edge = F.concat(F.lit("|"), F.col("p"), F.lit("|"),
                        F.col("nc").cast("string"))
        e_out = (spo.join(co, "o")
                 .select(F.col("s").alias("node"),
                         _h(F.concat(F.lit("out"), edge)).alias("eh")))
        e_in = (spo.join(cs, "s")
                .select(F.col("o").alias("node"),
                        _h(F.concat(F.lit("in"), edge)).alias("eh")))
        contrib = (e_out.unionAll(e_in).groupBy("node")
                   .agg((F.sum(F.col("eh").cast("decimal(38,0)"))
                         % F.lit(P)).alias("m")))
        colors = (colors.join(contrib, "node", "left")
                  .select("node", _h(F.concat(
                      F.col("color").cast("string"), F.lit("|"),
                      F.coalesce(F.col("m").cast("decimal(38,0)"),
                                 F.lit(0).cast("decimal(38,0)"))
                      .cast("string"))).alias("color")))
    return colors


def graph_digest(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """One row (digest, n_nodes, n_triples): the corpus-scale graph
    fingerprint — sum of final WL colors mod P plus size invariants.
    Equal for bnode-relabeled copies of the same graph; any asserted
    triple change moves it."""
    colors = wl_colors(triples, rounds)
    sig = colors.agg(
        (F.sum(F.col("color").cast("decimal(38,0)")) % F.lit(P))
        .cast("decimal(38,0)").alias("digest"),
        F.count(F.lit(1)).alias("n_nodes"))
    n_t = triples.select("s", "p", "o").agg(
        F.count(F.lit(1)).alias("n_triples"))
    return sig.crossJoin(n_t)
