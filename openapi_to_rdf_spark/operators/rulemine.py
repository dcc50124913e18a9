"""AMIE-style horn-rule mining over the triple table — the classic KG
completion primitive (Galarraga et al., WWW 2013) reduced to its
deterministic, join-expressible core.

Two rule shapes are mined, both "closed" in AMIE's sense (every
variable appears twice):

  path rule         p1(x,z) ∧ p2(z,y)  ⇒  head(x,y)
  implication rule  p(x,y)             ⇒  head(x,y)

Per rule we report three INTEGER counts (support, body_count,
pca_count) instead of float confidences, and thresholds are applied by
cross-multiplication — so a DuckDB oracle reproduces every row
bit-for-bit and downstream callers can derive std confidence
(support/body_count) or AMIE's PCA confidence (support/pca_count) at
whatever precision they need:

  support     #distinct (x,y) satisfying body AND head
  body_count  #distinct (x,y) satisfying body
  pca_count   #distinct (x,y) satisfying body where x has SOME head
              edge (the partial-completeness denominator — under PCA
              a missing head edge for a subject that HAS head edges
              counts against the rule; for a subject with none it is
              assumed unknown, not false)

Scale: everything is equi-joins and map-side-combinable counts on the
keys the graph is already organized around. The one superlinear spot —
shared by every AMIE implementation — is the z-keyed body join, whose
per-node cost is in_degree(z) × out_degree(z); `hub_cap` bounds it with
the same stop-list trick `ngram_jaccard_pairs` uses (nodes whose degree
product exceeds the cap are excluded from rule COUNTING, loudly — a
documented support undercount, never a wrong join). Rule tables are
vocabulary³-bounded, so `rule_predictions` broadcasts them.

No counterpart in the reference (file:line n/a — the reference converts
schemas and never mines instance data); this is part of the mandated
KG-completion surface alongside operators/completion.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_triples(triples: DataFrame) -> DataFrame:
    return triples.select("s", "p", "o").dropDuplicates()


def _apply_thresholds(rules: DataFrame, min_support: int,
                      min_conf: tuple[int, int] | None) -> DataFrame:
    out = rules.filter(F.col("support") >= min_support)
    if min_conf is not None:
        num, den = min_conf
        # support/body_count >= num/den, integer-exact
        out = out.filter(F.col("support") * F.lit(int(den))
                         >= F.lit(int(num)) * F.col("body_count"))
    return out


def hub_stoplist(triples: DataFrame, hub_cap: int, *,
                 distinct: bool = True) -> DataFrame:
    """Nodes whose in_degree × out_degree exceeds `hub_cap` — the join
    nodes that would dominate the path-rule body join. Returned as a
    one-column (z) DataFrame for a broadcast anti-join. Pass
    ``distinct=False`` when ``triples`` is already a distinct set."""
    t = _distinct_triples(triples) if distinct else triples
    outd = t.groupBy(F.col("s").alias("z")).agg(
        F.count(F.lit(1)).alias("_out"))
    ind = t.groupBy(F.col("o").alias("z")).agg(
        F.count(F.lit(1)).alias("_in"))
    return (outd.join(ind, "z")
            .filter(F.col("_out") * F.col("_in") > hub_cap)
            .select("z"))


def _path_body(t: DataFrame, hub_cap: int | None) -> DataFrame:
    """Distinct (p1, p2, x, y) pairs connected by some z, over an
    already-distinct triple set ``t``. The join is keyed on z — the
    graph's natural key; hub_cap prunes pathological z's BEFORE the
    join so the worst bucket is bounded."""
    hop1 = t.select(F.col("s").alias("x"), F.col("p").alias("p1"),
                    F.col("o").alias("z"))
    hop2 = t.select(F.col("s").alias("z"), F.col("p").alias("p2"),
                    F.col("o").alias("y"))
    if hub_cap is not None:
        stop = hub_stoplist(t, hub_cap, distinct=False)
        hop1 = hop1.join(F.broadcast(stop), "z", "left_anti")
        hop2 = hop2.join(F.broadcast(stop), "z", "left_anti")
    return (hop1.join(hop2, "z")
            .select("p1", "p2", "x", "y").dropDuplicates())


def mine_path_rules(triples: DataFrame, min_support: int = 2,
                    min_conf: tuple[int, int] | None = None,
                    hub_cap: int | None = None) -> DataFrame:
    """Mine p1(x,z) ∧ p2(z,y) ⇒ head(x,y) rules.

    Returns (p1, p2, head_p, support, body_count, pca_count), one row
    per rule that clears `min_support` and (optionally) the integer
    std-confidence threshold `min_conf = (num, den)` meaning
    support/body_count >= num/den. Rules whose head predicate appears
    in the body are kept (transitivity p∧p⇒p is a real rule); the
    degenerate head==body single-atom identity cannot arise here
    because the body has two atoms.

    Scale: body materializes once and feeds all three counts — support
    via an (x,y)-keyed join against the head slice, pca via an x-keyed
    join against the per-predicate subject set, body_count via one
    rollup. All joins key on instance columns (AQE skew territory);
    outputs are predicate-vocabulary³ bounded.
    """
    # t feeds the body (twice), the head slice and the subject sets;
    # body feeds three aggregations. Materialize each ONCE (the house
    # localCheckpoint pattern) — otherwise Catalyst re-plans the
    # distinct shuffle and the z-join per consumer.
    t = _distinct_triples(triples).localCheckpoint()
    body = _path_body(t, hub_cap).localCheckpoint()
    body_cnt = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_count"))
    head = t.select(F.col("p").alias("head_p"), F.col("s").alias("x"),
                    F.col("o").alias("y"))
    supp = (body.join(head, ["x", "y"])
            .groupBy("p1", "p2", "head_p")
            .agg(F.count(F.lit(1)).alias("support")))
    head_subj = (t.select(F.col("p").alias("head_p"),
                          F.col("s").alias("x")).dropDuplicates())
    pca = (body.join(head_subj, "x")
           .groupBy("p1", "p2", "head_p")
           .agg(F.count(F.lit(1)).alias("pca_count")))
    rules = (supp
             .join(body_cnt, ["p1", "p2"])
             .join(pca, ["p1", "p2", "head_p"])
             .select("p1", "p2", "head_p", "support", "body_count",
                     "pca_count"))
    return _apply_thresholds(rules, min_support, min_conf)


def mine_implication_rules(triples: DataFrame, min_support: int = 2,
                           min_conf: tuple[int, int] | None = None
                           ) -> DataFrame:
    """Mine p(x,y) ⇒ head(x,y) rules (predicate implication / synonymy
    candidates). Returns (p1, head_p, support, body_count, pca_count);
    p1 == head_p is excluded (trivially confidence 1).

    Scale: ONE (s,o)-keyed self-join of the distinct triple set plus
    per-predicate rollups — the same exchange the graph's (s,o)
    operations already pay.
    """
    t = _distinct_triples(triples).localCheckpoint()
    body_cnt = t.groupBy(F.col("p").alias("p1")).agg(
        F.count(F.lit(1)).alias("body_count"))
    supp = (t.select(F.col("p").alias("p1"), "s", "o")
            .join(t.select(F.col("p").alias("head_p"), "s", "o"),
                  ["s", "o"])
            .filter(F.col("p1") != F.col("head_p"))
            .groupBy("p1", "head_p")
            .agg(F.count(F.lit(1)).alias("support")))
    head_subj = (t.select(F.col("p").alias("head_p"),
                          F.col("s").alias("s")).dropDuplicates())
    pca = (t.select(F.col("p").alias("p1"), "s", "o")
           .join(head_subj, "s")
           .filter(F.col("p1") != F.col("head_p"))
           .groupBy("p1", "head_p")
           .agg(F.count(F.lit(1)).alias("pca_count")))
    rules = (supp
             .join(body_cnt, "p1")
             .join(pca, ["p1", "head_p"])
             .select("p1", "head_p", "support", "body_count",
                     "pca_count"))
    return _apply_thresholds(rules, min_support, min_conf)


def rule_predictions(triples: DataFrame, rules: DataFrame,
                     hub_cap: int | None = None) -> DataFrame:
    """Apply mined path rules to predict NEW head triples — the
    completion step: every (x,y) the body connects whose head edge is
    absent from the graph becomes a candidate (s, p, o) with its rule's
    counts attached for downstream ranking.

    Returns (s, p, o, p1, p2, support, body_count, pca_count) — one row
    per (rule, pair); the same pair predicted by two rules appears
    twice, deliberately (rank-fusion wants every vote; distinct on
    (s,p,o) is one dropDuplicates away).

    Scale: `rules` is vocabulary³-bounded — materialized ONCE
    (localCheckpoint: it is usually the output of a full mining run,
    which must not be re-planned for each of its three uses here) and
    broadcast onto the body join, which prunes to exactly the rule
    predicates' hops BEFORE the z-join; the absence check is an
    (s,p,o)-keyed anti-join.
    """
    rules_m = rules.select("p1", "p2", "head_p", "support",
                           "body_count", "pca_count").localCheckpoint()
    t = _distinct_triples(triples).localCheckpoint()
    hop1 = (t.select(F.col("s").alias("x"), F.col("p").alias("p1"),
                     F.col("o").alias("z"))
            .join(F.broadcast(rules_m.select("p1").dropDuplicates()),
                  "p1", "left_semi"))
    hop2 = (t.select(F.col("s").alias("z"), F.col("p").alias("p2"),
                     F.col("o").alias("y"))
            .join(F.broadcast(rules_m.select("p2").dropDuplicates()),
                  "p2", "left_semi"))
    if hub_cap is not None:
        stop = hub_stoplist(t, hub_cap, distinct=False)
        hop1 = hop1.join(F.broadcast(stop), "z", "left_anti")
        hop2 = hop2.join(F.broadcast(stop), "z", "left_anti")
    body = (hop1.join(hop2, "z")
            .select("p1", "p2", "x", "y").dropDuplicates()
            .join(F.broadcast(rules_m), ["p1", "p2"]))
    return (body
            .join(t,
                  [body.x == t.s, F.col("head_p") == t.p, body.y == t.o],
                  "left_anti")
            .select(F.col("x").alias("s"), F.col("head_p").alias("p"),
                    F.col("y").alias("o"), "p1", "p2", "support",
                    "body_count", "pca_count"))
