"""KG consumption/completion operators: entity summarization and
type propagation — what a downstream consumer runs over the materialized
graph to present entities and to fill typing gaps.

Both are deterministic and exactly replayable in ANSI SQL, so both carry
full driver oracles (no rows-only escape hatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def entity_summaries(triples: DataFrame, k: int = 5) -> DataFrame:
    """Top-k facts per subject, rarest-predicate-first — the RELIN-style
    informativeness heuristic reduced to its deterministic core: a
    predicate that appears on few triples says more about an entity than
    one that appears everywhere (rdf:type, rdfs:label), so rank each
    subject's facts by ascending global predicate frequency, tiebreak by
    (p, o) for stable output. Returns (s, p, o, rank).

    Scale: the predicate histogram is vocabulary-sized → broadcast; the
    per-subject top-k is ONE window over the subject key (the partition
    key the graph is already organized around), no second pass. A
    pathological subject with 10^8 facts is bounded by the window's
    per-partition spill, and rank<=k prunes the output immediately.
    """
    pfreq = triples.groupBy("p").agg(F.count(F.lit(1)).alias("p_n"))
    w = Window.partitionBy("s").orderBy("p_n", "p", "o")
    return (triples.select("s", "p", "o")
            .join(F.broadcast(pfreq), "p")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("s", "p", "o", "rank"))


def type_propagation(triples: DataFrame, rounds: int = 1,
                     type_pred: str = RDF_TYPE,
                     min_votes: int = 1) -> DataFrame:
    """Majority-vote type inference for UNTYPED nodes from their typed
    neighbors (undirected adjacency over non-type edges) — the
    label-propagation baseline of KG completion (cf. the communities
    operator, which propagates arbitrary labels; this one is class-aware
    and one-directional: existing rdf:type assertions are never changed).

    Per round: each untyped node collects its neighbors' types, keeps the
    majority class (ties broken by the lexicographically smallest class —
    deterministic), and becomes typed for subsequent rounds. Returns
    (node, inferred_class, votes, round).

    Scale: adjacency is the edge list both ways (one union, no
    materialized n^2); each round is one join against the CURRENT type
    table + one (node, class) count + one argmax window — all on the
    node key. Rounds are few (label information decays fast); each round
    only processes still-untyped nodes, so the frontier shrinks.
    """
    edges = (triples.filter(F.col("p") != type_pred)
             .select(F.col("s").alias("a"), F.col("o").alias("b")))
    adj = (edges.unionAll(edges.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
           .dropDuplicates())
    typed = (triples.filter(F.col("p") == type_pred)
             .select(F.col("s").alias("node"), F.col("o").alias("cls"))
             .dropDuplicates().localCheckpoint())
    out = None
    for rnd in range(1, rounds + 1):
        votes = (adj
                 .join(typed.withColumnRenamed("node", "b"), "b")
                 .join(typed.select(F.col("node").alias("a")), "a",
                       "left_anti")
                 .groupBy(F.col("a").alias("node"), "cls")
                 .agg(F.count(F.lit(1)).alias("votes"))
                 .filter(F.col("votes") >= min_votes))
        w = Window.partitionBy("node").orderBy(F.desc("votes"), "cls")
        picked = (votes.withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("_rk") == 1)
                  .select("node", F.col("cls").alias("inferred_class"),
                          "votes", F.lit(rnd).alias("round"))
                  .localCheckpoint())
        out = picked if out is None else out.unionByName(picked)
        typed = typed.unionByName(
            picked.select("node", F.col("inferred_class").alias("cls")))
    return out
