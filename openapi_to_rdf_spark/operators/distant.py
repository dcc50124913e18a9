"""Distant-supervision relation labeling (Mintz et al. 2009, ACL):
given a knowledge base of (s, p, o) facts and per-container entity
mentions, every container that mentions BOTH endpoints of a KB fact
becomes a (weakly) labeled training instance for relation p; co-mention
pairs with NO KB edge are the negative-candidate pool the relation
classifier trains against.

This is the loop-closing step of a KG-construction pipeline: the graph the
pipeline materialized (extract → canonicalize → materialize) turns back
into labeled training data for better extractors — exactly what a
transcript-scale triple factory feeds an entity/relation model with.

Scale design: the co-mention pair generation is the same container-keyed
self-join as graphq.co_mention_edges — quadratic ONLY in mentions per
container (turns hold a handful of mentions; cap upstream if a container
is pathological), never in corpus size. The KB join keys on the (s, o)
pair — broadcast when the KB is dimension-sized, shuffle equi-join with
AQE skew-split otherwise; the negative pool is the same join as an
anti-join, so positives and negatives cost one pass each.

Reference counterpart: none (the reference consumes hand-written schemas;
it never learns from its own output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_mention_pairs(mentions: DataFrame, container_col: str = "doc",
                     ent_col: str = "term") -> DataFrame:
    """ORDERED distinct entity pairs co-mentioned in one container
    (relations are directed, so (a,b) and (b,a) are distinct candidates;
    self-pairs are not). One container-keyed self-equi-join."""
    m = mentions.select(F.col(container_col).alias("_c"),
                        F.col(ent_col).alias("_e")).distinct()
    return (m.alias("a").join(m.alias("b"), "_c")
            .filter(F.col("a._e") != F.col("b._e"))
            .select(F.col("_c").alias("container"),
                    F.col("a._e").alias("ent_s"),
                    F.col("b._e").alias("ent_o")))


def distant_labels(mentions: DataFrame, kb: DataFrame,
                   container_col: str = "doc",
                   ent_col: str = "term") -> DataFrame:
    """Positive instances: (container, s, p, o) for every KB fact whose
    endpoints co-occur in the container. One (s,o)-keyed equi-join; a KB
    fact mentioned in many containers fans out — that multiplicity IS the
    distant-supervision signal (more evidence sentences per fact)."""
    pairs = co_mention_pairs(mentions, container_col, ent_col)
    return (pairs.join(kb, (pairs["ent_s"] == kb["s"])
                       & (pairs["ent_o"] == kb["o"]))
            .select("container", "s", "p", "o"))


def distant_label_pool(mentions: DataFrame, kb: DataFrame,
                       container_col: str = "doc", ent_col: str = "term",
                       negative_label: str = "__no_relation__") -> DataFrame:
    """Positives AND closed-world negatives in ONE co-mention pass
    (r5: calling distant_labels + negative_candidates separately rebuilt
    the mention scan and the container self-join twice — the two outputs
    share one pair table, so labeling them is two cheap KB lookups, not
    two pipelines).

    Per ordered co-mention pair: a directed KB hit emits one positive per
    matching relation (the fan-out IS the distant-supervision signal); a
    pair with no KB edge in EITHER direction emits one negative labeled
    ``negative_label``; reverse-only-linked pairs emit nothing (they are
    neither evidence for the relation nor presumed-unrelated — the same
    closed-world rule negative_candidates applies). Equivalent to
    ``distant_labels UNION negative_candidates`` by construction; the
    equivalence is asserted in tests. Both KB lookups broadcast when the
    KB is dimension-sized (the common case — it is the pipeline's own
    alias-resolved fact table, not the corpus)."""
    pairs = co_mention_pairs(mentions, container_col, ent_col)
    # explicit membership flag (not p IS NULL) so a degenerate NULL-p KB
    # fact still counts as linked, exactly like the anti-join it replaces
    fwd = kb.select(F.col("s").alias("ent_s"), F.col("o").alias("ent_o"),
                    "p", F.lit(True).alias("_fwd"))
    rev = (kb.select(F.col("o").alias("ent_s"), F.col("s").alias("ent_o"))
           .distinct().withColumn("_rev", F.lit(True)))
    return (pairs.join(fwd, ["ent_s", "ent_o"], "left")
            .join(rev, ["ent_s", "ent_o"], "left")
            .filter(F.col("_fwd").isNotNull()
                    | (F.col("_fwd").isNull() & F.col("_rev").isNull()))
            .select("container",
                    F.col("ent_s").alias("s"),
                    F.when(F.col("_fwd").isNotNull(), F.col("p"))
                    .otherwise(F.lit(negative_label)).alias("p"),
                    F.col("ent_o").alias("o")))


def negative_candidates(mentions: DataFrame, kb: DataFrame,
                        container_col: str = "doc",
                        ent_col: str = "term") -> DataFrame:
    """Negative pool: co-mention pairs with NO KB edge in either direction
    (the classic closed-world heuristic — unlinked co-mentions are
    presumed unrelated). Two-sided membership is checked with one anti-join
    against the symmetrized KB pair set."""
    pairs = co_mention_pairs(mentions, container_col, ent_col)
    kb_pairs = (kb.select(F.col("s").alias("ent_s"), F.col("o").alias("ent_o"))
                .unionAll(kb.select(F.col("o").alias("ent_s"),
                                    F.col("s").alias("ent_o")))
                .distinct())
    return pairs.join(kb_pairs, ["ent_s", "ent_o"], "left_anti")
