"""Negative sampling for KG-embedding training data (TransE/DistMult-style):
for each positive (s, p, o) emit k corruptions per side, replacing the
subject or object with a pseudo-randomly picked entity, with false
negatives (corruptions that are themselves true triples) filtered out.

Engine-portable determinism: the "random" pick is
uint32(md5(s,p,o,side,j)) % n_entities — the same content-hash discipline
as operators.sampling (no RNG state, identical in any engine with md5), so
the driver's DuckDB oracle reproduces every sample exactly.

Scale shape: the entity universe is vocabulary-sized next to the triple
corpus, so the index join is a broadcast; candidates = 2k codegen rows per
positive (explode of a literal sequence); the only corpus-scale shuffle is
the final anti-join against the positives on (s, p, o) — unavoidable, it IS
the false-negative guarantee, and it's an equi-join AQE handles. The global
row_number over entities is a one-vocabulary sort; for a registry too big
to sort in one window, pre-index it once and pass ``entities`` in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _uint32_md5(*cols) -> F.Column:
    return F.conv(F.substring(F.md5(F.concat_ws("\x01", *cols)), 1, 8),
                  16, 10).cast("long")


def entity_index(triples: DataFrame) -> DataFrame:
    """(idx, ent): 1-based dense index over the distinct entity universe
    (subjects + IRI objects), deterministic via a lexicographic sort.

    Bare (s, p, o) tables without an ``o_kind`` column are accepted —
    every object is treated as an IRI then (ADVICE r2: the default
    entity universe of kgembed.corruption_pairs / link_prediction_ranks
    must not require the typed-triple schema its positives tolerate
    missing)."""
    objs = (triples.filter(F.col("o_kind") == "iri")
            if "o_kind" in triples.columns else triples)
    ents = (triples.select(F.col("s").alias("ent"))
            .unionByName(objs.select(F.col("o").alias("ent")))
            .dropDuplicates())
    return ents.select(
        F.row_number().over(Window.orderBy("ent")).alias("idx"), "ent")


def corrupt_triples(triples: DataFrame, k: int = 2,
                    entities: DataFrame | None = None) -> DataFrame:
    """k corruptions per side per positive -> (s, p, o, side, j), false
    negatives and identity corruptions removed.

    ``triples`` carries (s, p, o) and optionally ``o_kind``; with it, only
    iri-object rows are corrupted on the o side (literals are attributes,
    not graph edges) — without it every object counts as an IRI, matching
    entity_index. ``entities`` overrides the derived index table (columns
    idx, ent, 1-based).
    """
    pos = (triples.filter(F.col("o_kind") == "iri")
           if "o_kind" in triples.columns else triples) \
        .select("s", "p", "o").dropDuplicates()
    idx = entities if entities is not None else entity_index(triples)
    n = F.broadcast(idx.agg(F.count(F.lit(1)).alias("n_ents")))

    cand = (pos.crossJoin(n)
            .select("s", "p", "o", "n_ents",
                    F.explode(F.array(*[
                        F.struct(F.lit(side).alias("side"),
                                 F.lit(j).alias("j"))
                        for side in ("s", "o") for j in range(k)
                    ])).alias("c"))
            .select("s", "p", "o", "n_ents", "c.side", "c.j"))
    pick = (_uint32_md5(F.col("s"), F.col("p"), F.col("o"),
                        F.col("side"), F.col("j").cast("string"))
            % F.col("n_ents") + 1).alias("idx")
    cand = cand.select("s", "p", "o", "side", "j", pick)

    corrupted = (cand.join(F.broadcast(idx), "idx")
                 .select(
                     F.when(F.col("side") == "s", F.col("ent"))
                     .otherwise(F.col("s")).alias("s"),
                     "p",
                     F.when(F.col("side") == "o", F.col("ent"))
                     .otherwise(F.col("o")).alias("o"),
                     "side", "j",
                     # identity corruption: the pick landed on the original
                     (F.when(F.col("side") == "s", F.col("s"))
                      .otherwise(F.col("o")) == F.col("ent")).alias("_same"))
                 .filter(~F.col("_same")).drop("_same"))

    # false-negative filter: a corruption that exists as a true triple is
    # not a negative — anti-join on the full (s, p, o) identity
    return corrupted.join(pos, ["s", "p", "o"], "left_anti")
