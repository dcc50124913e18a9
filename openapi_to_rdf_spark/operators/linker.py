"""Entity-link scoring: mention surfaces -> best-scoring registry entity.

This is the "entity-link scoring" stage the north star names alongside
mention detection (BASELINE.json north_star; SURVEY.md §7 "mention
detection + link scoring"): extraction finds surface mentions; this module
scores each distinct surface against a *registry* of known entities and
links it to the argmax candidate. Canonicalization (operators/canonicalize)
merges aliases discovered inside one corpus; linking attaches mentions to
an EXISTING authority table — the operation an incremental 100 TB pipeline
runs on every new batch once a canonical registry exists.

Semantics (exact, and ANSI-SQL-expressible — the driver oracle-checks
``kg_link_entities`` end-to-end against DuckDB):

    candidates = {(m, e) : J_n(m.surface, e.name) >= sim_threshold}
    score      = J_n + w_class * [m.class = e.class] + w_prior * e.prior
    link(m)    = argmax_e score,   ties broken by entity_id ascending

where J_n is char-n-gram Jaccard over alnum-normalized lowercase text
(functions.text.char_ngrams — the same basis the canonicalizer verifies
with, so linker sim and canonicalizer merges are mutually consistent).

Scale design (the part that must survive 10^9 mentions x 10^8 entities):

- Mentions are deduplicated to DISTINCT (surface, class) before any
  scoring — a viral surface mentioned 10^6 times is scored once and the
  result broadcast back along the narrow key. Linear, map-side.
- Candidate generation is the bipartite AllPairs/PPJoin prefix filter:
  one shared global shingle order (rarity-ascending document frequency
  over the UNION of surfaces and names) and each side indexes only its
  ``|S| - ceil(t|S|) + 1`` rarest shingles. Classic prefix-filter lemma:
  J >= t forces a collision within the two prefixes under any common
  total order — zero false negatives, candidate volume O(prefix postings)
  instead of O(|mentions| x |registry|). The hottest shingles sit at the
  end of every prefix, so posting lists stay short (skew handling, same
  trick as operators/dedup).
- Verification + scoring are pure JVM columns (array_intersect on the
  shingle arrays); the argmax is one window over the candidate set,
  partitioned by the surface key (high cardinality, no skew).
- No broadcast of the registry is required (it participates only in
  shingle-bucketed equi-joins), so the registry can be arbitrarily large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_ngrams

XSD = "http://www.w3.org/2001/XMLSchema#"


def _sided_prefix(base: DataFrame, threshold: float, df_tbl: DataFrame):
    """(side-tagged id, grams) -> prefix postings under the shared order."""
    ex = base.select("id", F.size("grams").alias("n_sh"),
                     F.explode("grams").alias("shingle"))
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    return (ex.join(df_tbl, "shingle")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= F.col("n_sh")
                    - F.ceil(F.lit(threshold) * F.col("n_sh") - 1e-9) + 1)
            .select("id", "n_sh", "shingle"))


def _bipartite_jaccard_pairs(left: DataFrame, right: DataFrame,
                             threshold: float) -> DataFrame:
    """EXACT cross-set Jaccard pairs >= threshold between left(id, grams)
    and right(id, grams) — the bipartite form of operators.dedup's
    AllPairs/PPJoin self-join, same lemma, same rarity order (computed over
    the union so both sides share one total order)."""
    l_base = left.filter(F.size("grams") > 0)
    r_base = right.filter(F.size("grams") > 0)
    all_ex = (l_base.select(F.explode("grams").alias("shingle"))
              .unionAll(r_base.select(F.explode("grams").alias("shingle"))))
    df_tbl = all_ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))

    lp = _sided_prefix(l_base, threshold, df_tbl)
    rp = _sided_prefix(r_base, threshold, df_tbl)

    # length filter: J >= t requires t*|L| <= |R| and t*|R| <= |L|
    cand = (lp.alias("a").join(rp.alias("b"), "shingle")
            .filter((F.col("a.n_sh") * F.lit(threshold) <= F.col("b.n_sh"))
                    & (F.col("b.n_sh") * F.lit(threshold) <= F.col("a.n_sh")))
            .select(F.col("a.id").alias("id_l"), F.col("b.id").alias("id_r"))
            .dropDuplicates(["id_l", "id_r"]))

    return (cand
            .join(l_base.select(F.col("id").alias("id_l"),
                                F.col("grams").alias("grams_l")), "id_l")
            .join(r_base.select(F.col("id").alias("id_r"),
                                F.col("grams").alias("grams_r")), "id_r")
            .withColumn("common", F.size(F.array_intersect("grams_l", "grams_r")))
            .withColumn("sim", F.round(
                F.col("common") /
                (F.size("grams_l") + F.size("grams_r") - F.col("common")), 6))
            .filter(F.col("sim") >= threshold)
            .select("id_l", "id_r", "sim"))


def link_surfaces(surfaces: DataFrame, registry: DataFrame,
                  sim_threshold: float = 0.5, ngram: int = 3,
                  w_class: float = 0.1, w_prior: float = 0.05) -> DataFrame:
    """Link DISTINCT (surface, m_class) rows to registry entities.

    surfaces: (surface: string, m_class: string|null)      [distinct rows]
    registry: (entity_id, name, class_name: string|null, prior: double|null)

    Returns one row per input surface row that has >= 1 candidate:
    (surface, m_class, entity_id, sim, score) with score rounded to 6dp
    and the argmax chosen deterministically (score desc, entity_id asc).
    """
    s = (surfaces
         .withColumn("_sid", F.concat_ws("\x01",  # separator outside any surface charset
                                         F.col("surface"),
                                         F.coalesce("m_class", F.lit(""))))
         .select(F.col("_sid").alias("id"), "surface", "m_class",
                 char_ngrams(F.col("surface"), ngram).alias("grams")))
    r = registry.select(F.col("entity_id"), F.col("name"),
                        F.col("class_name"),
                        F.coalesce(F.col("prior"), F.lit(0.0)).alias("prior"),
                        char_ngrams(F.col("name"), ngram).alias("grams"))

    pairs = _bipartite_jaccard_pairs(
        s.select("id", "grams"),
        r.select(F.col("entity_id").alias("id"), "grams"),
        sim_threshold)

    scored = (pairs
              .join(s.select(F.col("id").alias("id_l"), "surface", "m_class"),
                    "id_l")
              .join(r.select(F.col("entity_id").alias("id_r"),
                             "class_name", "prior"), "id_r")
              .withColumn("entity_id", F.col("id_r"))
              .withColumn("score", F.round(
                  F.col("sim")
                  + F.lit(w_class) * F.when(
                      F.col("m_class").isNotNull()
                      & (F.col("m_class") == F.col("class_name")), 1.0).otherwise(0.0)
                  + F.lit(w_prior) * F.col("prior"), 6)))

    w = Window.partitionBy("id_l").orderBy(
        F.col("score").desc(), F.col("entity_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("surface", "m_class", "entity_id", "sim", "score"))


def link_entities(mentions: DataFrame, registry: DataFrame,
                  surface_col: str = "m_key", class_col: str | None = "m_class",
                  sim_threshold: float = 0.5, ngram: int = 3,
                  w_class: float = 0.1, w_prior: float = 0.05) -> DataFrame:
    """Link a (possibly huge, duplicate-heavy) mention table.

    Dedups to distinct (surface, class) first — the narrow-key trick the
    extractor uses — scores once per distinct pair, then joins the verdicts
    back so every input mention row gets its link. Returns the input
    columns plus (entity_id, sim, score); unlinkable mentions (no candidate
    >= sim_threshold) carry nulls (NIL link), so coverage is measurable.
    """
    cls = F.col(class_col) if class_col else F.lit(None).cast("string")
    # null class is normalized to "" for the join keys (plain equi-join
    # drops null keys) and back to null for scoring
    keyed = mentions.withColumn("_surface", F.col(surface_col)) \
                    .withColumn("_mclass", F.coalesce(cls, F.lit("")))
    distinct = (keyed.select(F.col("_surface").alias("surface"),
                             F.nullif("_mclass", F.lit("")).alias("m_class"))
                .dropDuplicates(["surface", "m_class"]))
    links = link_surfaces(distinct, registry, sim_threshold, ngram,
                          w_class, w_prior)
    back = (links.withColumnRenamed("surface", "_surface")
            .withColumn("_mclass", F.coalesce("m_class", F.lit("")))
            .select("_surface", "_mclass", "entity_id", "sim", "score"))
    return (keyed.join(back, ["_surface", "_mclass"], "left")
            .drop("_surface", "_mclass"))


def link_triples(links: DataFrame, kg_ns: str, ent_ns: str,
                 registry_ns: str) -> DataFrame:
    """Linked surfaces -> kg:linksTo / kg:linkScore triples in the engine's
    triple-table layout. Subject = the surface-form entity IRI extraction
    mints; object = the registry IRI — the edge that attaches corpus
    mentions to the authority graph."""
    linked = links.filter(F.col("entity_id").isNotNull())
    subj = F.concat(F.lit(ent_ns), F.col("surface"))
    obj = F.concat(F.lit(registry_ns), F.col("entity_id").cast("string"))
    link_edge = linked.select(
        F.lit("linker").alias("file"), F.lit("kg").alias("graph"),
        subj.alias("s"), F.lit(kg_ns + "linksTo").alias("p"),
        F.lit("iri").alias("o_kind"), obj.alias("o"),
        F.lit(None).cast("string").alias("o_datatype"))
    score_edge = linked.select(
        F.lit("linker").alias("file"), F.lit("kg").alias("graph"),
        subj.alias("s"), F.lit(kg_ns + "linkScore").alias("p"),
        F.lit("literal").alias("o_kind"),
        F.format_number(F.col("score"), 6).alias("o"),
        F.lit(XSD + "decimal").alias("o_datatype"))
    return link_edge.unionByName(score_edge).dropDuplicates(["s", "p", "o"])


def registry_with_rank_priors(registry: DataFrame,
                              ranks: DataFrame) -> DataFrame:
    """Replace a registry's priors with normalized graph importance —
    PageRank over the KG (operators.graphrank) as the link prior, the
    standard popularity signal entity linkers use. Ranks (node, rank) join
    on entity_id; prior = rank / max(rank) in [0, 1], 0 for entities
    absent from the graph. One broadcast-size agg (the max) + one
    equi-join on the registry key."""
    max_rank = ranks.agg(F.max("rank").alias("m"))
    scaled = (ranks.crossJoin(F.broadcast(max_rank))
              .select(F.col("node").alias("entity_id"),
                      F.round(F.col("rank") / F.col("m"), 6).alias("_prior")))
    return (registry.drop("prior")
            .join(scaled, "entity_id", "left")
            .withColumn("prior", F.coalesce("_prior", F.lit(0.0)))
            .drop("_prior"))


def registry_from_canonical_map(canon_map: DataFrame,
                                prior_col: str | None = None) -> DataFrame:
    """Build a linker registry from a canonicalization run's output map
    ((entity, canonical) surface strings): one registry row per canonical
    representative, prior = its alias-cluster size (bigger clusters are
    likelier link targets). This closes the canonicalize -> link loop: a
    first batch's canonical map becomes the authority the next batch's
    mentions link against."""
    return (canon_map.groupBy(F.col("canonical").alias("name"))
            .agg(F.count(F.lit(1)).alias("n_aliases"))
            .select(F.col("name").alias("entity_id"), F.col("name"),
                    F.lit(None).cast("string").alias("class_name"),
                    (F.col("n_aliases") / F.lit(100.0)).alias("prior")))
