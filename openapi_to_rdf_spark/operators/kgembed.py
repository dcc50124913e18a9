"""KG-embedding link prediction (TransE, Bordes et al. 2013) as pure
DataFrame algebra — the consumer of operators/negatives' corruption
sampler: deterministic hash-initialized embeddings, L1 plausibility
scoring, one full-batch margin-SGD epoch, and the standard filtered
link-prediction evaluation (rank / MRR / Hits@k).

Reference scope note: the reference CLI (openapi_to_rdf/main.py) has no
embedding machinery at all — this is part of the mandated
training-data-pipeline surface (KG completion / link prediction over the
triples the extraction stages emit), sitting next to rule-based
completion (operators/rulemine.py) as its geometric counterpart.

INTEGER-EXACT BY CONSTRUCTION. Floating-point TransE is not
reproducible across engines (summation order changes the low bits, and
ranks flip on near-ties). Here every embedding coordinate is a small
integer hashed from the entity/relation NAME (uint32(md5(name, j)) %
(2*span+1) - span), the L1 score is a sum of integer absolute
differences, the SGD step is sign-based (grad of L1 is a sign vector)
with an integer learning rate, and MRR is reported as a sum of
floor(1e6 / rank) terms — so scores, updated weights, ranks and metrics
are all BIGINT arithmetic that DuckDB reproduces bit-for-bit. The price
is granularity (integer lattice steps), which is irrelevant for the
*pipeline* semantics being tested and honest about what a distributed
engine can promise deterministically.

Scale shape (10^12-triple posture):
- Embedding tables are (name, vec) keyed by entity/relation id. The
  relation table is vocabulary-sized — always broadcast. The entity
  table at 10^9+ entities is NOT broadcastable; scoring then runs as
  ordinary equi-joins on s/o (the exact keys the canonicalizer already
  shuffles on, AQE skew territory). ``broadcast_entities`` flags the
  small-vocabulary case (tests, per-domain sub-KGs).
- The epoch touches the corpus O(1) times: pair construction is the
  negatives sampler (broadcast entity index), the update explodes to
  (name, dim) rows — dim is a constant — and aggregates per entity:
  one shuffle keyed by entity id, then one join to apply. Hot entities
  (every triple touches them) are exactly the skew the components
  salter documents; the per-(name, dim) rollup is already the salted
  shape (dim spreads a hot name over ``dim`` reducers).
- Filtered evaluation is |test| x |candidates|: at scale you sample
  both (the standard sampled-metrics protocol; Bordes'13 evaluates a
  held-out slice, never the corpus) — ``candidates`` accepts any
  entity subset; metrics are exact over whatever slice you pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.negatives import (
    _uint32_md5, entity_index,
)


def hash_embeddings(names: DataFrame, name_col: str = "ent",
                    dim: int = 16, span: int = 8) -> DataFrame:
    """(name, vec): deterministic integer embedding per distinct name —
    vec[j] = uint32(md5(name \\x01 j)) % (2*span+1) - span, each
    coordinate in [-span, span]. Pure codegen (transform over a literal
    sequence); identical in any engine with md5, so the DuckDB twin
    rebuilds the exact same vectors from the same names."""
    out = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: _uint32_md5(F.col("name"), j.cast("string"))
        % F.lit(2 * span + 1) - F.lit(span))
    return (names.select(F.col(name_col).alias("name")).dropDuplicates()
            .select("name", out.alias("vec")))


def relation_index(triples: DataFrame) -> DataFrame:
    """Distinct predicate names — the (tiny) relation vocabulary."""
    return triples.select(F.col("p").alias("name")).dropDuplicates()


def _l1(a, b, c) -> F.Column:
    """sum_j |a[j] + b[j] - c[j]| as a long — the TransE score (lower =
    more plausible). Higher-order functions only: stays in codegen."""
    diff = F.zip_with(F.zip_with(a, b, lambda x, y: x + y), c,
                      lambda x, y: x - y)
    return F.aggregate(diff, F.lit(0).cast("long"),
                       lambda acc, v: acc + F.abs(v))


def _with_vecs(df: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame,
               cols: dict[str, str], broadcast_entities: bool) -> DataFrame:
    """Join embedding vectors onto ``df``: cols maps df column -> output
    vector column; relation joins always broadcast, entity joins
    broadcast only when flagged (vocabulary-sized registry)."""
    for src, dst in cols.items():
        emb = rel_emb if src == "p" else ent_emb
        side = emb.select(F.col("name").alias(src), F.col("vec").alias(dst))
        if src == "p" or broadcast_entities:
            side = F.broadcast(side)
        df = df.join(side, src)
    return df


def transe_score(triples: DataFrame, ent_emb: DataFrame,
                 rel_emb: DataFrame,
                 broadcast_entities: bool = True) -> DataFrame:
    """(s, p, o, score): L1 TransE plausibility of every triple under the
    given integer embeddings — two entity joins + one relation join and
    a codegen fold, no shuffle beyond the joins themselves."""
    t = triples.select("s", "p", "o").dropDuplicates()
    t = _with_vecs(t, ent_emb, rel_emb,
                   {"s": "_es", "p": "_rp", "o": "_eo"}, broadcast_entities)
    return (t.select("s", "p", "o",
                     _l1(F.col("_es"), F.col("_rp"), F.col("_eo"))
                     .alias("score")))


def distmult_score(triples: DataFrame, ent_emb: DataFrame,
                   rel_emb: DataFrame,
                   broadcast_entities: bool = True) -> DataFrame:
    """(s, p, o, score): DistMult plausibility (Yang et al. 2015) —
    Σ_j e_s[j]·r_p[j]·e_o[j] over the integer embeddings (HIGHER = more
    plausible, unlike TransE's distance). The trilinear product of
    BIGINTs is exact (|v| ≤ span³·dim ≪ 2^63), so DuckDB reproduces
    every score; same two-entity-join + relation-broadcast shape as
    transe_score."""
    t = triples.select("s", "p", "o").dropDuplicates()
    t = _with_vecs(t, ent_emb, rel_emb,
                   {"s": "_es", "p": "_rp", "o": "_eo"}, broadcast_entities)
    tri = F.zip_with(F.zip_with(F.col("_es"), F.col("_rp"),
                                lambda x, y: x * y),
                     F.col("_eo"), lambda x, y: x * y)
    return t.select("s", "p", "o",
                    F.aggregate(tri, F.lit(0).cast("long"),
                                lambda acc, v: acc + v).alias("score"))


def complex_score(triples: DataFrame, ent_emb: DataFrame,
                  rel_emb: DataFrame,
                  broadcast_entities: bool = True) -> DataFrame:
    """(s, p, o, score): ComplEx plausibility (Trouillon et al. 2016) —
    Re(<e_s, r_p, conj(e_o)>) with each embedding's FIRST half as the
    real part and SECOND half as the imaginary part (pass hash_embeddings
    with an even ``dim``; the split is positional, so the same integer
    table serves TransE/DistMult/ComplEx). Expanded per complex dim j:

        re_s·re_r·re_o + im_s·re_r·im_o + re_s·im_r·im_o − im_s·im_r·re_o

    — four integer products summed, exact BIGINT in both engines.
    ComplEx is the member of the trio that models ASYMMETRIC relations
    (DistMult forces score(s,p,o) == score(o,p,s); TransE can't score
    symmetric ones well) — having all three over one embedding table is
    the standard ensemble."""
    t = triples.select("s", "p", "o").dropDuplicates()
    t = _with_vecs(t, ent_emb, rel_emb,
                   {"s": "_es", "p": "_rp", "o": "_eo"}, broadcast_entities)
    half = lambda c, lo: F.expr(  # noqa: E731
        f"slice({c}, {lo} * (size({c}) div 2) + 1, size({c}) div 2)")
    prod3 = lambda a, b, c: F.zip_with(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), c, lambda x, y: x * y)
    re_s, im_s = half("_es", 0), half("_es", 1)
    re_r, im_r = half("_rp", 0), half("_rp", 1)
    re_o, im_o = half("_eo", 0), half("_eo", 1)
    total = F.zip_with(
        F.zip_with(prod3(re_s, re_r, re_o), prod3(im_s, re_r, im_o),
                   lambda x, y: x + y),
        F.zip_with(prod3(re_s, im_r, im_o), prod3(im_s, im_r, re_o),
                   lambda x, y: x - y),
        lambda x, y: x + y)
    return t.select("s", "p", "o",
                    F.aggregate(total, F.lit(0).cast("long"),
                                lambda acc, v: acc + v).alias("score"))


def corruption_pairs(triples: DataFrame, k: int = 1,
                     entities: DataFrame | None = None) -> DataFrame:
    """(s, p, o, side, j, cs, co): each positive with its j-th corruption
    (cs/co = corrupted subject/object, one side replaced). Same
    content-hash pick and false-negative anti-join as
    negatives.corrupt_triples, but keeps the positive alongside the
    negative — the shape margin training needs."""
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

    pairs = (cand.join(F.broadcast(idx), "idx")
             .select("s", "p", "o", "side", "j",
                     F.when(F.col("side") == "s", F.col("ent"))
                     .otherwise(F.col("s")).alias("cs"),
                     F.when(F.col("side") == "o", F.col("ent"))
                     .otherwise(F.col("o")).alias("co"),
                     (F.when(F.col("side") == "s", F.col("s"))
                      .otherwise(F.col("o")) == F.col("ent"))
                     .alias("_same"))
             .filter(~F.col("_same")).drop("_same"))
    neg_is_true = pos.select(F.col("s").alias("cs"), "p",
                             F.col("o").alias("co"))
    return pairs.join(neg_is_true, ["cs", "p", "co"], "left_anti")


def transe_epoch(pairs: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame,
                 margin: int = 4, lr: int = 1,
                 broadcast_entities: bool = True
                 ) -> tuple[DataFrame, DataFrame]:
    """One full-batch margin-SGD epoch over (positive, corruption) pairs;
    returns (new_ent_emb, new_rel_emb), same (name, vec) schema.

    For each violated pair (d_pos + margin > d_neg), with g = the sign
    vector of (es + rp - eo): the positive's distance is pushed down
    (es -= lr*g, rp -= lr*g, eo += lr*g) and the corruption's pushed up
    with its own sign vector gn (cs += lr*gn, rp += lr*gn, co -= lr*gn).
    Sign-based L1 gradients + integer lr keep every coordinate a BIGINT.

    Dataflow: embedding joins -> violated filter -> explode to
    (name, dim, delta) update rows -> ONE rollup keyed (name, dim) ->
    reassemble vectors -> apply join. No Python anywhere."""
    p = _with_vecs(pairs.select("s", "p", "o", "cs", "co"),
                   ent_emb, rel_emb,
                   {"s": "_es", "p": "_rp", "o": "_eo",
                    "cs": "_ecs", "co": "_eco"}, broadcast_entities)
    d_pos = _l1(F.col("_es"), F.col("_rp"), F.col("_eo"))
    d_neg = _l1(F.col("_ecs"), F.col("_rp"), F.col("_eco"))
    viol = p.filter(d_pos + F.lit(margin) > d_neg)

    g = F.transform(
        F.zip_with(F.zip_with(F.col("_es"), F.col("_rp"),
                              lambda x, y: x + y),
                   F.col("_eo"), lambda x, y: x - y),
        lambda v: F.signum(v).cast("long"))
    gn = F.transform(
        F.zip_with(F.zip_with(F.col("_ecs"), F.col("_rp"),
                              lambda x, y: x + y),
                   F.col("_eco"), lambda x, y: x - y),
        lambda v: F.signum(v).cast("long"))
    scaled = lambda vec, sgn: F.transform(  # noqa: E731
        vec, lambda v: v * F.lit(sgn * lr))

    updates = viol.select(F.explode(F.array(
        F.struct(F.col("s").alias("name"), F.lit("e").alias("kind"),
                 scaled(g, -1).alias("dv")),
        F.struct(F.col("o").alias("name"), F.lit("e").alias("kind"),
                 scaled(g, +1).alias("dv")),
        F.struct(F.col("cs").alias("name"), F.lit("e").alias("kind"),
                 scaled(gn, +1).alias("dv")),
        F.struct(F.col("co").alias("name"), F.lit("e").alias("kind"),
                 scaled(gn, -1).alias("dv")),
        F.struct(F.col("p").alias("name"), F.lit("r").alias("kind"),
                 scaled(g, -1).alias("dv")),
        F.struct(F.col("p").alias("name"), F.lit("r").alias("kind"),
                 scaled(gn, +1).alias("dv")),
    )).alias("u")).select("u.name", "u.kind",
                          F.posexplode("u.dv").alias("dim", "delta"))

    deltas = (updates.groupBy("kind", "name", "dim")
              .agg(F.sum("delta").alias("delta"))
              .groupBy("kind", "name")
              .agg(F.transform(
                  F.array_sort(F.collect_list(
                      F.struct(F.col("dim"), F.col("delta")))),
                  lambda x: x.delta).alias("dvec")))

    def apply(emb: DataFrame, kind: str) -> DataFrame:
        d = deltas.filter(F.col("kind") == kind).select("name", "dvec")
        return (emb.join(d, "name", "left")
                .select("name",
                        F.when(F.col("dvec").isNull(), F.col("vec"))
                        .otherwise(F.zip_with(F.col("vec"), F.col("dvec"),
                                              lambda a, b: a + b))
                        .alias("vec")))

    return apply(ent_emb, "e"), apply(rel_emb, "r")


def transe_train(pairs: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame,
                 epochs: int = 2, margin: int = 4, lr: int = 1,
                 broadcast_entities: bool = True
                 ) -> tuple[DataFrame, DataFrame]:
    """Multi-epoch full-batch training: iterate transe_epoch over the
    SAME pair set, localCheckpointing the embedding tables between
    epochs so each round's plan stays flat (the components/pagerank
    discipline for iterative DataFrame state). Still integer-exact —
    the whole trajectory is a sequence of BIGINT states."""
    for _ in range(epochs):
        ent_emb, rel_emb = transe_epoch(
            pairs, ent_emb, rel_emb, margin=margin, lr=lr,
            broadcast_entities=broadcast_entities)
        ent_emb = ent_emb.localCheckpoint(eager=False)
        rel_emb = rel_emb.localCheckpoint(eager=False)
    return ent_emb, rel_emb


def embedding_rows(emb: DataFrame) -> DataFrame:
    """(name, dim, v): exploded embedding table — the flat, exactly
    comparable form (array columns don't hash portably across engines)."""
    return emb.select("name", F.posexplode("vec").alias("dim", "v"))


_SCORERS = {
    # name -> (score_fn(triples, ent, rel, broadcast), higher_is_better)
    "transe": (lambda t, e, r, b: transe_score(t, e, r, b), False),
    "distmult": (lambda t, e, r, b: distmult_score(t, e, r, b), True),
    "complex": (lambda t, e, r, b: complex_score(t, e, r, b), True),
}


def link_prediction_ranks(test: DataFrame, all_pos: DataFrame,
                          ent_emb: DataFrame, rel_emb: DataFrame,
                          candidates: DataFrame | None = None,
                          broadcast_entities: bool = True,
                          model: str = "transe") -> DataFrame:
    """(s, p, o, rank): filtered object-side link-prediction rank of each
    test triple — 1 + #{candidate entities c != o, (s,p,c) not a known
    true triple, with strictly better corruption score} — where "better"
    follows the model's direction (TransE: lower distance; DistMult /
    ComplEx: higher product). The optimistic tie rule is deterministic
    and integer-exact for every scorer in the trio.

    ``all_pos`` is the filter set (train + test truths); ``candidates``
    defaults to the full entity universe of ``all_pos`` — pass a sampled
    subset at scale (sampled-metrics protocol)."""
    score_fn, higher = _SCORERS[model]
    cand = (candidates if candidates is not None
            else entity_index(all_pos).select(F.col("ent")))
    cand = cand.select(F.col("ent").alias("c")).dropDuplicates()

    gold = score_fn(test, ent_emb, rel_emb, broadcast_entities) \
        .withColumnRenamed("score", "gold_score")

    cor = (test.select("s", "p", "o").dropDuplicates()
           .join(F.broadcast(cand), F.col("c") != F.col("o")))
    known = all_pos.select(F.col("s"), F.col("p"),
                           F.col("o").alias("c")).dropDuplicates()
    cor = cor.join(known, ["s", "p", "c"], "left_anti")

    # score the corruptions with the same model over (s, p, c)
    scored = score_fn(cor.selectExpr("s", "p", "c as o"),
                      ent_emb, rel_emb, broadcast_entities) \
        .withColumnRenamed("score", "cscore") \
        .withColumnRenamed("o", "c")
    cor = cor.join(scored, ["s", "p", "c"])

    beats = (F.col("cscore") > F.col("gold_score") if higher
             else F.col("cscore") < F.col("gold_score"))
    better = (gold.join(cor, ["s", "p", "o"], "left")
              .groupBy("s", "p", "o")
              .agg(F.sum(F.when(beats, 1).otherwise(0))
                   .cast("long").alias("n_better")))
    return better.select("s", "p", "o",
                         (F.col("n_better") + 1).alias("rank"))


def lp_metrics(ranks: DataFrame, ks: tuple[int, ...] = (1, 3, 10)
               ) -> DataFrame:
    """One-row rollup of filtered ranks: n, hits@k counts, sum_rank, and
    sum_rr_e6 = sum(floor(1e6 / rank)) — every column BIGINT, so MRR
    (sum_rr_e6 / n / 1e6) is engine-reproducible to the last bit."""
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("rank").cast("long").alias("sum_rank"),
            F.sum(F.floor(F.lit(1_000_000) / F.col("rank")))
            .cast("long").alias("sum_rr_e6")]
    for k in ks:
        aggs.append(F.sum(F.when(F.col("rank") <= k, 1).otherwise(0))
                    .cast("long").alias(f"hits_{k}"))
    return ranks.agg(*aggs)
