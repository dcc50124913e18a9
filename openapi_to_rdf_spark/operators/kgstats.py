"""Dataset-level KG statistics: characteristic sets and VoID descriptions.

Two statistics surfaces every production RDF/KG store ships and the
reference (a one-shot converter, no query layer — see SURVEY §2.4) has no
counterpart for; both are graft-added engine infrastructure over the
materialized (s, p, o) snapshot:

- **Characteristic sets** (Neumann & Moerkotte, "Characteristic Sets:
  Accurate Cardinality Estimation for RDF Queries with Multiple Joins",
  ICDE 2011): partition subjects by their exact set of emitted
  predicates.  The per-set subject counts + per-predicate occurrence
  totals are THE statistic for estimating star-join cardinalities —
  :func:`estimate_star_count` implements the paper's estimator, and its
  ``distinct_subjects`` variant is *provably exact* (characteristic sets
  partition the subjects, and a subject matches a star of constant
  predicates iff its set is a superset), which the tests assert against
  :func:`operators.bgp.bgp_query`.

- **VoID** (W3C "Describing Linked Datasets with the VoID Vocabulary"):
  the standard dataset-description statistics — global triple /
  distinct-term counts plus per-property (``void:propertyPartition``)
  and per-class (``void:classPartition``) breakdowns — emitted as one
  tidy long-format DataFrame ready to serialize as a VoID graph.

Scale posture: every aggregation state here is bounded by the PREDICATE
VOCABULARY (collect_list of (p, count) pairs per subject — the same
bounded-state argument as shapes.infer_shapes), never by corpus
cardinality; the subject→set rollup shrinks monotonically (triples →
(s,p) pairs → subjects → sets).  The exact distinct counts in
:func:`void_stats` are the one full-width pass; ``approx=True`` swaps
them for HLL ``approx_count_distinct`` (1-2% error) which is what you
would run at 10^12 triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _per_subject(triples: DataFrame, s_col: str, p_col: str) -> DataFrame:
    """One row per subject: its characteristic set (comma-joined sorted
    distinct predicates), per-predicate multiplicities, triple count."""
    per_sp = (triples.groupBy(F.col(s_col).alias("s"),
                              F.col(p_col).alias("p"))
              .agg(F.count(F.lit(1)).alias("m")))
    # (p, m) pairs collected per subject: state bounded by the predicate
    # vocabulary, and p is unique per subject after the (s, p) rollup
    return (per_sp.groupBy("s")
            .agg(F.sort_array(F.collect_list(F.struct("p", "m")))
                 .alias("pm"))
            .select(
                "s",
                F.array_join(F.transform("pm", lambda x: x["p"]), ",")
                .alias("cs"),
                "pm",
                F.aggregate("pm", F.lit(0).cast("long"),
                            lambda acc, x: acc + x["m"]).alias("nt")))


def characteristic_sets(triples: DataFrame, s_col: str = "s",
                        p_col: str = "p") -> DataFrame:
    """(cs, n_subjects, n_triples) per distinct characteristic set.

    ``cs`` is the comma-joined sorted distinct-predicate list — the
    set's identity.  ``n_subjects`` subjects share it and together emit
    ``n_triples`` triples.  Sets partition the subjects: Σ n_subjects =
    count(distinct s), Σ n_triples = count(*).
    """
    return (_per_subject(triples, s_col, p_col)
            .groupBy("cs")
            .agg(F.count(F.lit(1)).alias("n_subjects"),
                 F.sum("nt").alias("n_triples")))


def characteristic_set_predicates(triples: DataFrame, s_col: str = "s",
                                  p_col: str = "p") -> DataFrame:
    """(cs, p, n_occurrences): total occurrences of predicate ``p``
    across all subjects of characteristic set ``cs`` — the multiplicity
    side of the ICDE 2011 statistic (occurrences / n_subjects is the
    set's mean multiplicity for p, the estimator's per-predicate
    factor)."""
    return (_per_subject(triples, s_col, p_col)
            .select("cs", F.explode("pm").alias("x"))
            .groupBy("cs", F.col("x.p").alias("p"))
            .agg(F.sum("x.m").alias("n_occurrences")))


def estimate_star_count(triples: DataFrame, query_preds: list[str],
                        s_col: str = "s", p_col: str = "p",
                        distinct_subjects: bool = False) -> DataFrame:
    """Estimate the cardinality of a star BGP ``{?s p1 ?o1 . ?s p2 ?o2
    . …}`` from characteristic-set statistics WITHOUT touching the
    instance data again — the ICDE 2011 estimator.

    A set qualifies iff it contains every query predicate.  Then:

    - ``distinct_subjects=True`` → one-row ``(est)``: Σ n_subjects over
      qualifying sets.  EXACT, not an estimate (sets partition subjects).
    - bag solutions (default) → one-row ``(est_e6)``: Σ over qualifying
      sets of n_subjects · Π_p (occ_p / n_subjects), e6-fixed-point.
      Exact whenever multiplicities are constant within a set (each
      subject's m_p equals the set mean), an upper/lower estimate
      otherwise — the paper's independence assumption.

    Engine-portability of the arithmetic (this runs in the driver's
    DuckDB oracle too): the per-set contribution is computed as the
    INTEGER product Π occ_p divided by the double n_subjects^(k-1),
    e6-rounded to BIGINT per set, then summed as BIGINTs — no
    float-accumulation order anywhere.
    """
    k = len(query_preds)
    if k == 0:
        raise ValueError("empty star")
    if len(set(query_preds)) != k:
        raise ValueError("duplicate predicates in star")
    per_s = _per_subject(triples, s_col, p_col)
    stats = (per_s.groupBy("cs")
             .agg(F.count(F.lit(1)).alias("n_subjects")))
    preds = (per_s.select("cs", F.explode("pm").alias("x"))
             .filter(F.col("x.p").isin(query_preds))
             .groupBy("cs")
             .agg(F.countDistinct("x.p").alias("n_hit"),
                  *[F.sum(F.when(F.col("x.p") == p, F.col("x.m")))
                    .alias(f"occ_{i}") for i, p in enumerate(query_preds)])
             .filter(F.col("n_hit") == k))  # set ⊇ star iff all k preds hit
    qual = preds.join(stats, "cs")
    if distinct_subjects:
        return qual.agg(F.coalesce(F.sum("n_subjects"), F.lit(0))
                        .alias("est"))
    prod = F.lit(1).cast("long")
    for i in range(k):
        prod = prod * F.col(f"occ_{i}")
    contrib = F.round(prod * F.lit(1000000.0)
                      / F.pow(F.col("n_subjects").cast("double"), k - 1)
                      ).cast("long")
    return (qual.select(contrib.alias("c"))
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("est_e6")))


def void_stats(triples: DataFrame, s_col: str = "s", p_col: str = "p",
               o_col: str = "o", type_pred: str = RDF_TYPE,
               approx: bool = False) -> DataFrame:
    """W3C VoID statistics as one long-format table
    ``(part, key, metric, value)``:

    - ``('dataset', '', …)``: void:triples, void:distinctSubjects,
      void:properties, void:distinctObjects;
    - ``('property', <p>, …)``: per-property triples / distinctSubjects /
      distinctObjects (void:propertyPartition);
    - ``('class', <c>, 'entities')``: subjects typed <c> via
      ``type_pred`` (void:classPartition).

    ``approx=True`` replaces the exact distinct counts with HLL
    ``approx_count_distinct`` — the 10^12-triple configuration; the
    exact default is what the driver's DuckDB oracle checks.
    """
    cd = F.approx_count_distinct if approx else F.countDistinct
    s, p, o = F.col(s_col), F.col(p_col), F.col(o_col)
    long = ["part", "key", "metric", "value"]

    def rows(df, part, key, **metrics):
        row = df.agg(*[v.cast("long").alias(k) for k, v in metrics.items()])
        stack = ", ".join(f"'{k}', {k}" for k in metrics)
        return (row.select(F.expr(
            f"stack({len(metrics)}, {stack}) AS (metric, value)"))
            .select(F.lit(part).alias("part"), key.alias("key"),
                    "metric", "value"))

    dataset = rows(
        triples, "dataset", F.lit(""),
        triples=F.count(F.lit(1)), distinctSubjects=cd(s),
        properties=cd(p), distinctObjects=cd(o))
    per_prop = (triples.groupBy(p.alias("key"))
                .agg(F.count(F.lit(1)).alias("triples"),
                     cd(s).alias("distinctSubjects"),
                     cd(o).alias("distinctObjects"))
                .select(F.lit("property").alias("part"), "key",
                        F.expr("stack(3, 'triples', triples, "
                               "'distinctSubjects', distinctSubjects, "
                               "'distinctObjects', distinctObjects) "
                               "AS (metric, value)")))
    per_class = (triples.filter(p == type_pred)
                 .groupBy(o.alias("key"))
                 .agg(cd(s).cast("long").alias("value"))
                 .select(F.lit("class").alias("part"), "key",
                         F.lit("entities").alias("metric"), "value"))
    return (dataset.select(long)
            .unionByName(per_prop.select(long))
            .unionByName(per_class.select(long)))


def star_cardinalities(triples: DataFrame, query_preds: list[str],
                       s_col: str = "s", p_col: str = "p") -> DataFrame:
    """Both star-cardinality answers in ONE statistics pass: a single
    per-subject rollup feeds the exact distinct-subject count AND the
    e6 bag estimate (same formulas as :func:`estimate_star_count`,
    which builds each from scratch — at 10^12 triples you compute the
    statistic once). One row: (n_subjects, est_e6)."""
    k = len(query_preds)
    if k == 0 or len(set(query_preds)) != k:
        raise ValueError("star must be non-empty distinct predicates")
    per_s = _per_subject(triples, s_col, p_col)
    stats = per_s.groupBy("cs").agg(F.count(F.lit(1)).alias("n_subjects"))
    preds = (per_s.select("cs", F.explode("pm").alias("x"))
             .filter(F.col("x.p").isin(query_preds))
             .groupBy("cs")
             .agg(F.countDistinct("x.p").alias("n_hit"),
                  *[F.sum(F.when(F.col("x.p") == p, F.col("x.m")))
                    .alias(f"occ_{i}") for i, p in enumerate(query_preds)])
             .filter(F.col("n_hit") == k))
    qual = preds.join(stats, "cs")
    prod = F.lit(1).cast("long")
    for i in range(k):
        prod = prod * F.col(f"occ_{i}")
    contrib = F.round(prod * F.lit(1000000.0)
                      / F.pow(F.col("n_subjects").cast("double"), k - 1)
                      ).cast("long")
    return (qual.select(F.col("n_subjects").alias("ns"), contrib.alias("c"))
            .agg(F.coalesce(F.sum("ns"), F.lit(0)).alias("n_subjects"),
                 F.coalesce(F.sum("c"), F.lit(0)).alias("est_e6")))


def discover_keys(triples: DataFrame, s_col: str = "s", p_col: str = "p",
                  o_col: str = "o") -> DataFrame:
    """Data-driven FUNCTIONAL / INVERSE-FUNCTIONAL property discovery —
    the statistics that tell an identity-resolution pipeline which
    predicates are safe to feed into the prp-fp/prp-ifp sameAs
    derivation (operators.entailment.owl_prp_entail's out-of-scope note,
    handled by the smush path) or to use as blocking keys.

    Per predicate, over DISTINCT (s, o) pairs:

    - ``n_pairs`` / ``n_subjects`` / ``n_objects``;
    - ``functional``: no subject carries two distinct objects (the data
      satisfies owl:FunctionalProperty);
    - ``inverse_functional``: no object is shared by two distinct
      subjects (the data satisfies owl:InverseFunctionalProperty — a
      candidate KEY for entity identity).

    Shape: distinct-pair dedup, then two (p, side)-grouped max-count
    aggregations — all map-side-combinable, no joins against the corpus.
    rdf:type is excluded (class membership is never an identity key).
    """
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    pairs = (triples.filter(F.col(p_col) != rdf_type)
             .select(F.col(s_col).alias("s"), F.col(p_col).alias("p"),
                     F.col(o_col).alias("o"))
             .dropDuplicates())
    per_s = (pairs.groupBy("p", "s").agg(F.count(F.lit(1)).alias("n"))
             .groupBy("p").agg(F.max("n").alias("max_o_per_s"),
                               F.count(F.lit(1)).alias("n_subjects")))
    per_o = (pairs.groupBy("p", "o").agg(F.count(F.lit(1)).alias("n"))
             .groupBy("p").agg(F.max("n").alias("max_s_per_o"),
                               F.count(F.lit(1)).alias("n_objects")))
    totals = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("n_pairs"))
    return (totals.join(per_s, "p").join(per_o, "p")
            .select("p", "n_pairs", "n_subjects", "n_objects",
                    (F.col("max_o_per_s") == 1).alias("functional"),
                    (F.col("max_s_per_o") == 1)
                    .alias("inverse_functional")))


def schema_summary(triples: DataFrame, s_col: str = "s", p_col: str = "p",
                   o_col: str = "o", kind_col: str = "o_kind",
                   dt_col: str = "o_datatype",
                   type_pred: str = RDF_TYPE,
                   untyped: str = "urn:untyped") -> DataFrame:
    """Class-to-class predicate usage — the VoID-linkset / LODStats schema
    graph: (s_class, p, o_class, n_triples, n_subjects).

    For every non-rdf:type triple, the subject's classes come from its
    rdf:type assertions (a multi-typed node contributes one row per class,
    standard linkset semantics; untyped subjects group under ``untyped``);
    the object side is the object's class for IRI/bnode objects (untyped
    likewise) and the literal datatype (xsd:string when absent) for
    literals. The output IS the dataset's schema-usage graph — what an
    ontology engineer reads to see how a vocabulary is actually used, and
    what infer_shapes quantifies per-rule.

    Scale: two instance-keyed joins (subject typing, object typing) — the
    same subject/object hash keys canonicalization and validation shuffle
    on — then a vocabulary-sized rollup with map-side partial aggregation.
    Output is O(|classes|^2 x |predicates|), independent of corpus size.
    """
    types = (triples.filter(F.col(p_col) == type_pred)
             .select(F.col(s_col).alias("tn"), F.col(o_col).alias("tc"))
             .dropDuplicates())
    data = triples.filter(F.col(p_col) != type_pred).select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"),
        F.col(o_col).alias("o"), F.col(kind_col).alias("k"),
        F.col(dt_col).alias("dt"))
    xsd_string = "http://www.w3.org/2001/XMLSchema#string"
    s_typed = (data.join(types, data["s"] == types["tn"], "left")
               .select("s", "p", "o", "k", "dt",
                       F.coalesce("tc", F.lit(untyped)).alias("s_class")))
    o_typed = (s_typed.join(types.withColumnsRenamed(
        {"tn": "on_", "tc": "oc"}),
        (F.col("k") != "literal") & (s_typed["o"] == F.col("on_")), "left"))
    o_class = (F.when(F.col("k") == "literal",
                      F.coalesce("dt", F.lit(xsd_string)))
               .otherwise(F.coalesce("oc", F.lit(untyped))))
    return (o_typed.select("s", "p", "s_class", o_class.alias("o_class"))
            .groupBy("s_class", "p", "o_class")
            .agg(F.count(F.lit(1)).alias("n_triples"),
                 F.countDistinct("s").alias("n_subjects")))
