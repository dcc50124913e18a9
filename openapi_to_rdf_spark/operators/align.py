"""Instance-based ontology alignment: match classes across two graphs
(two spec versions, two extraction runs, an external vocabulary) by the
predicates their instances actually use — the deterministic core of
PARIS/LogMap-style matchers, reduced to set similarity over
(class, predicate) usage profiles.

A class's profile is the SET of predicates observed on its typed
instances. Candidate class pairs come from an inverted index on the
predicate (never class × class), similarity is Jaccard over the profile
sets with integer cross-multiplied thresholds, and `best_alignment`
picks one target per source class deterministically. Everything is
ANSI-SQL-expressible, so the driver carries an exact oracle.

Scale: profiles are (class-vocabulary × predicate-vocabulary) bounded —
tiny next to instance data, which is scanned ONCE per side (one
type-join each). The candidate join keys on the predicate; a predicate
used by every class (rdf:type-like hubs) fans out quadratically in the
CLASS vocabulary only, which is the acceptable cost of schema matching
(and `drop_ubiquitous` prunes predicates that appear in more classes
than a cap, the same stop-list trick the instance-level joiners use).

No counterpart in the reference (it converts one spec at a time and
never compares vocabularies); complements operators/shapes.py's
shape_drift, which diffs SAME-named shapes — this matches
DIFFERENTLY-named ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def class_profiles(triples: DataFrame, *,
                   type_pred: str = RDF_TYPE) -> DataFrame:
    """Distinct (cls, pred) usage profile of a graph: every non-type
    predicate observed on at least one instance of the class. One
    subject-keyed join (instances × their facts) + distinct — the
    graph is scanned once."""
    typed = (triples.filter(F.col("p") == type_pred)
             .select(F.col("s"), F.col("o").alias("cls")))
    facts = (triples.filter(F.col("p") != type_pred)
             .select("s", F.col("p").alias("pred")))
    return typed.join(facts, "s").select("cls", "pred").dropDuplicates()


def drop_ubiquitous(profiles: DataFrame, max_classes: int) -> DataFrame:
    """Remove predicates that appear in more than `max_classes` classes
    — they carry no alignment signal and drive the candidate join's
    fan-out. Vocabulary-sized rollup, broadcast anti-join."""
    hot = (profiles.groupBy("pred")
           .agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > max_classes).select("pred"))
    return profiles.join(F.broadcast(hot), "pred", "left_anti")


def align_classes(triples_a: DataFrame, triples_b: DataFrame, *,
                  type_pred: str = RDF_TYPE,
                  min_shared: int = 1,
                  threshold: tuple[int, int] | None = None,
                  max_classes_per_pred: int | None = None) -> DataFrame:
    """Candidate class alignments between graph A and graph B.

    Returns (class_a, class_b, shared, size_a, size_b) where `shared`
    is the number of predicates the two profiles have in common and
    size_* are the profile sizes — Jaccard is shared/(size_a+size_b-
    shared), thresholded integer-exactly when `threshold=(num, den)` is
    given (keep pairs with jaccard >= num/den).
    """
    pa = class_profiles(triples_a, type_pred=type_pred)
    pb = class_profiles(triples_b, type_pred=type_pred)
    if max_classes_per_pred is not None:
        pa = drop_ubiquitous(pa, max_classes_per_pred)
        pb = drop_ubiquitous(pb, max_classes_per_pred)
    sa = pa.groupBy(F.col("cls").alias("class_a")).agg(
        F.count(F.lit(1)).alias("size_a"))
    sb = pb.groupBy(F.col("cls").alias("class_b")).agg(
        F.count(F.lit(1)).alias("size_b"))
    shared = (pa.withColumnRenamed("cls", "class_a")
              .join(pb.withColumnRenamed("cls", "class_b"), "pred")
              .groupBy("class_a", "class_b")
              .agg(F.count(F.lit(1)).alias("shared"))
              .filter(F.col("shared") >= min_shared))
    out = (shared.join(sa, "class_a").join(sb, "class_b")
           .select("class_a", "class_b", "shared", "size_a", "size_b"))
    if threshold is not None:
        num, den = threshold
        union = F.col("size_a") + F.col("size_b") - F.col("shared")
        out = out.filter(F.col("shared") * F.lit(int(den))
                         >= F.lit(int(num)) * union)
    return out


def best_alignment(aligned: DataFrame) -> DataFrame:
    """One target class per source class: the highest-Jaccard candidate,
    ties broken by (shared desc, class_b asc) — deterministic.

    The window sorts on the double division shared/union, which is
    EXACT here: profile sizes are bounded by the predicate vocabulary
    (< 2^17 in any real schema), so two distinct rationals a/b != c/d
    differ by at least 1/(b*d) > 2^-34, far above the 2^-52-scale
    rounding of a single IEEE division — the computed doubles order
    exactly as the rationals do, and DuckDB (same IEEE ops) reproduces
    the ranking bit-for-bit."""
    union = (F.col("size_a") + F.col("size_b") - F.col("shared"))
    jac = F.col("shared").cast("double") / union.cast("double")
    w = Window.partitionBy("class_a").orderBy(
        F.desc(jac), F.desc("shared"), F.asc("class_b"))
    return (aligned.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("class_a", "class_b", "shared", "size_a", "size_b"))
