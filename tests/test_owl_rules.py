"""OWL 2 RL property-semantics fragment (operators/entailment.owl_prp_entail):
prp-inv1/2, prp-symp, prp-trp in isolation and in interaction (inverse of a
transitive closure, symmetric+transitive saturation, CHAINED inverseOf
vocabularies), plus a brute-force naive-fixpoint equivalence proof that the
staged plan (alias → closure → alias) reaches the true fixpoint — the claim
owl_prp_entail's docstring makes. The full closure is additionally pinned
against a DuckDB recursive-CTE oracle by driver query ``owl_entail`` at
sf0.01."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    owl_prp_entail,
)


def _closed(spark, rows):
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    return {(r.s, r.p, r.o) for r in owl_prp_entail(df).collect()}


def _naive_fixpoint(rows):
    """Reference semantics: fire prp-inv1/2, prp-symp, prp-trp on the
    triple SET until nothing new — the textbook (quadratic) evaluation
    the staged Spark plan must coincide with."""
    triples = set(rows)
    inv = {(s, o) for (s, p, o) in triples if p == "owl:inverseOf"}
    sym = {s for (s, p, o) in triples
           if p == "rdf:type" and o == "owl:SymmetricProperty"}
    trp = {s for (s, p, o) in triples
           if p == "rdf:type" and o == "owl:TransitiveProperty"}
    changed = True
    while changed:
        changed = False
        new = set()
        for (x, p, y) in triples:
            if p == "owl:inverseOf":
                continue
            for (a, b) in inv:
                if p == a:
                    new.add((y, b, x))
                if p == b:
                    new.add((y, a, x))
            if p in sym:
                new.add((y, p, x))
        for (x, p, y) in triples:
            if p in trp:
                for (x2, p2, y2) in triples:
                    if p2 == p and y == x2:
                        new.add((x, p, y2))
        if not new <= triples:
            triples |= new
            changed = True
    return triples


def test_inverse_both_directions(spark):
    got = _closed(spark, [
        ("contains", "owl:inverseOf", "within"),
        ("x", "within", "y"),
        ("a", "contains", "b"),
    ])
    assert ("y", "contains", "x") in got
    assert ("b", "within", "a") in got


def test_symmetric(spark):
    got = _closed(spark, [
        ("knows", "rdf:type", "owl:SymmetricProperty"),
        ("a", "knows", "b"),
    ])
    assert ("b", "knows", "a") in got


def test_transitive_chain_closes(spark):
    got = _closed(spark, [
        ("part_of", "rdf:type", "owl:TransitiveProperty"),
        ("a", "part_of", "b"),
        ("b", "part_of", "c"),
        ("c", "part_of", "d"),
    ])
    assert ("a", "part_of", "c") in got
    assert ("a", "part_of", "d") in got
    assert ("b", "part_of", "d") in got


def test_inverse_of_transitive_closure(spark):
    # has_part is never asserted, yet must mirror the FULL part_of
    # closure (stage 3 of the plan).
    got = _closed(spark, [
        ("part_of", "rdf:type", "owl:TransitiveProperty"),
        ("has_part", "owl:inverseOf", "part_of"),
        ("a", "part_of", "b"),
        ("b", "part_of", "c"),
    ])
    assert ("c", "has_part", "a") in got


def test_transitive_over_inverse_derived_edges(spark):
    # the b->c hop arrives only via inverseOf; prp-trp must still chain
    # through it (stage 2 runs over asserted ∪ aliased edges).
    got = _closed(spark, [
        ("part_of", "rdf:type", "owl:TransitiveProperty"),
        ("has_part", "owl:inverseOf", "part_of"),
        ("a", "part_of", "b"),
        ("c", "has_part", "b"),
    ])
    assert ("a", "part_of", "c") in got


def test_symmetric_transitive_saturates_component(spark):
    got = _closed(spark, [
        ("near", "rdf:type", "owl:SymmetricProperty"),
        ("near", "rdf:type", "owl:TransitiveProperty"),
        ("a", "near", "b"),
        ("b", "near", "c"),
    ])
    nodes = ["a", "b", "c"]
    for x in nodes:
        for y in nodes:
            if x != y:
                assert (x, "near", y) in got, (x, y)


def test_chained_inverse_composes_unflipped(spark):
    # p inv q ∧ q inv r ⇒ p aliases r WITHOUT flipping.
    got = _closed(spark, [
        ("p", "owl:inverseOf", "q"),
        ("q", "owl:inverseOf", "r"),
        ("x", "p", "y"),
    ])
    assert ("y", "q", "x") in got
    assert ("x", "r", "y") in got


def test_no_declarations_is_identity(spark):
    rows = [("x", "p", "y"), ("x", "p", "y"), ("u", "q", "v")]
    assert _closed(spark, rows) == set(rows)


def test_staged_plan_matches_naive_fixpoint(spark):
    # adversarial mix: chained inverses onto a transitive predicate,
    # a symmetric+transitive predicate, cross-predicate sharing nodes.
    rows = [
        ("part_of", "rdf:type", "owl:TransitiveProperty"),
        ("has_part", "owl:inverseOf", "part_of"),
        ("inside", "owl:inverseOf", "has_part"),  # inside aliases part_of
        ("near", "rdf:type", "owl:SymmetricProperty"),
        ("near", "rdf:type", "owl:TransitiveProperty"),
        ("a", "part_of", "b"),
        ("c", "has_part", "b"),      # ⇒ b part_of c
        ("c", "inside", "d"),        # ⇒ c part_of d
        ("a", "near", "b"),
        ("b", "near", "e"),
        ("e", "part_of", "a"),
    ]
    expect = _naive_fixpoint(rows)
    got = _closed(spark, rows)
    assert got == expect


def test_bag_mode_tags_rules(spark):
    df = spark.createDataFrame([
        ("part_of", "rdf:type", "owl:TransitiveProperty"),
        ("a", "part_of", "b"),
        ("b", "part_of", "c"),
    ], ["s", "p", "o"])
    bag = owl_prp_entail(df, dedup=False)
    rules = {r.rule for r in bag.select("rule").distinct().collect()}
    assert "asserted" in rules and "prp-trp" in rules
