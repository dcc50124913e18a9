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


# ---------------------------------------------------------------- prp-spo2

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    _chain_axioms,
    owl_chain_entail,
)


def _naive_chain_fixpoint(rows, chains):
    """Reference prp-spo2 semantics: fire every chain over the triple
    SET until nothing new."""
    triples = set(rows)
    changed = True
    while changed:
        changed = False
        new = set()
        for target, hops in chains.items():
            # all hop-paths u0 -p1-> u1 ... -pn-> un
            frontier = {(s, o) for (s, p, o) in triples if p == hops[0]}
            for q in hops[1:]:
                step = {(s, o) for (s, p, o) in triples if p == q}
                frontier = {(u0, u2) for (u0, u1) in frontier
                            for (v1, u2) in step if u1 == v1}
            new |= {(u0, target, un) for (u0, un) in frontier}
        if not new <= triples:
            triples |= new
            changed = True
    return triples


def test_chain_basic_two_hop(spark):
    rows = [("c1", "placed", "o1"), ("o1", "contains", "p1"),
            ("o1", "contains", "p2"), ("c2", "placed", "o2"),
            ("o2", "contains", "p1"), ("x", "other", "y")]
    chains = {"orderedPart": ["placed", "contains"]}
    got = {(r.s, r.p, r.o)
           for r in owl_chain_entail(
               spark.createDataFrame(rows, ["s", "p", "o"]),
               chains=chains).collect()}
    assert got == set(rows) | {("c1", "orderedPart", "p1"),
                               ("c1", "orderedPart", "p2"),
                               ("c2", "orderedPart", "p1")}


def test_chain_three_hop_and_no_match(spark):
    rows = [("a", "p1", "b"), ("b", "p2", "c"), ("c", "p3", "d"),
            ("b", "p2", "z")]  # z has no p3 continuation
    chains = {"q": ["p1", "p2", "p3"]}
    got = {(r.s, r.p, r.o)
           for r in owl_chain_entail(
               spark.createDataFrame(rows, ["s", "p", "o"]),
               chains=chains).collect()}
    assert got == set(rows) | {("a", "q", "d")}


def test_chain_feeds_chain_fixpoint(spark):
    # chain2's hop is chain1's OUTPUT — needs the semi-naive outer loop
    rows = [("a", "p1", "b"), ("b", "p2", "c"),   # => (a q c)
            ("c", "p3", "d")]                      # q∘p3 => (a r d)
    chains = {"q": ["p1", "p2"], "r": ["q", "p3"]}
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    got = {(r.s, r.p, r.o)
           for r in owl_chain_entail(df, chains=chains).collect()}
    assert got == _naive_chain_fixpoint(rows, chains)
    assert ("a", "r", "d") in got


def test_chain_self_feeding_converges(spark):
    # hasGrandparent = hasParent ∘ hasParent; derived rows never feed the
    # chain again (hasGrandparent is not a hop) — one round, converges
    rows = [(f"n{i}", "hasParent", f"n{i+1}") for i in range(5)]
    chains = {"hasGrandparent": ["hasParent", "hasParent"]}
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    got = {(r.s, r.p, r.o) for r in owl_chain_entail(df, chains=chains).collect()}
    assert got == _naive_chain_fixpoint(rows, chains)
    assert ("n0", "hasGrandparent", "n2") in got and len(got) == 9


def test_chain_axiom_harvest_from_graph(spark):
    rows = [
        ("uncle", "owl:propertyChainAxiom", "_:l1"),
        ("_:l1", "rdf:first", "hasParent"), ("_:l1", "rdf:rest", "_:l2"),
        ("_:l2", "rdf:first", "hasBrother"), ("_:l2", "rdf:rest", "rdf:nil"),
        ("kid", "hasParent", "mom"), ("mom", "hasBrother", "bob"),
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    assert _chain_axioms(df) == {"uncle": ["hasParent", "hasBrother"]}
    got = {(r.s, r.p, r.o) for r in owl_chain_entail(df).collect()}
    assert ("kid", "uncle", "bob") in got


def test_chain_provenance_tags(spark):
    rows = [("a", "p1", "b"), ("b", "p2", "c")]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    out = owl_chain_entail(df, chains={"q": ["p1", "p2"]}, dedup=False)
    tags = {(r.s, r.p, r.o): r.rule for r in out.collect()}
    assert tags[("a", "q", "c")] == "prp-spo2"
    assert tags[("a", "p1", "b")] == "asserted"


def test_chain_empty_axioms_passthrough(spark):
    rows = [("a", "p1", "b"), ("a", "p1", "b")]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    got = owl_chain_entail(df).collect()
    assert {(r.s, r.p, r.o) for r in got} == {("a", "p1", "b")}
    assert len(got) == 1


# ------------------------------------------------------- consistency rules

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    owl_consistency,
)


def _report(spark, rows):
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    return {(r.rule, r.s, r.p, r.o) for r in owl_consistency(df).collect()}


def test_eq_diff1_both_orientations(spark):
    rows = [
        ("a", "owl:sameAs", "b"), ("a", "owl:differentFrom", "b"),
        ("c", "owl:sameAs", "d"), ("d", "owl:differentFrom", "c"),  # reversed
        ("e", "owl:sameAs", "f"),                                   # no diff
        ("g", "owl:differentFrom", "h"),                            # no same
    ]
    got = _report(spark, rows)
    assert got == {("eq-diff1", "a", "owl:differentFrom", "b"),
                   ("eq-diff1", "d", "owl:differentFrom", "c")}


def test_cax_dw(spark):
    rows = [
        ("Gold", "owl:disjointWith", "Silver"),
        ("x", "rdf:type", "Gold"), ("x", "rdf:type", "Silver"),   # conflict
        ("y", "rdf:type", "Gold"),                                 # fine
        ("z", "rdf:type", "Silver"),                               # fine
    ]
    got = _report(spark, rows)
    assert got == {("cax-dw", "x", "rdf:type", "Gold")}


def test_prp_irp_and_asyp(spark):
    rows = [
        ("refersTo", "rdf:type", "owl:IrreflexiveProperty"),
        ("owes", "rdf:type", "owl:AsymmetricProperty"),
        ("n1", "refersTo", "n1"),                  # irreflexive self-loop
        ("n1", "refersTo", "n2"),                  # fine
        ("a", "owes", "b"), ("b", "owes", "a"),    # asymmetric pair
        ("c", "owes", "d"),                        # fine
        ("e", "owes", "e"),                        # self-edge = own reverse
    ]
    got = _report(spark, rows)
    assert got == {
        ("prp-irp", "n1", "refersTo", "n1"),
        ("prp-asyp", "a", "owes", "b"),
        ("prp-asyp", "b", "owes", "a"),
        ("prp-asyp", "e", "owes", "e"),
    }


def test_prp_pdw(spark):
    rows = [
        ("likes", "owl:propertyDisjointWith", "dislikes"),
        ("u", "likes", "v"), ("u", "dislikes", "v"),   # conflict
        ("u", "likes", "w"),                           # fine
        ("q", "dislikes", "v"),                        # fine
    ]
    got = _report(spark, rows)
    assert got == {("prp-pdw", "u", "likes", "v")}


def test_consistent_graph_empty_report(spark):
    rows = [
        ("Gold", "owl:disjointWith", "Silver"),
        ("owes", "rdf:type", "owl:AsymmetricProperty"),
        ("x", "rdf:type", "Gold"), ("z", "rdf:type", "Silver"),
        ("a", "owes", "b"), ("a", "owl:sameAs", "a2"),
    ]
    assert _report(spark, rows) == set()


# ------------------------------------------------------------------ prp-key

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    haskey_sameas_edges,
    key_smush,
)


def _key_axiom(cls, props, tag):
    """cls owl:hasKey (p1 .. pn) as triples with fresh list cells."""
    rows = [(cls, "owl:hasKey", f"_:k{tag}0")]
    for i, p in enumerate(props):
        nxt = f"_:k{tag}{i+1}" if i + 1 < len(props) else "rdf:nil"
        rows += [(f"_:k{tag}{i}", "rdf:first", p),
                 (f"_:k{tag}{i}", "rdf:rest", nxt)]
    return rows


def test_haskey_composite_match(spark):
    rows = _key_axiom("Person", ["ssnArea", "ssnSerial"], "a") + [
        ("p1", "rdf:type", "Person"), ("p2", "rdf:type", "Person"),
        ("p3", "rdf:type", "Person"), ("q1", "rdf:type", "Robot"),
        ("p1", "ssnArea", "12"), ("p1", "ssnSerial", "777"),
        ("p2", "ssnArea", "12"), ("p2", "ssnSerial", "777"),   # same key
        ("p3", "ssnArea", "12"), ("p3", "ssnSerial", "888"),   # differs
        # untyped / wrong-typed subjects never match even with equal keys
        ("q1", "ssnArea", "12"), ("q1", "ssnSerial", "777"),
        ("u1", "ssnArea", "12"), ("u1", "ssnSerial", "777"),
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    edges = {(r.src, r.dst) for r in haskey_sameas_edges(df).collect()}
    assert edges == {("p2", "p1")}


def test_haskey_multivalued_bearer_excluded(spark):
    rows = _key_axiom("Person", ["email"], "b") + [
        ("p1", "rdf:type", "Person"), ("p2", "rdf:type", "Person"),
        ("p1", "email", "a@x"),
        ("p2", "email", "a@x"), ("p2", "email", "b@x"),   # multi-valued
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    assert haskey_sameas_edges(df).collect() == []


def test_haskey_star_not_quadratic(spark):
    rows = _key_axiom("Person", ["ssn"], "c")
    rows += [(f"p{i}", "rdf:type", "Person") for i in range(6)]
    rows += [(f"p{i}", "ssn", "S") for i in range(6)]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    edges = {(r.src, r.dst) for r in haskey_sameas_edges(df).collect()}
    # group-min star: 5 edges to the lexicographic min, not 15 pairs
    assert edges == {(f"p{i}", "p0") for i in range(1, 6)}


def test_key_smush_composes_and_drops_bookkeeping(spark):
    rows = _key_axiom("Person", ["ssn"], "d") + [
        ("p1", "rdf:type", "Person"), ("p2", "rdf:type", "Person"),
        ("p1", "ssn", "S1"), ("p2", "ssn", "S1"),
        ("p2", "owl:sameAs", "p9"),          # asserted chains the class
        ("p9", "knows", "p1"),
        ("other", "rdf:first", "keepme"),    # unrelated list survives
        ("other", "rdf:rest", "rdf:nil"),
    ]
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    out = {(r.s, r.p, r.o) for r in key_smush(df).collect()}
    # p1, p2, p9 collapse to one representative
    reps = {s for (s, p, o) in out if p == "ssn"}
    assert len(reps) == 1
    rep = reps.pop()
    assert (rep, "knows", rep) in out
    assert (rep, "rdf:type", "Person") in out
    # hasKey axiom + ITS list cells gone; unrelated list intact
    assert not any(p == "owl:hasKey" for (_, p, _) in out)
    assert not any(s.startswith("_:kd") for (s, _, _) in out)
    assert ("other", "rdf:first", "keepme") in out


def test_all_disjoint_classes_and_all_different(spark):
    rows = [
        # AllDisjointClasses (Gold Silver Bronze)
        ("_:adc", "rdf:type", "owl:AllDisjointClasses"),
        ("_:adc", "owl:members", "_:m0"),
        ("_:m0", "rdf:first", "Gold"), ("_:m0", "rdf:rest", "_:m1"),
        ("_:m1", "rdf:first", "Silver"), ("_:m1", "rdf:rest", "_:m2"),
        ("_:m2", "rdf:first", "Bronze"), ("_:m2", "rdf:rest", "rdf:nil"),
        ("x", "rdf:type", "Gold"), ("x", "rdf:type", "Bronze"),  # cax-adc
        ("y", "rdf:type", "Silver"),                              # fine
        # AllDifferent (a b c) via distinctMembers
        ("_:ad", "rdf:type", "owl:AllDifferent"),
        ("_:ad", "owl:distinctMembers", "_:d0"),
        ("_:d0", "rdf:first", "a"), ("_:d0", "rdf:rest", "_:d1"),
        ("_:d1", "rdf:first", "b"), ("_:d1", "rdf:rest", "_:d2"),
        ("_:d2", "rdf:first", "c"), ("_:d2", "rdf:rest", "rdf:nil"),
        ("b", "owl:sameAs", "c"),                                 # eq-diff2
        ("a", "owl:sameAs", "q"),                                 # fine
        # an untyped members list must NOT create disjointness
        ("_:other", "owl:members", "_:o0"),
        ("_:o0", "rdf:first", "Gold"), ("_:o0", "rdf:rest", "_:o1"),
        ("_:o1", "rdf:first", "Zinc"), ("_:o1", "rdf:rest", "rdf:nil"),
        ("z", "rdf:type", "Gold"), ("z", "rdf:type", "Zinc"),
    ]
    got = _report(spark, rows)
    assert got == {("cax-adc", "x", "rdf:type", "Gold"),
                   ("eq-diff2", "b", "owl:differentFrom", "c")}
