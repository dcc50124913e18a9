"""AMIE-style rule mining (operators.rulemine) vs brute-force oracles."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.rulemine import (  # noqa: E402
    hub_stoplist,
    mine_implication_rules,
    mine_path_rules,
    rule_predictions,
)

SCHEMA = "s string, p string, o string"


def _df(spark, triples):
    return spark.createDataFrame(triples, SCHEMA)


def _brute_path_rules(triples):
    """Enumerate p1(x,z) ∧ p2(z,y) ⇒ h(x,y) counts by hand."""
    t = set(triples)
    bodies = {}  # (p1,p2) -> set[(x,y)]
    for (x, p1, z1) in t:
        for (z2, p2, y) in t:
            if z1 == z2:
                bodies.setdefault((p1, p2), set()).add((x, y))
    heads = {}  # p -> set[(x,y)]
    subj = {}  # p -> set[x]
    for (s, p, o) in t:
        heads.setdefault(p, set()).add((s, o))
        subj.setdefault(p, set()).add(s)
    out = {}
    for (p1, p2), pairs in bodies.items():
        for h in heads:
            support = len(pairs & heads[h])
            pca = sum(1 for (x, _) in pairs if x in subj[h])
            if support:
                out[(p1, p2, h)] = (support, len(pairs), pca)
    return out


def _brute_impl_rules(triples):
    t = set(triples)
    pairs, subj = {}, {}
    for (s, p, o) in t:
        pairs.setdefault(p, set()).add((s, o))
        subj.setdefault(p, set()).add(s)
    out = {}
    for p1 in pairs:
        for h in pairs:
            if p1 == h:
                continue
            support = len(pairs[p1] & pairs[h])
            pca = sum(1 for (x, _) in pairs[p1] if x in subj[h])
            if support:
                out[(p1, h)] = (support, len(pairs[p1]), pca)
    return out


KG = [
    # clique of "knows" with a parallel "likes" that mostly follows it
    ("a", "knows", "b"), ("b", "knows", "c"), ("a", "knows", "c"),
    ("c", "knows", "d"), ("b", "knows", "d"),
    ("a", "likes", "c"), ("b", "likes", "d"),
    ("a", "likes", "x"),
    # duplicates must not inflate counts (set semantics)
    ("a", "knows", "b"),
    # a second relation pair for implication rules
    ("a", "in", "n1"), ("b", "in", "n1"), ("a", "cites", "n1"),
]


def test_path_rules_match_bruteforce(spark):
    got = {(r.p1, r.p2, r.head_p): (r.support, r.body_count, r.pca_count)
           for r in mine_path_rules(_df(spark, KG), min_support=1)
           .collect()}
    assert got == _brute_path_rules(KG)


def test_implication_rules_match_bruteforce(spark):
    got = {(r.p1, r.head_p): (r.support, r.body_count, r.pca_count)
           for r in mine_implication_rules(_df(spark, KG), min_support=1)
           .collect()}
    assert got == _brute_impl_rules(KG)


def test_confidence_threshold_integer_exact(spark):
    """The boundary support/body == num/den must be INCLUDED (>=), and
    the comparison must not pass through floats."""
    brute = _brute_path_rules(KG)
    # knows∧knows⇒likes: find its exact counts, then set the threshold
    # to exactly that ratio — the rule must survive.
    support, body, _ = brute[("knows", "knows", "likes")]
    rules = mine_path_rules(_df(spark, KG), min_support=1,
                            min_conf=(support, body)).collect()
    keys = {(r.p1, r.p2, r.head_p) for r in rules}
    assert ("knows", "knows", "likes") in keys
    # one notch stricter excludes it
    rules2 = mine_path_rules(_df(spark, KG), min_support=1,
                             min_conf=(support * body + 1, body * body))
    keys2 = {(r.p1, r.p2, r.head_p) for r in rules2.collect()}
    assert ("knows", "knows", "likes") not in keys2
    # every surviving rule satisfies the inequality exactly
    for r in rules:
        assert r.support * body >= support * r.body_count


def test_min_support_filters(spark):
    brute = _brute_path_rules(KG)
    got = {(r.p1, r.p2, r.head_p)
           for r in mine_path_rules(_df(spark, KG), min_support=2)
           .collect()}
    assert got == {k for k, v in brute.items() if v[0] >= 2}


def test_hub_stoplist_and_cap(spark):
    """A star hub z with fan-in*fan-out over the cap drops out of rule
    counting; everything routed through other nodes is unaffected."""
    star = ([(f"u{i}", "to", "hub") for i in range(6)]
            + [("hub", "from", f"v{j}") for j in range(6)]
            + [("u0", "direct", "v0")])
    df = _df(spark, star)
    stop = {r.z for r in hub_stoplist(df, hub_cap=9).collect()}
    assert stop == {"hub"}
    capped = mine_path_rules(df, min_support=1, hub_cap=9).collect()
    assert all(r.p1 != "to" or r.p2 != "from" for r in capped)
    uncapped = {(r.p1, r.p2, r.head_p) for r in
                mine_path_rules(df, min_support=1).collect()}
    assert ("to", "from", "direct") in uncapped


def test_rule_predictions_complete_missing_edges(spark):
    """Predictions = body pairs minus existing head edges, metadata
    attached; the known head edges never reappear."""
    df = _df(spark, KG)
    rules = mine_path_rules(df, min_support=2).filter(
        "p1 = 'knows' and p2 = 'knows' and head_p = 'likes'")
    preds = rule_predictions(df, rules).collect()
    brute = _brute_path_rules(KG)
    support, body, pca = brute[("knows", "knows", "likes")]
    body_pairs = set()
    t = set(KG)
    for (x, p1, z) in t:
        for (z2, p2, y) in t:
            if p1 == "knows" and p2 == "knows" and z == z2:
                body_pairs.add((x, y))
    likes = {(s, o) for (s, p, o) in t if p == "likes"}
    assert {(r.s, r.o) for r in preds} == body_pairs - likes
    for r in preds:
        assert r.p == "likes"
        assert (r.support, r.body_count, r.pca_count) == (support, body,
                                                          pca)


def test_transitivity_rule_is_minable(spark):
    """p∧p⇒p (transitive closure evidence) is a legitimate rule."""
    chain = [("1", "lt", "2"), ("2", "lt", "3"), ("1", "lt", "3"),
             ("3", "lt", "4"), ("2", "lt", "4"), ("1", "lt", "4")]
    rules = {(r.p1, r.p2, r.head_p): r.support
             for r in mine_path_rules(_df(spark, chain), min_support=1)
             .collect()}
    assert rules[("lt", "lt", "lt")] == 3  # (1,3),(2,4),(1,4)
