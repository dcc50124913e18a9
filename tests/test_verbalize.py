"""KG-to-text verbalization (operators/verbalize)."""

from openapi_to_rdf_spark.operators.verbalize import (
    entity_cards, verbalize_triples,
)

TRIPLES = [
    ("http://x/e#alice_smith", "http://x/p#works-at", "http://x/e#acme"),
    ("http://x/e#alice_smith", "http://x/p#knows", "http://x/e#bob"),
    ("http://x/e#bob", "http://x/p#knows", "http://x/e#alice_smith"),
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def test_default_template_and_labels(spark):
    got = {(r["s"], r["p"], r["o"]): r["text"]
           for r in verbalize_triples(_df(spark)).collect()}
    assert got[TRIPLES[0]] == "alice smith has works at acme."
    assert got[TRIPLES[2]] == "bob has knows alice smith."


def test_custom_templates_fall_back(spark):
    tpl = {"http://x/p#works-at": "{s} is employed by {o}."}
    got = {(r["s"], r["p"], r["o"]): r["text"]
           for r in verbalize_triples(_df(spark), tpl).collect()}
    assert got[TRIPLES[0]] == "alice smith is employed by acme."
    assert got[TRIPLES[1]] == "alice smith has knows bob."  # fallback


def test_entity_cards_sorted_and_truncated(spark):
    cards = {r["ent"]: r for r in entity_cards(_df(spark)).collect()}
    alice = cards["http://x/e#alice_smith"]
    assert alice["n_facts"] == 2
    # (p, o) lexicographic: knows < works-at
    assert alice["card"] == ("alice smith has knows bob.\n"
                             "alice smith has works at acme.")
    one = {r["ent"]: r["card"]
           for r in entity_cards(_df(spark), max_facts=1).collect()}
    assert one["http://x/e#alice_smith"] == "alice smith has knows bob."


def test_deterministic_under_repartition(spark):
    a = entity_cards(_df(spark)).collect()
    b = entity_cards(_df(spark).repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_single_pass_expansion_label_containing_placeholder(spark):
    """ADVICE r2: a term label that itself contains a later placeholder
    string must survive literally — substituted text is never rescanned
    (single-pass segment expansion, not sequential replace)."""
    tri = spark.createDataFrame(
        [("http://x/e#{o}", "http://x/p#rel", "http://x/e#obj")],
        "s string, p string, o string")
    tpl = {"http://x/p#rel": "{s} maps to {o}."}
    [row] = verbalize_triples(tri, tpl).collect()
    # _label of the subject is the literal "{o}" — it must NOT be
    # re-substituted into "obj"
    assert row["text"] == "{o} maps to obj."


def test_adjacent_and_repeated_placeholders(spark):
    tri = spark.createDataFrame(
        [("http://x/e#a", "http://x/p#rel", "http://x/e#b")],
        "s string, p string, o string")
    tpl = {"http://x/p#rel": "{s}{o} and again {o}"}
    [row] = verbalize_triples(tri, tpl).collect()
    assert row["text"] == "ab and again b"
