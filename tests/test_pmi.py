"""pmi_relations: hand-computed PMI/NPMI on tiny edge sets."""

import math

from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.graphq import pmi_relations


def _e6(x: float) -> int:
    return int(round(round(x, 6) * 1e6))


def _edges(spark, rows):
    return spark.createDataFrame(rows, "doc string, term string")


def test_pmi_hand_computed(spark):
    # N=4 containers; n_a=3, n_b=3, n_c=2; (a,b) co-occur in 2, others in 1
    e = _edges(spark, [
        ("d1", "a"), ("d1", "b"),
        ("d2", "a"), ("d2", "b"),
        ("d3", "a"), ("d3", "c"),
        ("d4", "b"), ("d4", "c"),
    ])
    got = {(r.item_a, r.item_b): r
           for r in pmi_relations(e, min_pairs=1).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    ab = got[("a", "b")]
    pmi_ab = math.log(2 * 4 / (3 * 3))
    assert ab.n_ab == 2
    assert ab.pmi_e6 == _e6(pmi_ab)
    assert ab.npmi_e6 == _e6(pmi_ab / -math.log(2 / 4))

    ac = got[("a", "c")]
    pmi_ac = math.log(1 * 4 / (3 * 2))
    assert ac.n_ab == 1
    assert ac.pmi_e6 == _e6(pmi_ac)
    assert ac.npmi_e6 == _e6(pmi_ac / -math.log(1 / 4))

    # min_pairs prunes the singletons before the marginal joins
    assert set((r.item_a, r.item_b)
               for r in pmi_relations(e, min_pairs=2).collect()) == {("a", "b")}


def test_pmi_perfect_cooccurrence_pins_npmi(spark):
    e = _edges(spark, [("d1", "x"), ("d1", "y"), ("d2", "x"), ("d2", "y")])
    [r] = pmi_relations(e, min_pairs=1).collect()
    assert (r.item_a, r.item_b, r.n_ab) == ("x", "y", 2)
    assert r.pmi_e6 == 0          # ln(2*2/(2*2))
    assert r.npmi_e6 == 1_000_000  # 0/0 regime pinned to exactly 1.0


def test_pmi_counts_containers_not_mentions(spark):
    # duplicate mention rows must not inflate any count
    e = _edges(spark, [("d1", "x"), ("d1", "x"), ("d1", "y"),
                       ("d2", "x"), ("d2", "y"), ("d2", "y")])
    [r] = pmi_relations(e, min_pairs=1).collect()
    assert (r.n_ab, r.pmi_e6, r.npmi_e6) == (2, 0, 1_000_000)


def test_pmi_ranks_planted_association_highest(spark):
    # 40 containers: 'alpha'/'beta' always together; 'noise' appears in a
    # disjoint half with each — association must outrank co-frequency
    rows = []
    for i in range(20):
        rows += [(f"p{i}", "alpha"), (f"p{i}", "beta")]
        rows += [(f"p{i}", "noise")] if i < 10 else []
    for i in range(20):
        rows += [(f"q{i}", "noise")]
    got = {(r.item_a, r.item_b): r.npmi_e6
           for r in pmi_relations(_edges(spark, rows), min_pairs=1).collect()}
    assert got[("alpha", "beta")] > got[("alpha", "noise")]
    assert got[("alpha", "beta")] > got[("beta", "noise")]
