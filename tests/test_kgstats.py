"""Characteristic sets + VoID statistics (operators/kgstats): hand-computed
set partitions on a planted graph, the star-cardinality estimator's exact
cases (distinct-subject always; bag when multiplicities are constant
within a set), its estimate on a skewed case, and VoID long-format rows."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.kgstats import (  # noqa: E402
    RDF_TYPE, characteristic_set_predicates, characteristic_sets,
    estimate_star_count, void_stats,
)

# subjects a,b share the set {knows,name}; c is {name}; d is {knows} with
# multiplicity 3; e is {knows,name} with knows-multiplicity 2 (so the
# {knows,name} set has NON-constant knows multiplicity: 1, 1, 2)
T = [
    ("a", "knows", "b"), ("a", "name", "alice"),
    ("b", "knows", "c"), ("b", "name", "bob"),
    ("c", "name", "carol"),
    ("d", "knows", "a"), ("d", "knows", "b"), ("d", "knows", "c"),
    ("e", "knows", "a"), ("e", "knows", "b"), ("e", "name", "eve"),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(T, ["s", "p", "o"]).cache()


def test_characteristic_sets_partition(g):
    got = {r.cs: (r.n_subjects, r.n_triples)
           for r in characteristic_sets(g).collect()}
    assert got == {"knows,name": (3, 7), "name": (1, 1), "knows": (1, 3)}
    # a partition of the subjects and the triples
    assert sum(n for n, _ in got.values()) == 5
    assert sum(t for _, t in got.values()) == len(T)


def test_characteristic_set_predicates(g):
    got = {(r.cs, r.p): r.n_occurrences
           for r in characteristic_set_predicates(g).collect()}
    assert got == {("knows,name", "knows"): 4, ("knows,name", "name"): 3,
                   ("name", "name"): 1, ("knows", "knows"): 3}


def test_distinct_star_estimate_is_exact(g, spark):
    from openapi_to_rdf_spark.operators.bgp import bgp_query
    est = estimate_star_count(g, ["knows", "name"],
                              distinct_subjects=True).collect()[0].est
    exact = bgp_query(g, [("?s", "knows", "?x"), ("?s", "name", "?n")],
                      select=["?s"], distinct=True).count()
    assert est == exact == 3
    # unsatisfied star -> 0, not an empty frame
    none = estimate_star_count(g, ["knows", "missing"],
                               distinct_subjects=True).collect()
    assert [r.est for r in none] == [0]


def test_bag_estimate_exact_when_multiplicity_constant(spark):
    # every {p,q} subject has exactly 2 p's and 1 q -> estimate == bag count
    rows = [(s, p, f"o{i}") for s in ("x", "y", "z")
            for i, p in enumerate(("p", "p", "q"))]
    g = spark.createDataFrame(rows, ["s", "p", "o"])
    est = estimate_star_count(g, ["p", "q"]).collect()[0].est_e6
    from openapi_to_rdf_spark.operators.bgp import bgp_query
    bag = bgp_query(g, [("?s", "p", "?a"), ("?s", "q", "?b")]).count()
    assert est == bag * 1_000_000 == 6_000_000


def test_bag_estimate_independence_assumption(g):
    # {knows,name}: 3 subjects, 4 knows, 3 name -> 3·(4/3)·(3/3) = 4.0;
    # true bag count is 1+1+2 = 4 here too (name multiplicity constant)
    est = estimate_star_count(g, ["knows", "name"]).collect()[0].est_e6
    assert est == 4_000_000


def test_void_stats_rows(g, spark):
    typed = g.unionByName(spark.createDataFrame(
        [("a", RDF_TYPE, "Person"), ("b", RDF_TYPE, "Person"),
         ("d", RDF_TYPE, "Bot")], ["s", "p", "o"]))
    got = {(r.part, r.key, r.metric): r.value
           for r in void_stats(typed).collect()}
    assert got[("dataset", "", "triples")] == len(T) + 3
    assert got[("dataset", "", "distinctSubjects")] == 5
    assert got[("dataset", "", "properties")] == 3
    assert got[("property", "knows", "triples")] == 7
    assert got[("property", "knows", "distinctSubjects")] == 4
    assert got[("property", "knows", "distinctObjects")] == 3
    assert got[("property", RDF_TYPE, "triples")] == 3
    assert got[("class", "Person", "entities")] == 2
    assert got[("class", "Bot", "entities")] == 1


def test_void_stats_approx_close(g):
    exact = {(r.part, r.key, r.metric): r.value
             for r in void_stats(g).collect()}
    approx = {(r.part, r.key, r.metric): r.value
              for r in void_stats(g, approx=True).collect()}
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, 0.05 * v), (k, approx[k], v)


def test_graph_asof_lifecycle(spark):
    """Insert → delete → re-insert lifecycle, exact-tie insert-wins, and
    future events invisible (operators/graphq.graph_asof)."""
    import datetime as dt

    from openapi_to_rdf_spark.operators.graphq import graph_asof

    t = [dt.datetime(2020, 1, d) for d in range(1, 8)]
    ch = spark.createDataFrame([
        ("a", "p", "1", "I", t[0]), ("a", "p", "1", "D", t[2]),
        ("a", "p", "1", "I", t[4]),
        ("b", "p", "2", "I", t[1]), ("b", "p", "2", "D", t[1]),  # tie
        ("c", "p", "3", "I", t[6]),                     # future
    ], ["s", "p", "o", "op", "ts"])

    def at(ts):
        return {(r.s, r.o) for r in graph_asof(ch, ts).collect()}

    assert at(t[1]) == {("a", "1"), ("b", "2")}   # tie: insert wins
    assert at(t[3]) == {("b", "2")}               # a deleted
    assert at(t[5]) == {("a", "1"), ("b", "2")}   # a re-inserted; c future
    assert at(t[6]) == {("a", "1"), ("b", "2"), ("c", "3")}


def test_star_cardinalities_single_pass_matches(g):
    from openapi_to_rdf_spark.operators.kgstats import star_cardinalities

    [r] = star_cardinalities(g, ["knows", "name"]).collect()
    assert (r.n_subjects, r.est_e6) == (3, 4_000_000)
    [r0] = star_cardinalities(g, ["knows", "missing"]).collect()
    assert (r0.n_subjects, r0.est_e6) == (0, 0)


def test_dangling_objects_audit(spark):
    """Planted broken edge: ent#2 is referenced but never a subject;
    literals and out-of-prefix objects are ignored."""
    from openapi_to_rdf_spark.operators.graphq import dangling_objects

    g = spark.createDataFrame([
        ("ent#1", "rel", "ent#2"),          # dangling: ent#2 never subject
        ("ent#1", "rel", "ent#3"),          # ok: ent#3 is a subject below
        ("ent#3", "name", "charlie"),       # literal object, ignored
        ("ent#1", "near", "ent#3"),         # ok
        ("ent#3", "near", "other:thing"),   # out-of-prefix, ignored
    ], ["s", "p", "o"])
    got = {r.p: (r.n_refs, r.n_dangling)
           for r in dangling_objects(g, "ent#").collect()}
    assert got == {"rel": (2, 1), "near": (1, 0)}
