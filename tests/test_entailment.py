"""RDFS (ρdf) entailment materialization (operators/entailment): each
of the six rules in isolation, their compositions (dom/rng through a
spo-derived predicate, sco lift of dom-derived types), the delta view,
provenance bag mode, and the broadcast-plan assertion. The full closure
is pinned against DuckDB recursive CTEs by the driver oracle
``rdfs_entail`` at sf0.01."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    entailed_only, rdfs_entail,
)

TRIPLES = [
    # class hierarchy: A < B < C (two hops → tests scm-sco transitivity)
    ("A", "rdfs:subClassOf", "B"),
    ("B", "rdfs:subClassOf", "C"),
    # property hierarchy: p < q < r (tests scm-spo transitivity)
    ("p", "rdfs:subPropertyOf", "q"),
    ("q", "rdfs:subPropertyOf", "r"),
    # q's domain/range fire on q-triples DERIVED from p via prp-spo1
    ("q", "rdfs:domain", "A"),
    ("q", "rdfs:range", "B"),
    ("x", "p", "y"),
    ("u", "rdf:type", "A"),
]


def _graph(spark, rows=TRIPLES):
    return spark.createDataFrame(rows, ["s", "p", "o"])


def _closed(spark):
    return {(r.s, r.p, r.o)
            for r in rdfs_entail(_graph(spark)).collect()}


def test_sco_and_spo_transitive(spark):
    got = _closed(spark)
    assert ("A", "rdfs:subClassOf", "C") in got
    assert ("p", "rdfs:subPropertyOf", "r") in got


def test_prp_spo1_derives_super_predicates(spark):
    got = _closed(spark)
    assert ("x", "q", "y") in got and ("x", "r", "y") in got


def test_dom_rng_fire_on_derived_predicate(spark):
    got = _closed(spark)
    # (x p y) ⊢ (x q y); domain(q)=A, range(q)=B
    assert ("x", "rdf:type", "A") in got
    assert ("y", "rdf:type", "B") in got


def test_cax_sco_lifts_asserted_and_derived_types(spark):
    got = _closed(spark)
    # asserted (u type A) lifts two levels; derived (x type A) too;
    # (y type B) lifts one level
    for subj in ("u", "x"):
        assert (subj, "rdf:type", "B") in got
        assert (subj, "rdf:type", "C") in got
    assert ("y", "rdf:type", "C") in got


def test_closure_is_idempotent_and_contains_input(spark):
    closed = rdfs_entail(_graph(spark))
    got = {(r.s, r.p, r.o) for r in closed.collect()}
    assert set(TRIPLES) <= got
    again = {(r.s, r.p, r.o) for r in rdfs_entail(closed).collect()}
    assert again == got


def test_entailed_only_excludes_asserted(spark):
    delta = {(r.s, r.p, r.o)
             for r in entailed_only(_graph(spark)).collect()}
    assert delta.isdisjoint(set(TRIPLES))
    assert ("x", "q", "y") in delta


def test_bag_mode_carries_rule_provenance(spark):
    bag = rdfs_entail(_graph(spark), dedup=False)
    rules = {r.rule for r in bag.collect()}
    assert {"asserted", "prp-spo1", "prp-dom", "prp-rng",
            "cax-sco", "scm-sco", "scm-spo"} <= rules


def test_no_schema_graph_passes_through(spark):
    rows = [("x", "likes", "y"), ("x", "rdf:type", "T")]
    got = {(r.s, r.p, r.o) for r in rdfs_entail(_graph(spark, rows)).collect()}
    assert got == set(rows)


def test_plan_broadcasts_schema_side(spark):
    plan = (rdfs_entail(_graph(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "EvalPython"):
        assert bad not in plan, plan


def test_incremental_equals_full_recompute(spark):
    from openapi_to_rdf_spark.operators.entailment import (
        rdfs_entail_increment,
    )

    schema = [r for r in TRIPLES if r[1].startswith("rdfs:")]
    base_inst = [("x", "p", "y")]
    new_inst = [("v", "p", "w"), ("w", "rdf:type", "A")]
    full = {(r.s, r.p, r.o) for r in
            rdfs_entail(_graph(spark, schema + base_inst + new_inst))
            .collect()}
    closed_base = rdfs_entail(_graph(spark, schema + base_inst))
    inc = rdfs_entail_increment(_graph(spark, new_inst),
                                _graph(spark, schema))
    merged = {(r.s, r.p, r.o)
              for r in closed_base.unionByName(inc).collect()}
    assert merged == full


def test_increment_refuses_schema_changes(spark):
    import pytest

    from openapi_to_rdf_spark.operators.entailment import (
        rdfs_entail_increment,
    )

    bad = _graph(spark, [("Z", "rdfs:subClassOf", "A")])
    with pytest.raises(ValueError, match="fixed schema"):
        rdfs_entail_increment(bad, _graph(spark, TRIPLES))
