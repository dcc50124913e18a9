"""SPARQL 1.1 Update (operators/update): Modify semantics on planted
graphs — single WHERE evaluation feeding both templates, delete-before-
insert, unbound-template skip, ground-data idempotence. The driver's
``kg_update`` query hash-checks the same operator against DuckDB's CASE
rewrite of the orders table."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.update import (  # noqa: E402
    delete_data, delete_insert, delete_where, insert_data, insert_where)

T = [
    ("a", "status", "old"), ("b", "status", "old"), ("c", "status", "new"),
    ("a", "name", "alice"), ("b", "name", "bob"), ("c", "name", "carol"),
    ("a", "knows", "b"),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(T, ["s", "p", "o"]).cache()


def spo(df):
    return {(r.s, r.p, r.o) for r in df.collect()}


def test_delete_where_removes_matches_only(g):
    out = spo(delete_where(g, [("?x", "status", "old")]))
    assert out == set(T) - {("a", "status", "old"), ("b", "status", "old")}


def test_modify_rewrites_values(g):
    # DELETE {?x status "old"} INSERT {?x status "archived"} WHERE {...}
    out = spo(delete_insert(g, [("?x", "status", "old")],
                            delete=[("?x", "status", "old")],
                            insert=[("?x", "status", "archived")]))
    assert ("a", "status", "archived") in out
    assert ("b", "status", "archived") in out
    assert ("a", "status", "old") not in out
    assert ("c", "status", "new") in out          # untouched rows survive
    assert len(out) == len(T)


def test_where_evaluated_once_pre_update(g):
    # the INSERT writes triples that MATCH the where pattern; they must
    # not feed a second round of deletion (single pre-update evaluation)
    out = spo(delete_insert(g, [("?x", "status", "old")],
                            delete=[("?x", "status", "old")],
                            insert=[("?x", "status", "old")]))
    # delete-then-insert of the same triple: present in the result
    assert ("a", "status", "old") in out and ("b", "status", "old") in out
    assert out == set(T)


def test_insert_where_set_semantics(g):
    # derive reverse edges; re-running on the result adds nothing
    once = delete_insert(g, [("?x", "knows", "?y")],
                         insert=[("?y", "knownBy", "?x")])
    assert ("b", "knownBy", "a") in spo(once)
    twice = insert_where(once, [("?x", "knows", "?y")],
                         insert=[("?y", "knownBy", "?x")])
    assert spo(twice) == spo(once)
    assert once.count() == len(T) + 1


def test_optional_unbound_template_var_instantiates_nothing(g):
    # every ?x with a name; OPTIONAL nickname never matches -> the
    # template using ?nick instantiates nothing, names still copy
    out = spo(delete_insert(
        g, [("?x", "name", "?n")],
        optional=[[("?x", "nickname", "?nick")]],
        insert=[("?x", "label", "?n"), ("?x", "label", "?nick")]))
    assert ("a", "label", "alice") in out
    assert not any(p == "label" and s == "a" and o != "alice"
                   for s, p, o in out)


def test_filters_scope_the_where(g):
    out = spo(delete_insert(g, [("?x", "status", "old"),
                                ("?x", "name", "?n")],
                            filters=["n = 'alice'"],
                            delete=[("?x", "status", "old")]))
    assert ("a", "status", "old") not in out
    assert ("b", "status", "old") in out


def test_ground_data_ops_and_noop_delete(g):
    added = insert_data(g, [("d", "name", "dave"), ("a", "name", "alice")])
    assert spo(added) == set(T) | {("d", "name", "dave")}  # dup ignored
    back = delete_data(added, [("d", "name", "dave"),
                               ("zz", "name", "nobody")])  # absent: no-op
    assert spo(back) == set(T)


def test_template_required_and_unbound_var_rejected(g):
    with pytest.raises(ValueError):
        delete_insert(g, [("?x", "status", "old")])
    with pytest.raises(ValueError):
        delete_insert(g, [("?x", "status", "old")],
                      insert=[("?x", "status", "?missing")])


def test_update_commit_chain_time_travel(spark, tmp_path):
    """kg pipeline graph -> SPARQL update commits a NEW snapshot chained
    to the old one; time travel reads the pre-update state, rollback
    restores it as LATEST."""
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import (
        read_snapshot, read_snapshot_asof, rollback, snapshot_history)
    from openapi_to_rdf_spark.sparql import sparql_update

    wd = tmp_path / "wd"
    run_pipeline(spark, wd, n_convs=60, seed=5)
    gdir = wd / "graph"
    kg = "http://ericsson.com/models/3gpp/kg#"
    before = read_snapshot(spark, gdir)
    n_user = before.filter((F.col("p") == kg + "role")
                           & (F.col("o") == "user")).count()
    assert n_user > 0
    t_before = snapshot_history(gdir)[0]["committed_at"]

    updated = sparql_update(
        before,
        f'DELETE {{ ?t <{kg}role> "user" }} '
        f'INSERT {{ ?t <{kg}role> "human" }} '
        f'WHERE {{ ?t <{kg}role> "user" }}')
    from openapi_to_rdf_spark.plans.snapshot import (
        fingerprint, write_snapshot)
    write_snapshot(updated, gdir, fingerprint("upd", 1))

    hist = snapshot_history(gdir)
    assert len(hist) == 2 and hist[0]["parent"] == hist[1]["fingerprint"]
    latest = read_snapshot(spark, gdir)
    assert latest.filter(F.col("o") == "human").count() == n_user
    # pre-update committed_at still resolves to the original graph
    old = read_snapshot_asof(spark, gdir, t_before)
    assert old.filter((F.col("p") == kg + "role")
                      & (F.col("o") == "user")).count() == n_user

    rollback(gdir, hist[1]["fingerprint"])
    assert read_snapshot(spark, gdir).filter(
        F.col("o") == "human").count() == 0
