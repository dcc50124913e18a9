"""Distant-supervision labeling — openapi_to_rdf_spark.operators.distant."""

import pytest

from openapi_to_rdf_spark.operators.distant import (
    co_mention_pairs, distant_labels, negative_candidates,
)


@pytest.fixture(scope="module")
def corpus(spark):
    mentions = spark.createDataFrame(
        [("d1", "paris"), ("d1", "france"), ("d1", "seine"),
         ("d2", "paris"), ("d2", "france"),
         ("d3", "berlin"), ("d3", "france"),
         ("d4", "paris")],  # single mention: no pairs
        "doc string, term string")
    kb = spark.createDataFrame(
        [("paris", "capital_of", "france"),
         ("seine", "flows_through", "paris")],
        "s string, p string, o string")
    return mentions, kb


def test_co_mention_pairs_ordered_no_self(spark, corpus):
    mentions, _ = corpus
    pairs = {(r["container"], r["ent_s"], r["ent_o"])
             for r in co_mention_pairs(mentions).collect()}
    assert ("d1", "paris", "france") in pairs
    assert ("d1", "france", "paris") in pairs  # directed: both orders
    assert not any(s == o for _, s, o in pairs)
    assert not any(c == "d4" for c, _, _ in pairs)
    assert len(pairs) == 6 + 2 + 2  # d1: 3*2, d2: 2, d3: 2


def test_distant_labels_positives(spark, corpus):
    mentions, kb = corpus
    got = {(r["container"], r["s"], r["p"], r["o"])
           for r in distant_labels(mentions, kb).collect()}
    assert got == {
        ("d1", "paris", "capital_of", "france"),
        ("d2", "paris", "capital_of", "france"),  # fact seen twice
        ("d1", "seine", "flows_through", "paris"),
    }


def test_negative_candidates_closed_world(spark, corpus):
    mentions, kb = corpus
    neg = {(r["container"], r["ent_s"], r["ent_o"])
           for r in negative_candidates(mentions, kb).collect()}
    # KB pairs excluded in BOTH directions
    assert ("d1", "paris", "france") not in neg
    assert ("d1", "france", "paris") not in neg
    assert ("d1", "seine", "paris") not in neg
    assert ("d1", "paris", "seine") not in neg
    # unlinked co-mentions survive
    assert ("d1", "seine", "france") in neg
    assert ("d3", "berlin", "france") in neg
    assert len(neg) == 2 + 2  # d1 seine<->france, d3 berlin<->france


def test_pool_equals_union_of_positives_and_negatives(spark, corpus):
    """r5: distant_label_pool computes both label sets in ONE co-mention
    pass; it must equal distant_labels UNION relabeled negative_candidates
    exactly — including the multi-relation fan-out and the reverse-only
    exclusion rule."""
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.distant import distant_label_pool

    mentions, kb = corpus
    # widen the KB: a second relation on the same pair (fan-out) and a
    # reverse-only link (must emit NOTHING for the reverse pair)
    kb2 = kb.unionByName(spark.createDataFrame(
        [("paris", "located_in", "france"),
         ("france", "contains_city", "berlin")],
        "s string, p string, o string"))
    pool = {(r["container"], r["s"], r["p"], r["o"])
            for r in distant_label_pool(mentions, kb2).collect()}
    pos = {(r["container"], r["s"], r["p"], r["o"])
           for r in distant_labels(mentions, kb2).collect()}
    neg = {(r["container"], r["ent_s"], "__no_relation__", r["ent_o"])
           for r in negative_candidates(mentions, kb2).collect()}
    assert pool == pos | neg
    # fan-out present
    assert ("d1", "paris", "located_in", "france") in pool
    # reverse-only link (berlin -> france has only france->berlin in KB):
    # neither positive nor negative
    assert not any(c == "d3" and s == "berlin" and o == "france"
                   and p == "__no_relation__" for c, s, p, o in pool)
    assert ("d3", "france", "contains_city", "berlin") in pool
