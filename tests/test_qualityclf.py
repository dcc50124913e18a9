"""Hashed logistic-regression quality classifier (operators/qualityclf)."""

import pytest

from openapi_to_rdf_spark.operators.qualityclf import (
    hashed_features, score_quality, train_quality_lr,
)


@pytest.fixture(scope="module")
def corpus(spark):
    good = ["salt", "pepper", "onion", "garlic", "butter", "flour"]
    bad = ["packet", "router", "socket", "latency", "buffer", "port"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    rows = ([(i, doc(good, i), 1) for i in range(12)]
            + [(100 + i, doc(bad, i), 0) for i in range(12)]
            + [(200, "", 0)])                      # gram-less doc
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_hashed_features_shape(corpus):
    f = hashed_features(corpus, n_buckets=256)
    rows = f.collect()
    assert all(0 <= r.bucket < 256 and r.c >= 1 for r in rows)
    # per-doc counts sum to n_grams
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, [0, r.n_grams])
        by_doc[r.doc_id][0] += r.c
    assert all(c == n for c, n in by_doc.values())
    assert 200 not in by_doc                       # empty doc: no rows


def test_training_separates_planted_classes(corpus):
    w, b = train_quality_lr(corpus, "label", n_buckets=512, iters=4)
    scored = {r.doc_id: r.prob_e6
              for r in score_quality(corpus, w, b, n_buckets=512).collect()}
    good = [scored[i] for i in range(12)]
    bad = [scored[100 + i] for i in range(12)]
    assert min(good) > 500_000 > max(bad)          # separated at 0.5
    assert min(good) > max(bad) + 100_000          # with real margin
    assert 200 in scored                           # gram-less doc scored


def test_training_deterministic_under_partitioning(corpus):
    w1, b1 = train_quality_lr(corpus, "label", n_buckets=512, iters=2)
    w2, b2 = train_quality_lr(corpus.repartition(7), "label",
                              n_buckets=512, iters=2)
    assert b1 == b2 and w1 == w2                   # integer weight states


def test_zero_iters_scores_half(corpus):
    w, b = train_quality_lr(corpus, "label", n_buckets=64, iters=0)
    assert (w, b) == ({}, 0)
    out = score_quality(corpus, w, b, n_buckets=64).collect()
    assert all(r.prob_e6 == 500_000 for r in out)
