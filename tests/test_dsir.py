"""DSIR importance resampling (operators/dsir): planted-distribution
semantics — documents drawn from the target's vocabulary must outscore
and outsample documents from a disjoint vocabulary."""

import pyspark.sql.functions as F
import pytest

from openapi_to_rdf_spark.operators.dsir import (
    bucket_counts, dsir_log_weights, dsir_sample, ngram_buckets,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target vocabulary: cooking; off-domain vocabulary: networking
    tgt_words = ["salt", "pepper", "onion", "garlic", "butter", "flour"]
    off_words = ["packet", "router", "socket", "latency", "buffer", "port"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    target = spark.createDataFrame(
        [(1000 + i, doc(tgt_words, i)) for i in range(8)],
        ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(i, doc(tgt_words, i)) for i in range(10)]          # target-like
        + [(100 + i, doc(off_words, i)) for i in range(10)]  # off-domain
        + [(200, ""), (201, "!!! ???")],                     # no n-grams
        ["doc_id", "text"])
    return raw, target


def test_ngram_buckets_shape(spark):
    df = spark.createDataFrame([(1, "aa bb cc")], ["doc_id", "text"])
    row = df.select(ngram_buckets(F.col("text"), 64).alias("b")).first()
    # 3 unigrams + 2 bigrams, all within [0, 64)
    assert len(row.b) == 5
    assert all(0 <= x < 64 for x in row.b)
    empty = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    assert empty.select(ngram_buckets(F.col("text"), 64).alias("b")) \
        .first().b == []


def test_bucket_counts_bounded(corpora):
    raw, _ = corpora
    dist = bucket_counts(raw, n_buckets=32)
    assert dist.count() <= 32
    # total mass = total n-gram occurrences
    total = dist.agg(F.sum("cnt")).first()[0]
    per_doc = raw.select(F.size(ngram_buckets(F.col("text"), 32))
                         .alias("n")).agg(F.sum("n")).first()[0]
    assert total == per_doc


def test_weights_separate_planted_domains(corpora):
    raw, target = corpora
    w = {r.doc_id: r.log_w_e6
         for r in dsir_log_weights(raw, target, n_buckets=512).collect()}
    assert len(w) == 22                       # every raw doc scored
    tgt_like = [w[i] for i in range(10)]
    off = [w[100 + i] for i in range(10)]
    assert min(tgt_like) > max(off)           # clean separation
    assert all(v > 0 for v in tgt_like)       # target-like: evidence FOR
    assert all(v < 0 for v in off)            # off-domain: evidence AGAINST
    assert w[200] == 0 and w[201] == 0        # no n-grams -> neutral


def test_sample_prefers_target_like(corpora):
    raw, target = corpora
    picked = dsir_sample(raw, target, 10, n_buckets=512)
    rows = picked.collect()
    assert len(rows) == 10
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] \
        == list(range(1, 11))
    # the weight gap dwarfs Gumbel noise here: all 10 winners are
    # target-like
    assert all(r.doc_id < 100 for r in rows)


def test_sample_deterministic(corpora):
    raw, target = corpora
    a = sorted((r.doc_id, r.rank)
               for r in dsir_sample(raw, target, 10, n_buckets=512).collect())
    b = sorted((r.doc_id, r.rank)
               for r in dsir_sample(
                   raw.repartition(7), target, 10, n_buckets=512).collect())
    assert a == b
