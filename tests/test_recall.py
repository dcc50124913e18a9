"""Recall floors for every approximate operator (VERDICT r1 task 1).

Ground truth is always the exact in-repo counterpart. Floors are set below
the measured sf0.001 values (deterministic seeds, so these are stable):

  measured: ann L=1 0.12 / L=8 0.60; ivf p=2 0.34 / p=8 0.62;
            embedding-LSH planted 1.00; minhash-cluster 1.00;
            simhash exact-equality (separately in test_trainingdata).

The random driver vectors make top-k neighbors noise-level — the hardest
ANN regime; planted-twin (in-regime) recall is asserted at ~1.0.
"""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.dedup import (  # noqa: E402
    char_jaccard_pairs, minhash_dedup_map, ngram_jaccard_pairs,
)
from openapi_to_rdf_spark.operators.recall import (  # noqa: E402
    _planted_twin_corpus, cluster_pair_recall, pair_recall, recall_report,
    topk_recall,
)
from openapi_to_rdf_spark.operators.similarity import (  # noqa: E402
    ann_lsh_topk, cosine_topk, ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("vector")))
    return q, cosine_topk(emb, q, k=10).localCheckpoint()


def test_ann_recall_floors_and_table_scaling(emb, exact_topk):
    q, exact = exact_topk
    r1 = topk_recall(exact, ann_lsh_topk(emb, q, k=10, n_tables=1, dim=64))
    r8 = topk_recall(exact, ann_lsh_topk(emb, q, k=10, n_tables=8, dim=64))
    assert r1 >= 0.10          # measured 0.12 (weak-neighbor regime)
    assert r8 >= 0.50          # measured 0.60
    assert r8 >= r1            # more tables never hurt recall


def test_ivf_recall_floors_and_probe_scaling(emb, exact_topk):
    q, exact = exact_topk
    r2 = topk_recall(exact, ivf_topk(emb, q, k=10, n_probe=2))
    r8 = topk_recall(exact, ivf_topk(emb, q, k=10, n_probe=8))
    assert r2 >= 0.25          # measured 0.34
    assert r8 >= 0.50          # measured 0.62
    assert r8 >= r2


def test_ann_planted_twin_recall_is_total(emb):
    """In-regime ANN: a scaled twin (cosine 1.0) must be the rank-1 hit for
    EVERY query even with the fast single-table config."""
    twins = _planted_twin_corpus(emb, n=30)
    q = (twins.filter(F.col("vec_id") >= 100000)
         .select((F.col("vec_id") - 100000).alias("query_id"),
                 F.col("embedding").alias("vector")))
    top1 = (ann_lsh_topk(twins, q, k=1, dim=64).filter(F.col("rank") == 1)
            .filter(F.col("neighbor_id") == F.col("query_id") + 100000))
    assert top1.count() == 30


def test_embedding_lsh_planted_recall(emb):
    from openapi_to_rdf_spark.operators.dedup import embedding_dup_pairs_lsh

    twins = _planted_twin_corpus(emb, n=60)
    truth = twins.filter(F.col("vec_id") < 100000).select(
        F.col("vec_id").alias("id_a"), (F.col("vec_id") + 100000).alias("id_b"))
    r = pair_recall(truth, embedding_dup_pairs_lsh(twins, threshold=0.999, dim=64))
    assert r >= 0.95           # measured 1.00


def test_minhash_cluster_recall_vs_exact_char_jaccard(docs):
    """MinHash clustering vs the EXACT AllPairs join over its own char-4
    shingle universe — apples-to-apples ground truth."""
    truth = char_jaccard_pairs(docs, n=4, threshold=0.8)
    assert truth.count() > 0
    r = cluster_pair_recall(truth, minhash_dedup_map(docs, threshold=0.8))
    assert r >= 0.95           # measured 1.00


def test_char_jaccard_pairs_is_exact(spark):
    """The new ground-truth generator itself: prefix filtering must lose
    nothing vs a brute-force reference on a small corpus."""
    rows = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        "completely unrelated text about spark shuffles",
        "another unrelated document mentioning joins",
    ])]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in char_jaccard_pairs(docs, n=4, threshold=0.5).collect()}

    # brute force in python with the same normalization
    import re

    def grams(t):
        s = re.sub(r"[^a-z0-9]", "", t.lower())
        return {s[i:i + 4] for i in range(len(s) - 3)}

    expected = {}
    for i, ti in rows:
        for j, tj in rows:
            if i < j:
                a, b = grams(ti), grams(tj)
                jac = len(a & b) / len(a | b)
                if jac >= 0.5:
                    expected[(i, j)] = round(jac, 6)
    assert got == expected


def test_recall_report_shape(spark):
    rep = {r.op: r for r in recall_report(spark, SF).collect()}
    assert set(rep) == {"ann_lsh_topk@10 L=1", "ann_lsh_topk@10 L=8",
                        "ivf_topk@10 probe=2", "ivf_topk@10 probe=8",
                        "ivf_topk@10 probe=2 trained",
                        "embedding_lsh_pairs@0.999", "embedding_lsh_pairs@0.4",
                        "semantic_dedup@0.999 twins", "semantic_dedup@0.4",
                        "minhash_clusters@0.8"}
    assert all(0 <= r.recall_e6 <= 1_000_000 for r in rep.values())
    assert rep["embedding_lsh_pairs@0.999"].recall_e6 >= 950_000
    assert rep["semantic_dedup@0.999 twins"].recall_e6 >= 950_000
    assert rep["minhash_clusters@0.8"].recall_e6 >= 950_000


def test_minhash_vs_word_ngram_cross_basis(docs):
    """Cross-basis sanity (the VERDICT-suggested comparison): pairs that are
    strong WORD-3-gram dups must also be recalled by char-shingle MinHash
    clustering at a matched threshold."""
    truth = ngram_jaccard_pairs(docs, n=3, threshold=0.9)
    r = cluster_pair_recall(truth, minhash_dedup_map(docs, threshold=0.8))
    assert r >= 0.95
