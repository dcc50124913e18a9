"""Distributed k-means + SemDeDup semantic dedup (operators.clustering)."""

import hashlib
import pathlib
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.clustering import (  # noqa: E402
    kmeans_assign, kmeans_cells, kmeans_fit, kmeans_init, semantic_dedup,
)
from openapi_to_rdf_spark.operators.dedup import embedding_dup_pairs  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ---------------------------------------------------------------- reference

def _ref_kmeans(ids, vecs, k, iters):
    """Pure-numpy Lloyd's with the operator's exact discipline: md5-ordered
    init, cosine rounded to 6 before argmax, ties to the smaller cell id,
    arithmetic-mean update, empty cells carry forward."""
    order = sorted(range(len(ids)), key=lambda i: (
        hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    cents = [(ids[i], vecs[i].astype(np.float64).copy()) for i in order[:k]]

    def assign(cents):
        out = []
        for v in vecs:
            v = v.astype(np.float64)
            best = None
            for cid, cv in cents:
                cos = round(float(np.dot(v, cv) /
                                  (np.linalg.norm(v) * np.linalg.norm(cv))), 6)
                key = (-cos, cid)
                if best is None or key < best[0]:
                    best = (key, cid)
            out.append(best[1])
        return np.array(out)

    for _ in range(iters):
        cells = assign(cents)
        new = []
        for cid, cv in cents:
            mask = cells == cid
            new.append((cid, vecs[mask].astype(np.float64).mean(axis=0)
                        if mask.any() else cv))
        cents = new
    return cents, assign(cents)


def test_kmeans_matches_numpy_reference(spark, emb):
    sub = emb.filter(F.col("vec_id") < 80).select("vec_id", "embedding")
    rows = sorted(sub.collect(), key=lambda r: r.vec_id)
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float32)

    got = kmeans_fit(sub, k=5, iters=3)
    ref_cents, ref_assign = _ref_kmeans(ids, vecs, k=5, iters=3)

    assert [c for c, _ in got] == [c for c, _ in ref_cents]
    for (_, gv), (_, rv) in zip(got, ref_cents):
        np.testing.assert_allclose(gv, rv, atol=1e-9)

    a = {r.id: r.cell for r in kmeans_assign(sub, got).collect()}
    assert [a[i] for i in ids] == list(ref_assign)


def test_kmeans_recovers_planted_blobs(spark):
    """Three well-separated direction blobs -> k=3 partitions them exactly."""
    rng = np.random.RandomState(7)
    dirs = np.eye(3)
    rows = []
    for i in range(90):
        v = dirs[i % 3] + rng.standard_normal(3) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=4)
    cells = kmeans_assign(df, cents).select("id", "cell").collect()
    by_blob = {}
    for r in cells:
        by_blob.setdefault(r.id % 3, set()).add(r.cell)
    # each blob lands wholly in one cell, and the three cells are distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({s.pop() for s in by_blob.values()}) == 3


def test_kmeans_empty_cell_carries_forward(spark):
    """All vectors identical -> one cell absorbs everything; the other seeds
    keep their previous centroid instead of dividing by zero."""
    df = spark.createDataFrame([(i, [1.0, 0.0]) for i in range(6)],
                               "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=2)
    assert len(cents) == 3
    assert all(len(v) == 2 and np.isfinite(v).all() for _, v in cents)


def test_kmeans_cells_report(spark, emb):
    cents = kmeans_fit(emb, k=8, iters=2)
    rep = kmeans_cells(emb, cents)
    rows = rep.collect()
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert all(-1.0 <= r.avg_cosine <= 1.0 for r in rows)


def test_semantic_dedup_planted_twins_total_recall(spark, emb):
    """A scaled twin has cosine 1.0 to its source -> identical rounded
    cosines to every centroid -> same cell -> the pair is always found."""
    from openapi_to_rdf_spark.operators.recall import _planted_twin_corpus

    twins = _planted_twin_corpus(emb, n=40)
    pairs = semantic_dedup(twins, threshold=0.999, k=8, iters=2)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 100000) in found for i in range(40))


def test_semantic_dedup_exact_subset_and_precision(spark, emb):
    """Every emitted pair appears in the exact all-pairs ground truth with
    the same cosine (precision 1.0); recall = the cell-boundary loss."""
    truth = {(r.id_a, r.id_b): r.cosine
             for r in embedding_dup_pairs(emb, threshold=0.4, exact=True).collect()}
    got = {(r.id_a, r.id_b): r.cosine
           for r in semantic_dedup(emb, threshold=0.4, k=8, iters=0).collect()}
    assert got  # nonempty at this threshold on the driver corpus
    assert all(p in truth and truth[p] == c for p, c in got.items())


def test_semantic_dedup_iters0_deterministic(spark, emb):
    a = sorted(map(tuple, semantic_dedup(emb, threshold=0.4, k=8, iters=0).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, threshold=0.4, k=8, iters=0).collect()))
    assert a == b


def test_semantic_dedup_max_cell_cap(spark):
    """A degenerate corpus (all one direction) lands in one cell; the cap
    stop-lists it instead of going quadratic."""
    df = spark.createDataFrame([(i, [1.0, 0.0]) for i in range(20)],
                               "vec_id long, embedding array<double>")
    assert semantic_dedup(df, threshold=0.9, k=2, iters=0, max_cell=10).count() == 0
    assert semantic_dedup(df, threshold=0.9, k=2, iters=0).count() == 190


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_assignment_plan_is_pure_projection(spark, emb):
    """No join/exchange in the assignment plan — the corpus streams once."""
    plan = _plan(kmeans_assign(emb, kmeans_init(emb, 8)))
    assert "Join" not in plan and "Exchange" not in plan


def test_semantic_dedup_plan_no_cartesian(spark, emb):
    plan = _plan(semantic_dedup(emb, threshold=0.4, k=8, iters=0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_codebook_literal_guard(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5)] * 4) for i in range(9_000)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="codebook too large"):
        kmeans_fit(df, k=9_000, iters=1)
