"""BM25 retrieval (operators/retrieval): scoring against an independent
pure-Python reference, index determinism, and ranking sanity. The full
pipeline is hash-verified vs DuckDB by the driver's ``bm25_topk`` query."""

import math
import pathlib
import re
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.retrieval import (  # noqa: E402
    bm25_topk, build_term_index, corpus_stats,
)

DOCS = [
    (0, "spark shuffle join spark spark"),          # tf-heavy on 'spark'
    (1, "spark join"),                              # short doc, both terms
    (2, "join join join join join join join join"),
    (3, "window filter scan"),                      # no query terms
    (4, "spark"),                                   # shortest, one term
]


def _reference_bm25(query, k1=1.2, b=0.75):
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for term in query:
            tf = ts.count(term)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            out[d] = round(s * 1e6)
    return out


def test_bm25_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_term_index(docs)
    got = {r.doc: r.score_e6
           for r in bm25_topk(idx, ["spark", "join"], k=10).collect()}
    assert got == _reference_bm25(["spark", "join"])
    # rarer term ('shuffle', df=1) dominates a common one at equal tf
    one = {r.doc: r.rank
           for r in bm25_topk(idx, ["shuffle", "join"], k=10).collect()}
    assert one[0] == 1  # the only shuffle-containing doc ranks first


def test_bm25_stats_and_empty_query(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_term_index(docs)
    st = corpus_stats(idx).collect()[0]
    assert st.n_docs == 5 and st.avgdl == pytest.approx(19 / 5)
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(idx, [])
    # precomputed stats give identical results (the materialized path)
    a = sorted((r.doc, r.score_e6) for r in
               bm25_topk(idx, ["spark"], k=10).collect())
    b2 = sorted((r.doc, r.score_e6) for r in
                bm25_topk(idx, ["spark"], k=10,
                          stats=corpus_stats(idx)).collect())
    assert a == b2


def test_bm25_topk_plans_take_ordered(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = bm25_topk(build_term_index(docs), ["spark"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---- rrf_fuse ---------------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    from openapi_to_rdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([("d1", 1), ("d2", 2), ("d3", 3)],
                              ["doc_id", "rank"])
    b = spark.createDataFrame([("d3", 1), ("d1", 2), ("d4", 3)],
                              ["doc_id", "rank"])
    got = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    assert got["d1"].rrf_e6 == round((1 / 61 + 1 / 62) * 1e6)
    assert got["d3"].rrf_e6 == round((1 / 63 + 1 / 61) * 1e6)
    assert got["d2"].n_lists == 1 and got["d4"].n_lists == 1
    # d1 (ranks 1+2) beats d3 (ranks 3+1): 1/61+1/62 > 1/63+1/61
    assert got["d1"].fused_rank == 1 and got["d3"].fused_rank == 2


def test_rrf_fuse_missing_is_noop_not_zero(spark):
    from openapi_to_rdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([("d1", 1)], ["doc_id", "rank"])
    b = spark.createDataFrame([("d2", 1), ("d1", 50)], ["doc_id", "rank"])
    got = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    # d1: strong in one list, weak in the other — still above d2's single
    assert got["d1"].rrf_e6 > got["d2"].rrf_e6


def test_rrf_fuse_grouped(spark):
    from openapi_to_rdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([("q1", "d1", 1), ("q2", "d9", 1)],
                              ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([("q1", "d1", 2), ("q2", "d8", 1)],
                              ["query_id", "doc_id", "rank"])
    got = rrf_fuse([a, b], group_cols=["query_id"]).collect()
    ranks = {(r.query_id, r.doc_id): r.fused_rank for r in got}
    assert ranks[("q1", "d1")] == 1
    assert ranks[("q2", "d8")] == 1 and ranks[("q2", "d9")] == 2  # id tiebreak
