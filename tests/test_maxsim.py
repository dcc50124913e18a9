"""Late-interaction MaxSim retrieval (retrieval.maxsim_topk) vs a
pure-Python re-derivation."""

import pytest

from openapi_to_rdf_spark.operators.retrieval import maxsim_topk

DOCS = {
    1: [[1, 0], [0, 2]],
    2: [[2, 1], [1, 1], [0, -1]],
    3: [[-1, -1]],
    4: [[3, 0], [0, 3]],
}
QUERIES = {
    "qa": [[1, 1], [2, 0]],
    "qb": [[0, 1]],
}


def ref_scores():
    out = {}
    for q, qts in QUERIES.items():
        for d, dts in DOCS.items():
            s = 0
            for qt in qts:
                s += max(qt[0] * dt[0] + qt[1] * dt[1] for dt in dts)
            out[(q, d)] = s
    return out


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.createDataFrame(
        [(i, v) for i, v in DOCS.items()],
        "doc_id long, d_vecs array<array<long>>")
    qs = spark.createDataFrame(
        [(i, v) for i, v in QUERIES.items()],
        "q_id string, q_vecs array<array<long>>")
    return qs, docs


def test_scores_and_ranks_match_reference(tables):
    qs, docs = tables
    got = {(r["q_id"], r["doc_id"]): (r["score"], r["rank"])
           for r in maxsim_topk(qs, docs, k=10).collect()}
    ref = ref_scores()
    assert {k: v[0] for k, v in got.items()} == ref
    for q in QUERIES:
        order = sorted(((d, s) for (qq, d), s in ref.items() if qq == q),
                       key=lambda t: (-t[1], t[0]))
        for rank, (d, _) in enumerate(order, 1):
            assert got[(q, d)][1] == rank


def test_topk_truncates(tables):
    qs, docs = tables
    rows = maxsim_topk(qs, docs, k=2).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2] for v in per_q.values())


def test_plan_stays_jvm_side(tables):
    qs, docs = tables
    plan = maxsim_topk(qs, docs, k=3)._jdf.queryExecution().explainString(
        qs.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "EvalPython" not in plan and "InPandas" not in plan
