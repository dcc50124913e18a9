"""PCA / whitening: distributed moments vs numpy ground truth."""

import numpy as np
import pytest

from openapi_to_rdf_spark.operators.pca import (
    embedding_cov, pca_fit, pca_project)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: known principal axes after rotation
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = (base @ q.T + rng.normal(size=6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id int, embedding array<float>").repartition(5)
    return x.astype(np.float64), df


def test_cov_matches_numpy(data):
    x, df = data
    want = np.cov(x, rowvar=False, bias=True)
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_cov(df).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-9)


def test_fit_and_project_match_numpy(data):
    x, df = data
    mean, comps, vals = pca_fit(df, k=3)
    assert mean == pytest.approx(x.mean(axis=0), abs=1e-9)
    # eigvals descending and positive for this cloud
    assert vals[0] > vals[1] > vals[2] > 0
    want_cov = np.cov(x, rowvar=False, bias=True)
    wv, wvec = np.linalg.eigh(want_cov)
    assert vals == pytest.approx(wv[::-1][:3], rel=1e-9)
    # components span the same axes (sign-normalized comparison)
    for k in range(3):
        assert abs(np.dot(comps[k], wvec[:, ::-1][:, k])) == pytest.approx(
            1.0, abs=1e-9)

    proj = (pca_project(df, mean, comps)
            .orderBy("vec_id").select("pca").collect())
    got = np.array([r["pca"] for r in proj])
    want = (x - mean) @ comps.T
    assert got == pytest.approx(want, abs=1e-6)


def test_whitening_unit_variance(data):
    x, df = data
    mean, comps, vals = pca_fit(df, k=4)
    white = (pca_project(df, mean, comps, eigvals=vals)
             .select("pca").collect())
    w = np.array([r["pca"] for r in white])
    assert w.var(axis=0) == pytest.approx(np.ones(4), rel=1e-4)


def test_projection_plan_is_python_free(data):
    _, df = data
    mean, comps, vals = pca_fit(df, k=2)
    plan = (pca_project(df, mean, comps)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
