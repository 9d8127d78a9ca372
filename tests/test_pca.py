"""Covariance / PCA / whitening (similarity/pca.py) vs numpy references."""

from __future__ import annotations

import numpy as np

from backend_big_data_spark.similarity.pca import (
    embedding_covariance,
    pca_components,
    pca_project,
)


def _df(spark, M):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(M)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def _structured(seed=0, n=300, dim=8):
    """Anisotropic cloud: two dominant axes, the rest near-noise."""
    rng = np.random.default_rng(seed)
    basis, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    scales = np.array([5.0, 2.0] + [0.3] * (dim - 2))
    return (rng.standard_normal((n, dim)) * scales) @ basis.T + rng.uniform(
        -1, 1, dim
    )


def test_covariance_matches_numpy(spark):
    M = _structured().astype(np.float32).astype(np.float64)
    rows = embedding_covariance(_df(spark, M), dim=8, quant=1e9).collect()
    ref = np.cov(M, rowvar=False, bias=True)
    assert len(rows) == 8 * 9 // 2
    for r in rows:
        assert r.i <= r.j
        assert abs(r.cov - ref[r.i, r.j]) < 1e-8


def test_covariance_plan_broadcasts_and_stays_jvm(spark):
    df = _df(spark, _structured(n=40))
    plan = embedding_covariance(
        df, dim=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_pca_components_match_numpy_eig(spark):
    M = _structured().astype(np.float32).astype(np.float64)
    comps, ev, mean = pca_components(_df(spark, M), dim=8, k=3)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-6)
    ref_vals = np.sort(np.linalg.eigvalsh(np.cov(M, rowvar=False, bias=True)))[
        ::-1
    ]
    assert np.allclose(ev, ref_vals[:3], atol=1e-6)
    assert ev[0] > ev[1] > ev[2]
    assert np.allclose(mean, M.mean(axis=0), atol=1e-6)


def test_projection_variance_equals_eigenvalues(spark):
    M = _structured(seed=3).astype(np.float32).astype(np.float64)
    df = _df(spark, M)
    comps, ev, mean = pca_components(df, dim=8, k=2)
    proj = np.array(
        [r.pca for r in pca_project(df, comps, mean).orderBy("vec_id").collect()]
    )
    assert np.allclose(proj.var(axis=0), ev, rtol=1e-4)
    # centering: projected cloud has ~zero mean
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-6)


def test_whitened_projection_has_unit_variance(spark):
    M = _structured(seed=5).astype(np.float32).astype(np.float64)
    df = _df(spark, M)
    comps, ev, mean = pca_components(df, dim=8, k=3)
    proj = np.array(
        [
            r.pca
            for r in pca_project(df, comps, mean, explained_variance=ev)
            .orderBy("vec_id")
            .collect()
        ]
    )
    assert np.allclose(proj.var(axis=0), 1.0, rtol=1e-3)


def test_projection_plan_is_pure_catalyst(spark):
    M = _structured(n=30)
    df = _df(spark, M)
    comps, ev, mean = pca_components(df, dim=8, k=2)
    plan = pca_project(
        df, comps, mean
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
