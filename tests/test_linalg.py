"""Distributed linalg vs numpy reference (SURVEY.md §2.9 stretch): the
tall-skinny factorization path must agree with local numpy on the
materialized matrix."""

from __future__ import annotations

import numpy as np

from savio_training_dask_2019_spark.operators import (
    gramian,
    project_principal,
    svd_singular_values,
)
from savio_training_dask_2019_spark.sources import load_table


def _matrix(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    A = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype="float64"
    )
    return emb, A


def test_singular_values_match_numpy(spark, sf_dir):
    emb, A = _matrix(spark, sf_dir)
    got = {r["rank"]: r["sigma"] for r in svd_singular_values(emb, "embedding", 5).collect()}
    ref = np.linalg.svd(A, compute_uv=False)[:5]
    for i in range(5):
        assert abs(got[i + 1] - ref[i]) / ref[i] < 1e-6


def test_gramian_matches_numpy(spark, sf_dir):
    emb, A = _matrix(spark, sf_dir)
    g = np.zeros((A.shape[1], A.shape[1]))
    for r in gramian(emb, "embedding").collect():
        g[r["i"], r["j"]] = r["value"]
    assert np.allclose(g, A.T @ A, rtol=1e-9)


def test_principal_projection_matches_numpy_up_to_sign(spark, sf_dir):
    emb, A = _matrix(spark, sf_dir)
    proj = {r["id"]: r["components"] for r in
            project_principal(emb, "embedding", "vec_id", k=2).collect()}
    _, _, vt = np.linalg.svd(A)
    ids = sorted(proj)
    assert np.allclose(
        np.abs(np.array([proj[i] for i in ids])), np.abs(A[ids] @ vt[:2].T), atol=1e-6
    )
