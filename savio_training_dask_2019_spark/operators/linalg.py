"""Distributed linear algebra (SURVEY.md §2.9 stretch — the dask.array
``x.dot(y)`` / ``da.linalg.svd`` surface).

We deliberately do NOT rebuild an ndarray engine; the one genuinely
matrix-shaped need an LLM-data pipeline has — spectra/low-rank structure of
an embedding matrix (PCA whitening, rank diagnostics) — maps to
``pyspark.mllib.linalg.distributed.RowMatrix``: the Gramian ``AᵀA`` is
tree-aggregated across partitions (one pass, k×k state per task — k=64 here,
so bytes, not data), and the SVD eigendecomposes that k×k Gramian locally.
This is the standard tall-skinny factorization: scales in rows, local in
columns — exactly the 100 TB shape (billions of rows × small dim).

This is the engine's sole RDD touchpoint (mllib's distributed matrices are
RDD-based); everything else stays in DataFrame land per SURVEY.md §1.1.
"""

from __future__ import annotations

from pyspark.mllib.linalg import Vectors as MLLibVectors
from pyspark.mllib.linalg.distributed import RowMatrix
from pyspark.sql import DataFrame


def _to_row_matrix(df: DataFrame, vec_col: str) -> RowMatrix:
    rdd = df.select(vec_col).rdd.map(lambda r: MLLibVectors.dense(list(r[0])))
    return RowMatrix(rdd)


def gramian(df: DataFrame, vec_col: str) -> DataFrame:
    """AᵀA of the row-vector matrix as a (i, j, value) DataFrame (k² rows,
    k = vector dim). One distributed pass, tree-aggregated."""
    g = _to_row_matrix(df, vec_col).computeGramianMatrix()
    k = g.numCols
    arr = g.toArray()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, j, float(arr[i, j])) for i in range(k) for j in range(k)],
        "i int, j int, value double",
    )


def svd_singular_values(df: DataFrame, vec_col: str, k: int = 10) -> DataFrame:
    """Top-k singular values of the row-vector matrix as (rank, sigma).

    Singular values are basis-independent (unlike U/V, which are
    sign-ambiguous), so they are the deterministically testable part —
    pytest checks them against numpy on the materialized matrix."""
    svd = _to_row_matrix(df, vec_col).computeSVD(k, computeU=False)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, float(s)) for i, s in enumerate(svd.s)], "rank int, sigma double"
    )


def project_principal(df: DataFrame, vec_col: str, id_col: str, k: int = 2) -> DataFrame:
    """Project each row vector onto the top-k right singular vectors (PCA
    without mean-centering — embedding pipelines usually skip centering).
    Returns (id, array<double> of length k). Component signs are
    basis-ambiguous; downstream consumers must not rely on them."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    rm = _to_row_matrix(df, vec_col)
    svd = rm.computeSVD(k, computeU=False)
    v_local = svd.V.toArray()  # dim × k — small (64×k), broadcast as literal
    proj_cols = [
        F.aggregate(
            F.zip_with(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.lit([float(x) for x in v_local[:, j]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"pc{j}")
        for j in range(k)
    ]
    out = df.select(F.col(id_col).alias("id"), *proj_cols)
    return out.select("id", F.array(*[F.col(f"pc{j}") for j in range(k)]).alias("components"))
