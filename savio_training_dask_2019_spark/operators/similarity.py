"""Similarity search over embedding columns (LLM-pipeline extension,
SURVEY.md §2.12).

- ``brute_knn``: exact top-k cosine against a query vector. The scan is a
  narrow map (JVM higher-order fns); the top-k is ``TakeOrderedAndProject``
  — per-partition heaps + driver merge of k rows, NOT a global sort. This is
  the correct exact plan at any scale.
- ``brute_knn_join``: exact k-NN for a *set* of queries via broadcast of the
  query side.
- ``lsh_knn``: approximate NN via random-hyperplane bucketing
  (BucketedRandomProjectionLSH on unit-normalized vectors, where L2 distance
  is monotone in cosine: ||a-b||² = 2-2cos). Sub-linear candidate sets at
  the cost of recall — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine_similarity, l2_normalize


def brute_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``df`` rows vs one query vector.

    Returns (id, cosine round 5), ordered by (cosine desc, id asc) — the id
    tie-break makes the result set deterministic across engines."""
    # single array literal (one py4j call), not 64 per-element lit() calls
    q = F.lit([float(x) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine_similarity(as_double(F.col(vec_col)), q), 5).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("id") != exclude_id)
    return scored.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def brute_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact k-NN for every query row: broadcast the (small) query side,
    score corpus partitions locally, keep top-k per query via window.
    One shuffle (the per-query top-k), no corpus replication.

    ``exclude_self=True`` drops corpus rows whose id equals the query id —
    only meaningful when the queries are drawn from the corpus (same id
    space). Default False: with independent id spaces an id collision is
    coincidental and the neighbor must be kept."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("cvec"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("corpus_id"))
    scored = pairs.select(
        "query_id",
        "corpus_id",
        F.round(cosine_similarity(F.col("cvec"), F.col("qvec")), 5).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivf_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via IVF (inverted-file) partitioning: k-means coarse
    quantizer (``nlist`` cells) over unit-normalized vectors, then scan only
    the ``nprobe`` cells nearest the query. The scan fraction is
    ~``nprobe/nlist`` — the classic ANN scale path alongside LSH.

    At 100 TB the assignment is a narrow map (model broadcast by ml), and
    production layouts WRITE the corpus partitioned by cell id so a probe
    reads only its cells' files (partition pruning); here the cell filter
    plays that role. Recall is approximate (pytest-checked vs brute);
    distances within probed cells are exact."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__raw"),
        array_to_vector(l2_normalize(as_double(F.col(vec_col)))).alias("features"),
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(unit)
    assigned = model.transform(unit)

    qv = np.asarray(query_vec, dtype="float64")
    qv = qv / np.linalg.norm(qv)
    dists = [float(np.linalg.norm(qv - np.asarray(c))) for c in model.clusterCenters()]
    probe_cells = [int(i) for i in np.argsort(dists)[:nprobe]]

    cand = assigned.filter(F.col("prediction").isin(probe_cells))
    q = F.lit([float(x) for x in query_vec])
    return (
        cand.select(
            "id",
            F.round(cosine_similarity(as_double(F.col("__raw")), q), 5).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def lsh_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via BucketedRandomProjectionLSH on unit vectors.

    Deterministic for a fixed seed; returns (id, l2_dist round 5). Cosine
    ranking is recovered as cos = 1 - dist²/2."""
    import numpy as np
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    unit = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(l2_normalize(as_double(F.col(vec_col)))).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit)
    qv = np.asarray(query_vec, dtype="float64")
    qv = qv / np.linalg.norm(qv)
    nn = model.approxNearestNeighbors(unit, Vectors.dense(qv), k, distCol="l2_dist")
    return nn.select(
        "id",
        F.round("l2_dist", 5).alias("l2_dist"),
        F.round(1 - F.col("l2_dist") * F.col("l2_dist") / 2, 5).alias("cosine_est"),
    )
