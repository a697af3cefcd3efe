"""kmeans_lloyd_exact: differential vs a pure-Python Lloyd reference,
partitioning invariance (the engine-exactness claim), planted-cluster
recovery, and the guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_lloyd(vecs, k, iters, quant, offset):
    """Reference Lloyd over the SAME integer quantization: returns
    {(cluster, dim_1based): (c_q, n_members)} of the final round."""
    import math

    q = {
        i: [int(math.floor((float(x) + offset) * quant)) for x in v]
        for i, v in vecs.items()
    }
    ids = sorted(q)
    cents = {c: list(q[ids[c]]) for c in range(k)}
    dim = len(next(iter(q.values())))

    def assign():
        a = {}
        for i, v in q.items():
            best = min(
                (sum((v[d] - ce[d]) ** 2 for d in range(dim)), cid)
                for cid, ce in cents.items()
            )
            a[i] = best[1]
        return a

    for t in range(iters):
        a = assign()
        sums: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for i, cid in a.items():
            s = sums.setdefault(cid, [0] * dim)
            for d in range(dim):
                s[d] += q[i][d]
            cnt[cid] = cnt.get(cid, 0) + 1
        if t < iters - 1:
            for cid in cents:
                if cid in cnt:
                    cents[cid] = [sums[cid][d] // cnt[cid] for d in range(dim)]
        else:
            return {
                (cid, d + 1): (sums[cid][d] // cnt[cid], cnt[cid])
                for cid in cnt
                for d in range(dim)
            }


def _vecs_from(df):
    return {r["vec_id"]: list(r["embedding"]) for r in df.collect()}


def test_kmeans_matches_python_reference_on_fixture(spark, sf_dir):
    from savio_training_dask_2019_spark.operators.kmeans import kmeans_lloyd_exact
    from savio_training_dask_2019_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["cluster"], r["dim"]): (r["c_q"], r["n_members"])
        for r in kmeans_lloyd_exact(
            emb, "embedding", "vec_id", k=4, iters=3, quant=1000, offset=1.0
        ).collect()
    }
    want = _py_lloyd(_vecs_from(emb), k=4, iters=3, quant=1000, offset=1.0)
    assert got == want and len(got) > 0


def test_kmeans_partitioning_invariance(spark, sf_dir):
    """The engine-exactness claim: integer sums are order-independent, so
    a 1-partition and a 16-partition run must be IDENTICAL."""
    from savio_training_dask_2019_spark.operators.kmeans import kmeans_lloyd_exact
    from savio_training_dask_2019_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    outs = []
    for parts in (1, 16):
        r = kmeans_lloyd_exact(
            emb.repartition(parts), "embedding", "vec_id", k=4, iters=2
        )
        outs.append(
            sorted(
                (x["cluster"], x["dim"], x["c_q"], x["n_members"])
                for x in r.collect()
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_kmeans_recovers_planted_clusters(spark):
    """Three tight planted blobs, k=3: every blob lands in one cluster and
    the centroid components sit on the blob's quantized mean."""
    from savio_training_dask_2019_spark.operators.kmeans import kmeans_lloyd_exact

    blobs = {0: [-0.8, -0.8], 1: [0.0, 0.8], 2: [0.8, -0.4]}
    # vec_id = j*3 + b, so the k smallest ids seed one centroid per blob
    rows = [
        (j * 3 + b, [cx + 0.001 * (j % 5), cy - 0.001 * (j % 3)])
        for j in range(20)
        for b, (cx, cy) in blobs.items()
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = kmeans_lloyd_exact(
        df, "embedding", "vec_id", k=3, iters=4, quant=1000, offset=1.0
    ).collect()
    n_by_cluster = {}
    for r in out:
        n_by_cluster[r["cluster"]] = r["n_members"]
    assert sorted(n_by_cluster.values()) == [20, 20, 20]
    cents = {}
    for r in out:
        cents.setdefault(r["cluster"], {})[r["dim"]] = r["c_q"]
    got_centers = sorted(
        (c[1], c[2]) for c in (cents[k] for k in sorted(cents))
    )
    want_centers = sorted(
        (
            sum(int((cx + 0.001 * (j % 5) + 1.0) * 1000) for j in range(20)) // 20,
            sum(int((cy - 0.001 * (j % 3) + 1.0) * 1000) for j in range(20)) // 20,
        )
        for cx, cy in blobs.values()
    )
    assert got_centers == want_centers


def test_kmeans_guards(spark):
    from savio_training_dask_2019_spark.operators.kmeans import kmeans_lloyd_exact

    df = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_lloyd_exact(df, "embedding", "vec_id", k=5, iters=1)
    with pytest.raises(ValueError, match="k and iters"):
        kmeans_lloyd_exact(df, "embedding", "vec_id", k=0, iters=1)
    neg = spark.createDataFrame(
        [(0, [-3.0, 0.0]), (1, [0.0, 0.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="offset"):
        kmeans_lloyd_exact(neg, "embedding", "vec_id", k=2, iters=1, offset=1.0)


def test_kmeans_catalog_query_shape(spark, sf_dir):
    """512 rows (8 clusters x 64 dims on the fixture — no empty cluster),
    n_members sums to the corpus per dim, c_q on the offset grid."""
    from savio_training_dask_2019_spark.queries.vectorops import q_kmeans_train
    from savio_training_dask_2019_spark.sources import load_table

    rows = q_kmeans_train(spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    by_dim: dict[int, int] = {}
    for r in rows:
        by_dim[r["dim"]] = by_dim.get(r["dim"], 0) + r["n_members"]
    assert set(by_dim.values()) == {n_corpus}
    assert all(r["c_q"] >= 0 for r in rows)


def test_kmeans_argmin_tie_breaks_to_smallest_cid(spark):
    """r18 Arrow-kernel pin: two centroids EXACTLY equidistant from a point
    must assign it to the smaller cluster id (np.argmin first-minimum over
    cid-sorted centroids == the old struct-min / oracle ORDER BY dist, cid
    rule). Seeds at quantized -1.0 and +1.0; every remaining point sits at
    exactly 0.0 — equidistant — so all of them must join cluster 0."""
    from savio_training_dask_2019_spark.operators.kmeans import kmeans_lloyd_exact

    rows = [(0, [-1.0]), (1, [1.0])] + [(i, [0.0]) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = {
        r["cluster"]: (r["c_q"], r["n_members"])
        for r in kmeans_lloyd_exact(
            df, "embedding", "vec_id", k=2, iters=1, quant=1000, offset=1.0
        ).collect()
    }
    # cluster 0: the seed at -1.0 (q=0) plus ten ties at 0.0 (q=1000)
    assert out[0] == ((0 + 10 * 1000) // 11, 11)
    assert out[1] == (2000, 1)
