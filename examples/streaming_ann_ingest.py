#!/usr/bin/env python
"""Streaming ingest composed end-to-end — new documents arrive as a
micro-batched stream and flow through the full admission pipeline
(VERDICT r11 #4):

    PYTHONPATH=. python examples/streaming_ann_ingest.py [sf_dir] [workdir]

    bloom dedup          - xxhash64(text) probed against a Bloom bitset
                           built ONCE over the historical snapshot
                           (bloom-negative = DEFINITELY novel, skips the
                           confirm join), then against everything already
                           admitted earlier in the stream (read back from
                           the admitted parquet - scan cost, not driver
                           state), then intra-batch keep-first;
    cell assign + ANN    - each admitted doc's embedding takes its
                           argmax-cosine IVF cell and matches top-k
                           against the existing corpus via the two-sided
                           cell join (neither fact side broadcast);
    idempotent landing   - admitted (id, hash) and matches land as
                           per-batch parquet overwrites; replayed
                           batch_ids skip.

The demo replays three micro-batches of "new crawl" docs built from the
sf fixtures with planted duplicates at every tier: a snapshot re-crawl
(batch 0), a cross-batch duplicate + an intra-batch duplicate pair
(batch 1), and a full recovery replay of batch 1 (batch 2 of the
driver's life, skipped by batch_id). The IVF model here is 8 corpus
vectors taken as centroids; production trains it offline (kmeans_train)
and the handle takes any (cid, ce) frame.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main(sf_dir: str = "/root/testdata/sf0.001", workdir: str | None = None) -> None:
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.session import get_spark
    from savio_training_dask_2019_spark.sources import load_table
    from savio_training_dask_2019_spark.streaming import (
        StreamingAnnIngest,
        file_stream,
        foreach_batch_sink,
    )

    spark = get_spark(app_name="streaming-ann-ingest")
    workdir = workdir or tempfile.mkdtemp(prefix="stream_ann_")
    src = os.path.join(workdir, "crawl")
    out = os.path.join(workdir, "ingested")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # historical corpus: two thirds of the fixture; its embeddings are the
    # ANN corpus the new docs match against
    snapshot = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    corpus = (
        snapshot.join(emb, snapshot.doc_id == emb.vec_id)
        .select("doc_id", F.col("embedding").alias("vec"))
    )
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("ce")
    )

    # the "new crawl": the held-out third, joined to its embeddings
    fresh = (
        docs.where(F.col("doc_id") % 3 == 0)
        .join(emb, docs.doc_id == emb.vec_id)
        .select("doc_id", "text", F.col("embedding").alias("vec"))
        .orderBy("doc_id")
        .limit(40)
    ).collect()
    known = snapshot.orderBy("doc_id").limit(1).collect()[0]

    schema = "doc_id long, text string, vec array<float>"
    now = time.time()

    def wbatch(name: str, rows, mtime: float) -> None:
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    b0 = [(r["doc_id"], r["text"], list(r["vec"])) for r in fresh[:20]]
    b0.append((999_001, known["text"], [0.0] * len(fresh[0]["vec"])))  # re-crawl
    b1 = [(r["doc_id"], r["text"], list(r["vec"])) for r in fresh[20:40]]
    b1.append((999_002, fresh[0]["text"], list(fresh[0]["vec"])))  # cross-batch dup
    b1.append((999_003, fresh[20]["text"], list(fresh[20]["vec"])))  # intra-batch dup
    wbatch("b1", b0, now - 30)
    wbatch("b2", b1, now - 20)

    handle = StreamingAnnIngest(snapshot, corpus, centroids, out, k=3, nprobe=2)
    q = foreach_batch_sink(file_stream(spark, f"{src}/*", schema), handle)
    if not q.awaitTermination(300):
        raise RuntimeError("stream did not finish in time")

    for r in handle.reports:
        print(
            f"batch {r['batch_id']}: {r['n_batch']} arrived, "
            f"{r['n_known']} known, {r['n_dup']} intra-batch dups, "
            f"{r['n_admitted']} admitted"
        )
    assert handle.reports[0]["n_known"] == 1  # the snapshot re-crawl
    assert handle.reports[1]["n_known"] == 1  # the cross-batch duplicate
    assert handle.reports[1]["n_dup"] == 1  # the intra-batch pair

    # recovery replay: a seen batch_id is skipped, outputs unchanged
    n = len(handle.reports)
    handle(spark.createDataFrame([], schema), batch_id=0)
    assert len(handle.reports) == n

    matches = spark.read.parquet(
        *(f"{out}/matches/batch={r['batch_id']}" for r in handle.reports)
    )
    n_admitted = sum(r["n_admitted"] for r in handle.reports)
    print(f"ANN matches landed: {matches.count()} rows for {n_admitted} admitted docs")
    matches.orderBy(F.col("cosine").desc()).show(5, truncate=False)
    print("streaming ann ingest complete")


if __name__ == "__main__":
    main(*sys.argv[1:])
