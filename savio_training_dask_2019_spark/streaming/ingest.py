"""Streaming incremental corpus ingestion — the continuous twin of the
batch ``dedup_incremental`` query (queries/llmpipe.py): new documents
arrive as a stream and are admitted only if their content hash is novel
both against the historical corpus SNAPSHOT and within the stream so far.

Scale design:

- The snapshot side is STATIC (a batch DataFrame over the corpus's hash
  index). Stream-static joins never buffer the static side in state —
  Spark re-plans it per micro-batch, so snapshot size is a scan/join cost,
  not a state cost. At 100 TB keep the snapshot as a bucketed hash-only
  table (8 bytes/row) so the per-batch anti-join is a pruned scan, and
  rebuild/compact it from the ingested output on a schedule.
- ``dropDuplicates`` on the hash holds one state row PER DISTINCT HASH
  EVER SEEN — the correct semantics for corpus identity (a duplicate is a
  duplicate forever), and the state row is just the 8-byte hash plus
  bookkeeping. If the operational bound matters more than perfect
  identity, pass ``within_watermark`` and a ``ts`` column to use
  ``dropDuplicatesWithinWatermark`` — state then expires with the
  watermark and only near-in-time duplicates are caught (the snapshot
  anti-join still catches everything older than the last compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def incremental_ingest(
    stream_docs: DataFrame,
    snapshot: DataFrame,
    text_col: str = "text",
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Admit only novel documents from ``stream_docs`` (a streaming
    DataFrame): drop rows whose ``xxhash64(text_col)`` already occurs in
    the static ``snapshot`` (anti-join) or earlier in the stream
    (keep-first). Returns a streaming DataFrame of admitted docs.

    ``within_watermark``: optional delay string (e.g. ``"10 minutes"``) —
    bounds dedup state via ``dropDuplicatesWithinWatermark`` on ``ts_col``
    instead of keeping every hash forever (see module docstring for the
    trade-off)."""
    hashed = stream_docs.withColumn("__h", F.xxhash64(F.col(text_col)))
    snap = snapshot.select(F.xxhash64(F.col(text_col)).alias("__h")).distinct()
    novel = hashed.join(snap, "__h", "left_anti")
    if within_watermark is not None:
        novel = novel.withWatermark(ts_col, within_watermark)
        deduped = novel.dropDuplicatesWithinWatermark(["__h"])
    else:
        deduped = novel.dropDuplicates(["__h"])
    return deduped.drop("__h")


class StreamingAnnIngest:
    """End-to-end streaming corpus ingestion (VERDICT r11 #4): new
    documents arrive → Bloom-prefiltered exact dedup → IVF cell assignment
    → ANN match against the existing corpus — the
    ``dedup_incremental_bloom`` shape and ``assign_cells``/
    ``cell_knn_join`` wired into ONE ``foreachBatch`` pipeline (pass an
    instance to :func:`streaming.foreach_batch_sink`).

    Per micro-batch, all DISTRIBUTED:

    1. hash ``text_col`` (xxhash64) and probe the Bloom bitset built ONCE
       over the historical snapshot's hashes — bloom-negative rows are
       DEFINITELY novel and skip the confirm join; bloom-positive rows
       (true re-crawls + ~FP rate) re-check against the exact hash set;
    2. anti-join against everything ADMITTED earlier in the stream (the
       admitted parquet paths are re-read per batch — stream-growth is a
       scan cost, not driver state; at production scale this side is
       compacted into the snapshot + a rebuilt bloom on a schedule);
    3. intra-batch keep-first on the hash (lowest id wins);
    4. admitted docs' embeddings take their argmax-cosine IVF cell and
       match top-``k`` against the corpus via the two-sided cell join
       (``cell_knn_join`` — neither fact side broadcast);
    5. admitted (id, h) and matches (query_id, corpus_id, cosine) land as
       idempotent per-batch parquet overwrites (``.../batch=N``).

    Driver state: the seen-batch-id set plus one 4-int report per batch —
    O(batches) scalars, never rows (the foreachBatch-monitor discipline).
    A batch_id is marked seen only AFTER both parquet writes succeed, so a
    batch that fails mid-write is fully re-processed on recovery replay
    (the per-batch ``.../batch=N`` overwrite paths make the rerun
    idempotent); a batch_id that already completed is skipped. Batches
    that admit zero rows contribute no path to the cross-batch anti-join
    re-read, and ``compact_every`` (optional) folds the admitted hashes
    back into the snapshot set + a rebuilt Bloom every N non-empty
    batches, bounding the per-batch re-scan list — the production
    compaction the module docstring describes, in-process.

    ``corpus`` must carry the same ``id_col``/``vec_col`` columns as the
    incoming stream; ``centroids`` is the (cid, ce) IVF model frame
    (O(nlist) rows — train offline, e.g. ``operators.kmeans``)."""

    def __init__(
        self,
        snapshot: DataFrame,
        corpus: DataFrame,
        centroids: DataFrame,
        out_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        vec_col: str = "vec",
        k: int = 3,
        nprobe: int = 2,
        bits_per_key: int = 10,
        compact_every: int | None = None,
    ) -> None:
        from ..operators.bloom import bloom_build, next_pow2

        self.text_col, self.id_col, self.vec_col = text_col, id_col, vec_col
        self.k, self.nprobe, self.out_dir = k, nprobe, out_dir
        self.compact_every = compact_every
        self.corpus = corpus
        self.centroids = centroids
        self.reports: list[dict] = []
        self._seen: set[int] = set()
        self._admitted_paths: list[str] = []
        # snapshot hash set: persisted (sizing count + bitset build +
        # every batch's confirm join); the bitset itself is ONE row of
        # m_bits/64 words
        self._snap = (
            snapshot.select(F.xxhash64(F.col(text_col)).alias("__h"))
            .distinct()
            .persist()
        )
        self._m_bits = next_pow2(max(1024, bits_per_key * max(1, self._snap.count())))
        self._bloom = bloom_build(self._snap, "__h", self._m_bits).persist()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.bloom import bloom_flag
        from ..operators.similarity import cell_knn_join

        if batch_id in self._seen:  # completed-batch replay — idempotent skip
            return
        # NOT marked seen yet: a mid-batch failure (either write throwing)
        # leaves the batch unmarked, so the recovery replay re-processes it
        # in full; the per-batch overwrite paths make that rerun idempotent.
        spark = batch_df.sparkSession

        hashed = batch_df.withColumn("__h", F.xxhash64(F.col(self.text_col)))
        flagged = bloom_flag(hashed, "__h", self._bloom, self._m_bits)
        maybe = flagged.where(F.col("__maybe")).join(
            self._snap.withColumn("__known", F.lit(1)), "__h", "left"
        )
        novel = flagged.where(~F.col("__maybe")).withColumn(
            "__known", F.lit(None).cast("int")
        )
        uni = maybe.unionByName(novel).drop("__maybe")
        if self._admitted_paths:  # hashes admitted earlier in the stream
            prior = spark.read.parquet(*self._admitted_paths).select(
                F.col("h").alias("__h")
            )
            uni = uni.join(
                prior.withColumn("__prior", F.lit(1)).distinct(), "__h", "left"
            )
        else:
            uni = uni.withColumn("__prior", F.lit(None).cast("int"))
        w = Window.partitionBy("__h").orderBy(self.id_col)
        flags = uni.withColumn("__rn", F.row_number().over(w)).select(
            *batch_df.columns,
            "__h",
            (F.col("__known").isNotNull() | F.col("__prior").isNotNull()).alias(
                "__is_known"
            ),
            (
                F.col("__known").isNull()
                & F.col("__prior").isNull()
                & (F.col("__rn") > 1)
            ).alias("__is_dup"),
        )
        flags = flags.localCheckpoint(eager=True)  # 3 consumers below

        [c] = flags.agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum(F.col("__is_known").cast("long")).alias("n_known"),
            F.sum(F.col("__is_dup").cast("long")).alias("n_dup"),
        ).collect()
        admitted = flags.where(~F.col("__is_known") & ~F.col("__is_dup"))

        apath = f"{self.out_dir}/admitted/batch={batch_id}"
        admitted.select(
            F.col(self.id_col), F.col("__h").alias("h")
        ).write.mode("overwrite").parquet(apath)

        matches = cell_knn_join(
            admitted.select(self.id_col, self.vec_col),
            self.corpus,
            self.centroids,
            vec_col=self.vec_col,
            id_col=self.id_col,
            k=self.k,
            nprobe=self.nprobe,
        )
        matches.write.mode("overwrite").parquet(
            f"{self.out_dir}/matches/batch={batch_id}"
        )

        n_admitted = int(c["n_batch"] - (c["n_known"] or 0) - (c["n_dup"] or 0))
        if n_admitted > 0:  # empty writes add nothing to the anti-join
            self._admitted_paths.append(apath)
        self.reports.append(
            {
                "batch_id": batch_id,
                "n_batch": int(c["n_batch"]),
                "n_known": int(c["n_known"] or 0),
                "n_dup": int(c["n_dup"] or 0),
                "n_admitted": n_admitted,
            }
        )
        self._seen.add(batch_id)  # durable side effects all landed

        if (
            self.compact_every is not None
            and len(self._admitted_paths) >= self.compact_every
        ):
            self._compact(spark)

    def _compact(self, spark) -> None:
        """Fold the admitted-so-far hashes into the snapshot hash set and
        rebuild the Bloom bitset over the union, then clear the path list —
        bounds the per-batch anti-join re-read at O(compact_every) paths.
        ``_m_bits`` stays fixed (sized for the initial snapshot ×
        bits_per_key), so the Bloom FP rate degrades gracefully as the
        corpus grows past the initial sizing; re-instantiate with a fresh
        snapshot for a full re-size (the scheduled-rebuild production
        path)."""
        from ..operators.bloom import bloom_build

        admitted = (
            spark.read.parquet(*self._admitted_paths)
            .select(F.col("h").alias("__h"))
            .distinct()
        )
        new_snap = self._snap.unionByName(admitted).distinct().persist()
        new_snap.count()  # materialize before unpersisting the old lineage
        self._snap.unpersist()
        self._bloom.unpersist()
        self._snap = new_snap
        self._bloom = bloom_build(self._snap, "__h", self._m_bits).persist()
        self._admitted_paths = []
