"""Structured Streaming smoke tests (SURVEY.md §2.8, §5.4): the windowed
logic itself is oracle-checked in batch mode (queries.timeseries); these
tests cover what only a live stream can — watermark-driven late-data drop
and the incremental execution path."""

from __future__ import annotations

import datetime as dt
import os
import time

from savio_training_dask_2019_spark.streaming import (
    file_stream,
    memory_sink,
    tumbling_counts,
    with_watermark,
)


def _write_batch(spark, path: str, name: str, rows, mtime: float):
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}")
    # FileStreamSource with availableNow+maxFilesPerTrigger=1 processes files
    # in modification-time order — pin mtimes so batch order is deterministic
    for root, _dirs, files in os.walk(f"{path}/{name}"):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics (empirically pinned): the watermark used in batch N
    is computed from batches ≤ N-1, and state eviction + late-row dropping
    take effect one batch AFTER the watermark passes a window's end — a late
    row arriving in the same batch as the eviction still merges. So the late
    row here arrives two batches after the watermark-advancing event."""
    src = str(tmp_path / "stream_src")
    t = dt.datetime(2024, 1, 1, 10, 0)
    now = time.time()
    # batch 0: five on-time events inside [10:00, 11:00)
    _write_batch(spark, src, "b1",
                 [(t + dt.timedelta(minutes=m), 1) for m in (0, 1, 2, 3, 5)], now - 40)
    # batch 1: event far ahead -> watermark will pass 11:00 next batch
    _write_batch(spark, src, "b2", [(dt.datetime(2024, 1, 1, 12, 0), 1)], now - 30)
    # batch 2: watermark now 11:30 -> [10,11) emitted + evicted this batch
    _write_batch(spark, src, "b3", [(dt.datetime(2024, 1, 1, 12, 1), 1)], now - 20)
    # batch 3: LATE row for the closed window -> dropped
    _write_batch(spark, src, "b4", [(dt.datetime(2024, 1, 1, 10, 2), 1)], now - 10)
    # batch 4: far-future row -> closes the [12,13) window too
    _write_batch(spark, src, "b5", [(dt.datetime(2024, 1, 1, 14, 0), 1)], now - 5)

    stream = file_stream(spark, f"{src}/*", "ts timestamp, user_id long")
    agg = tumbling_counts(with_watermark(stream, "ts", "30 minutes"),
                          ts="ts", duration="1 hour")
    q = memory_sink(agg, "wm_test", output_mode="append", available_now=True)
    assert q.awaitTermination(180), "stream did not finish in time"

    rows = spark.sql("SELECT * FROM wm_test").collect()
    by_start = {r["w_start"]: r["n_events"] for r in rows}
    assert by_start == {
        dt.datetime(2024, 1, 1, 10, 0): 5,  # late row NOT counted
        dt.datetime(2024, 1, 1, 12, 0): 2,
    }


def test_streaming_grouped_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src2")
    t = dt.datetime(2024, 1, 2, 0, 0)
    rows = [(t + dt.timedelta(minutes=7 * i), i % 3) for i in range(40)]
    _write_batch(spark, src, "b1", rows, time.time() - 10)

    stream = file_stream(spark, f"{src}/*", "ts timestamp, user_id long",
                         max_files_per_trigger=None)
    agg = tumbling_counts(with_watermark(stream, "ts", "10 minutes"),
                          ts="ts", duration="1 hour", keys=("user_id",))
    q = memory_sink(agg, "batch_parity", output_mode="complete", available_now=True)
    assert q.awaitTermination(120)

    streamed = {
        (r["w_start"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM batch_parity").collect()
    }
    batch_df = tumbling_counts(
        spark.createDataFrame(rows, "ts timestamp, user_id long"),
        ts="ts", duration="1 hour", keys=("user_id",),
    )
    batch = {(r["w_start"], r["user_id"]): r["n_events"] for r in batch_df.collect()}
    assert streamed == batch


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state must persist across micro-batches
    (the intermediate update row proves it was carried, not recomputed)."""
    from savio_training_dask_2019_spark.streaming import running_totals

    src = str(tmp_path / "state_src")
    now = time.time()
    b1 = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double")
    b2 = spark.createDataFrame([(1, 2.5), (2, 1.0), (3, 7.0)], "user_id long, value double")
    for name, df, mt in [("b1", b1, now - 20), ("b2", b2, now - 10)]:
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    stream = file_stream(spark, f"{src}/*", "user_id long, value double")
    q = memory_sink(running_totals(stream), "state_totals",
                    output_mode="update", available_now=True)
    assert q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM state_totals").collect()
    updates = sorted((r["user_id"], r["n_events"], r["total_value"]) for r in rows)
    assert (1, 2, 15.0) in updates          # after batch 1
    assert (1, 3, 17.5) in updates          # after batch 2: state carried
    final = {}
    for u, n, t in updates:
        if u not in final or n > final[u][0]:
            final[u] = (n, t)
    assert final == {1: (3, 17.5), 2: (2, 2.0), 3: (1, 7.0)}


def test_dedup_within_watermark_across_batches(spark, tmp_path):
    """Streaming dedup: a key re-delivered in a later micro-batch (inside the
    watermark horizon) is dropped and the FIRST value wins; the batch-mode
    fallback degrades to plain dropDuplicates."""
    from savio_training_dask_2019_spark.streaming import dedup_within_watermark

    src = str(tmp_path / "sdedup_src")
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    now = time.time()
    b1 = spark.createDataFrame(
        [(1, t0, 1.0), (2, t0 + dt.timedelta(minutes=1), 2.0)],
        "event_id long, ts timestamp, value double")
    b2 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=2), 99.0), (3, t0 + dt.timedelta(minutes=3), 3.0)],
        "event_id long, ts timestamp, value double")
    for name, df, mt in [("b1", b1, now - 20), ("b2", b2, now - 10)]:
        df.coalesce(1).write.parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    stream = file_stream(spark, f"{src}/*", "event_id long, ts timestamp, value double")
    q = memory_sink(dedup_within_watermark(stream, ["event_id"], delay="30 minutes"),
                    "sdedup_t", output_mode="append", available_now=True)
    assert q.awaitTermination(120)
    rows = {r["event_id"]: r["value"] for r in spark.sql("SELECT * FROM sdedup_t").collect()}
    assert rows == {1: 1.0, 2: 2.0, 3: 3.0}

    bdf = spark.createDataFrame(
        [(1, t0, 1.0), (1, t0, 1.0), (2, t0, 2.0)],
        "event_id long, ts timestamp, value double")
    assert dedup_within_watermark(bdf, ["event_id"]).count() == 2


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    """LLM-pipeline quality filtering on a live stream: the text-quality
    features are stateless JVM column math, so the same expressions run
    unchanged over readStream and must agree with batch on identical data."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import (
        stopword_ratio,
        token_count,
    )
    from savio_training_dask_2019_spark.streaming import file_stream, memory_sink

    src = str(tmp_path / "docs_src")
    rows = [
        (i, ("the quick brown fox jumps over the lazy dog " * (1 + i % 4)).strip())
        for i in range(30)
    ] + [(100 + i, "x") for i in range(5)]  # too-short docs to be filtered
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")

    def quality(frame):
        scored = frame.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.round(stopword_ratio(F.col("text")), 4).alias("sw_ratio"),
        )
        return scored.filter(F.col("n_tokens") >= 9)

    stream = file_stream(spark, f"{src}/*", "doc_id long, text string",
                         max_files_per_trigger=None)
    q = memory_sink(quality(stream), "quality_stream", output_mode="append",
                    available_now=True)
    assert q.awaitTermination(120)

    streamed = {(r["doc_id"], r["n_tokens"], r["sw_ratio"])
                for r in spark.sql("SELECT * FROM quality_stream").collect()}
    batch = {(r["doc_id"], r["n_tokens"], r["sw_ratio"])
             for r in quality(df).collect()}
    assert streamed == batch
    assert len(streamed) == 30  # the five 1-token docs were filtered


def test_foreach_batch_partitioned_writes(spark, tmp_path):
    """foreachBatch lands each micro-batch as an idempotent partitioned
    write (path/batch_id=N, overwrite) — the lakehouse-ingestion pattern;
    all rows arrive exactly once and batch ids are checkpointable units."""
    import time as _time

    from savio_training_dask_2019_spark.streaming import file_stream, foreach_batch_sink

    src = str(tmp_path / "fb_src")
    now = _time.time()
    t = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(spark, src, "b1", [(t, 1), (t, 2)], now - 20)
    _write_batch(spark, src, "b2", [(t, 3)], now - 10)

    out = str(tmp_path / "fb_out")
    seen: list[int] = []

    def handle(batch_df, batch_id: int):
        seen.append(batch_id)
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

    stream = file_stream(spark, f"{src}/*", "ts timestamp, user_id long")
    q = foreach_batch_sink(stream, handle)
    assert q.awaitTermination(180), "stream did not finish in time"

    assert sorted(seen) == [0, 1]  # one handle call per micro-batch
    back = spark.read.option("basePath", out).parquet(out)
    assert sorted(r["user_id"] for r in back.collect()) == [1, 2, 3]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join: state bounded by watermark + horizon;
    the streaming result must equal the identical interval join run in
    batch mode over the same rows."""
    import time as _time

    from savio_training_dask_2019_spark.streaming import file_stream, interval_join, memory_sink

    now = _time.time()
    t = dt.datetime(2024, 1, 1, 10, 0)
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    # views: user 1 at 10:00, user 2 at 10:05
    _write_batch(spark, vsrc, "b1", [(t, 1), (t + dt.timedelta(minutes=5), 2)], now - 40)
    # clicks: u1 at 10:04 (in horizon), u1 at 10:20 (outside), u2 at 10:06 (in)
    _write_batch(spark, csrc, "b1", [(t + dt.timedelta(minutes=4), 1)], now - 30)
    _write_batch(
        spark, csrc, "b2",
        [(t + dt.timedelta(minutes=20), 1), (t + dt.timedelta(minutes=6), 2)], now - 20,
    )

    schema = "ts timestamp, user_id long"
    joined = interval_join(
        file_stream(spark, f"{vsrc}/*", schema),
        file_stream(spark, f"{csrc}/*", schema),
        on="user_id", horizon="10 minutes",
    )
    q = memory_sink(joined, "ssj", output_mode="append", available_now=True)
    assert q.awaitTermination(180)
    stream_rows = sorted(
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    )

    views = spark.read.schema(schema).parquet(f"{vsrc}/*")
    clicks = spark.read.schema(schema).parquet(f"{csrc}/*")
    batch_rows = sorted(
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in interval_join(views, clicks, on="user_id", horizon="10 minutes").collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) == 2  # u1@10:04 and u2@10:06 only


def test_incremental_ingest_matches_batch_semantics(spark, tmp_path):
    """Streaming incremental ingest admits exactly the docs a batch run
    would: not in the snapshot, first occurrence in the stream — across
    micro-batch boundaries (maxFilesPerTrigger=1 forces multi-batch)."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.streaming import (
        file_stream,
        incremental_ingest,
        memory_sink,
    )

    src = str(tmp_path / "ingest_src")
    snapshot = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(5)], "doc_id long, text string"
    )
    # batch 1 overlaps the snapshot (3, 4); batch 2 overlaps batch 1 (6, 7)
    b1 = [(i, f"text-{i}") for i in range(3, 8)]
    b2 = [(i, f"text-{i}") for i in range(6, 11)]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        f"{src}/b1"
    )
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        f"{src}/b2"
    )

    stream = file_stream(spark, f"{src}/*", "doc_id long, text string")
    q = memory_sink(
        incremental_ingest(stream, snapshot), "ingested", output_mode="append"
    )
    assert q.awaitTermination(120)
    admitted = sorted(r["doc_id"] for r in spark.table("ingested").collect())
    assert admitted == [5, 6, 7, 8, 9, 10]

    # batch twin: same content set, computed with the batch dedup shape
    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    batch = (
        all_docs.withColumn("h", F.xxhash64("text"))
        .join(
            snapshot.select(F.xxhash64("text").alias("h")).distinct(),
            "h",
            "left_anti",
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert admitted == sorted(r["doc_id"] for r in batch.collect())


def test_incremental_ingest_watermark_bounded_state(spark, tmp_path):
    """The within_watermark variant (bounded dedup state) still admits
    novel docs and drops snapshot/in-stream duplicates that arrive inside
    the watermark window."""
    import datetime as dt

    from savio_training_dask_2019_spark.streaming import (
        file_stream,
        incremental_ingest,
        memory_sink,
    )

    src = str(tmp_path / "ingest_wm_src")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    snapshot = spark.createDataFrame(
        [(0, "text-0", t0)], "doc_id long, text string, ts timestamp"
    )
    rows = [
        (1, "text-1", t0),
        (2, "text-0", t0),  # snapshot dup
        (3, "text-1", t0 + dt.timedelta(minutes=1)),  # in-stream dup, in window
        (4, "text-4", t0 + dt.timedelta(minutes=2)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.parquet(f"{src}/b1")

    stream = file_stream(
        spark, f"{src}/*", "doc_id long, text string, ts timestamp"
    )
    q = memory_sink(
        incremental_ingest(stream, snapshot, within_watermark="10 minutes"),
        "ingested_wm",
        output_mode="append",
    )
    assert q.awaitTermination(120)
    admitted = sorted(r["doc_id"] for r in spark.table("ingested_wm").collect())
    assert admitted == [1, 4]


def test_debounce_boundary_and_previous_observed_semantics(spark):
    """The bounded-lag debounce keys suppression on the previous OBSERVED
    same-key event (not the previous KEPT one — the documented difference
    from dropDuplicatesWithinWatermark's first-kept model), and the lag
    comparison is strict: a gap of exactly lag_seconds is still a
    duplicate."""
    from savio_training_dask_2019_spark.streaming.windows import debounce

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key A: 0s kept; +1800s exactly at the lag -> dropped (strict >);
        # +1801s only 1s after the previous OBSERVED event -> dropped too,
        # even though it is 1801s after the last KEPT event
        (1, 7, "A", t0),
        (2, 7, "A", t0 + dt.timedelta(seconds=1800)),
        (3, 7, "A", t0 + dt.timedelta(seconds=1801)),
        # key A, far later: kept again
        (4, 7, "A", t0 + dt.timedelta(seconds=9000)),
        # key B on the same user: independent state
        (5, 7, "B", t0 + dt.timedelta(seconds=100)),
        # same key A but a different user: independent state
        (6, 8, "A", t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = debounce(
        df, keys=("user_id", "event_type"), ts="ts",
        lag_seconds=1800, order_tiebreak="event_id",
    )
    assert sorted(r["event_id"] for r in kept.collect()) == [1, 4, 5, 6]
    # exact-duplicate timestamps collapse to the lowest event_id
    dup_rows = [(10, 1, "C", t0), (11, 1, "C", t0)]
    dup = spark.createDataFrame(
        dup_rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept_dup = debounce(
        dup, keys=("user_id", "event_type"), ts="ts",
        lag_seconds=1800, order_tiebreak="event_id",
    )
    assert [r["event_id"] for r in kept_dup.collect()] == [10]


_HAS_PROTOBUF = __import__("importlib.util", fromlist=["util"]).find_spec(
    "google"
) is not None and __import__("importlib.util", fromlist=["util"]).find_spec(
    "google.protobuf"
) is not None


def test_transform_with_state_smoke(spark, tmp_path):
    """transformWithStateInPandas (SURVEY §2.8 stretch — the typed-state
    ValueState API): per-key running count/sum across two micro-batches,
    RocksDB state store. The streaming Python worker speaks a protobuf wire
    protocol; the ``protobuf`` package is ABSENT in this container (probed
    r2/r5/r8, re-probed r9 2026-08-14 — ``google`` namespace missing
    entirely while the StatefulProcessor API itself imports fine), so the
    body executes for real the moment the dependency appears and skips with
    the probe result until then. The supported arbitrary-stateful path here
    remains applyInPandasWithState (test_stateful_running_totals...)."""
    import pytest as _pytest

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (0, 0.0)
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    if not _HAS_PROTOBUF:
        _pytest.skip(
            "transformWithStateInPandas needs the protobuf wire protocol; "
            "google.protobuf absent in this container (re-probed r9)"
        )

    src = str(tmp_path / "tws_src")
    now = time.time()
    b1 = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double")
    b2 = spark.createDataFrame([(1, 2.5), (3, 7.0)], "user_id long, value double")
    for name, df, mt in [("b1", b1, now - 20), ("b2", b2, now - 10)]:
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    old_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_stream(spark, f"{src}/*", "user_id long, value double")
        out = stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
        q = memory_sink(out, "tws_totals", output_mode="update", available_now=True)
        assert q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM tws_totals").collect()
        updates = {(r["user_id"], r["n_events"], r["total_value"]) for r in rows}
        assert (1, 3, 17.5) in updates  # state carried across batches
        assert (2, 1, 1.0) in updates and (3, 1, 7.0) in updates
    finally:
        if old_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old_provider)


def test_streaming_heavy_hitters_contract_across_batches(spark, tmp_path):
    """Misra-Gries state carried across micro-batches: after replaying two
    batches, each key's final summary obeys est <= true <= est + err
    against exact counts, and a dominant item (> err) must survive. k=2
    with 5 distinct items per key forces real pruning."""
    from collections import Counter

    from savio_training_dask_2019_spark.streaming import streaming_heavy_hitters

    src = str(tmp_path / "hh_src")
    now = time.time()
    # key 1: 'A' dominates; key 2: balanced tail
    b1 = [(1, t) for t in ["A"] * 6 + ["B", "C", "D", "E"]] + [
        (2, t) for t in ["X", "Y", "Z"] * 2
    ]
    b2 = [(1, t) for t in ["A"] * 5 + ["B", "B", "C"]] + [(2, "X")] * 3
    true = {k: Counter() for k in (1, 2)}
    for k, t in b1 + b2:
        true[k][t] += 1
    for name, rows, mt in [("b1", b1, now - 20), ("b2", b2, now - 10)]:
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    stream = file_stream(spark, f"{src}/*", "user_id long, event_type string")
    q = memory_sink(
        streaming_heavy_hitters(stream, "user_id", "event_type", k=2),
        "hh_stream",
        output_mode="update",
        available_now=True,
    )
    assert q.awaitTermination(120)

    # keep each key's LAST summary: batch id not exposed, so reconstruct by
    # taking, per (key, item), the row with max est and the max err per key
    rows = spark.sql("SELECT * FROM hh_stream").collect()
    last_err = {}
    for r in rows:
        last_err[r["user_id"]] = max(last_err.get(r["user_id"], 0), r["err"])
    final = {}
    for r in rows:
        if r["err"] == last_err[r["user_id"]]:
            final.setdefault(r["user_id"], {})[r["item"]] = r["est"]
    for key, summary in final.items():
        err = last_err[key]
        assert len(summary) <= 2  # k bound on state
        for item, est in summary.items():
            t = true[key][item]
            assert est <= t <= est + err, (key, item, est, t, err)
        # dominant-item survival: A (11) for key 1, X (9) for key 2
        dom = {1: "A", 2: "X"}[key]
        if true[key][dom] > err:
            assert dom in summary, (key, summary, err)
    assert final[1].get("A", 0) >= 1 and final[2].get("X", 0) >= 1


def test_streaming_heavy_hitters_string_group_key(spark, tmp_path):
    """The group-key column type is inferred from the stream schema (r9
    review: it was hardcoded long, breaking any non-long key)."""
    from savio_training_dask_2019_spark.streaming import streaming_heavy_hitters

    src = str(tmp_path / "hh_str_src")
    df = spark.createDataFrame(
        [("us", "A"), ("us", "A"), ("us", "B"), ("eu", "C")],
        "country string, token string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    stream = file_stream(spark, f"{src}/*", "country string, token string")
    q = memory_sink(
        streaming_heavy_hitters(stream, "country", "token", k=4),
        "hh_str", output_mode="update", available_now=True,
    )
    assert q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh_str").collect()
    got = {(r["country"], r["item"]): r["est"] for r in rows}
    assert got == {("us", "A"): 2, ("us", "B"): 1, ("eu", "C"): 1}


def test_drift_monitor_foreach_batch_trailing_reference(spark, tmp_path):
    """Streaming drift monitor (foreachBatch): per-batch PSI vs the
    trailing ref_batches reference, hand-computed — batch 0 has no
    baseline (psi None), a flipped-mix batch scores the known PSI, the
    ring rolls off (batch 3's reference is batches 1+2 only with
    ref_batches=2), and a replayed batch_id is idempotently skipped."""
    import math
    import time as _time

    from savio_training_dask_2019_spark.streaming import (
        DriftMonitor,
        file_stream,
        foreach_batch_sink,
    )

    eps = 1e-6

    def term(pc, pr):
        pc, pr = max(pc, eps), max(pr, eps)
        return round((pc - pr) * math.log(pc / pr), 6)

    src = str(tmp_path / "drift_src")
    now = _time.time()

    def _write(name, rows, mtime):
        df = spark.createDataFrame(rows, "event_type string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        import os as _os

        for root, _dirs, files in _os.walk(f"{src}/{name}"):
            for f in files:
                _os.utime(_os.path.join(root, f), (mtime, mtime))

    _write("b0", [("x",)] * 8 + [("y",)] * 2, now - 40)   # 80/20
    _write("b1", [("x",)] * 2 + [("y",)] * 8, now - 30)   # 20/80
    _write("b2", [("z",)] * 5, now - 20)                  # new class only
    _write("b3", [("x",)] * 4, now - 10)                  # ref = b1+b2 only

    mon = DriftMonitor(item="event_type", ref_batches=2, eps=eps)
    q = foreach_batch_sink(file_stream(spark, f"{src}/*", "event_type string"), mon)
    assert q.awaitTermination(180), "stream did not finish in time"

    got = {bid: (psi, nc, nr) for bid, psi, nc, nr in mon.results}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == (None, 10, 0)  # no baseline yet -> no alarm
    # batch 1: cur (x .2, y .8) vs ref=b0 (x .8, y .2)
    want1 = round(term(0.2, 0.8) + term(0.8, 0.2), 4)
    assert got[1] == (want1, 10, 10)
    # batch 2: only new class z vs ref=b0+b1 (x .5, y .5)
    want2 = round(term(0.0, 0.5) + term(0.0, 0.5) + term(1.0, 0.0), 4)
    assert got[2] == (want2, 5, 20)
    # batch 3: the ring rolled b0 OFF -> ref=b1+b2 (x 2/15, y 8/15, z 5/15)
    want3 = round(
        term(1.0, 2 / 15) + term(0.0, 8 / 15) + term(0.0, 5 / 15), 4
    )
    assert got[3] == (want3, 4, 15)
    # per-class terms of the LAST batch are exposed for attribution
    assert mon.last_terms["x"] == term(1.0, 2 / 15)

    # recovery replay: re-running an already-seen batch_id must not
    # double-count into the reference ring or append a result
    n_results, ring_before = len(mon.results), list(mon._ring)
    mon(spark.createDataFrame([("x",)] * 99, "event_type string"), 3)
    assert len(mon.results) == n_results and list(mon._ring) == ring_before


def test_streaming_heavy_hitters_weighted_by_mass(spark, tmp_path):
    """Weighted streaming MG (parity with the batch weight_col, r10):
    heavy domains by token MASS across two micro-batches — est <= true
    weighted mass <= est + err, the dominant-mass domain survives, and
    zero-weight rows never occupy summary slots."""
    from collections import Counter

    from savio_training_dask_2019_spark.streaming import streaming_heavy_hitters

    src = str(tmp_path / "whh_src")
    now = time.time()
    # one monitor key; 'big.com' dominates by mass, not by row count
    b1 = [(1, "big.com", 500), (1, "tail1", 90), (1, "tail2", 80),
          (1, "tail3", 70), (1, "zero", 0)]
    b2 = [(1, "big.com", 400), (1, "tail1", 60), (1, "tail4", 50)]
    true = Counter()
    for _k, d, w in b1 + b2:
        true[d] += w
    for name, rows, mt in [("b1", b1, now - 20), ("b2", b2, now - 10)]:
        df = spark.createDataFrame(rows, "mon long, domain string, n_tok long")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    stream = file_stream(spark, f"{src}/*", "mon long, domain string, n_tok long")
    q = memory_sink(
        streaming_heavy_hitters(
            stream, "mon", "domain", k=2, weight_col="n_tok"
        ),
        "whh_stream",
        output_mode="update",
        available_now=True,
    )
    assert q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM whh_stream").collect()
    err = max(r["err"] for r in rows)
    final = {r["item"]: r["est"] for r in rows if r["err"] == err}
    assert len(final) <= 2
    assert "zero" not in {r["item"] for r in rows}
    for item, est in final.items():
        assert est <= true[item] <= est + err, (item, est, true[item], err)
    assert true["big.com"] > err and "big.com" in final


def test_psi_from_counts_properties():
    """Property pins for the shared PSI kernel (pure Python, classes-sized
    dicts): identity mixes score ~0, every eps-floored term is
    non-negative (both factors share sign), class-rename invariance,
    scale invariance of shares, and empty-side finiteness."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from savio_training_dask_2019_spark.streaming import psi_from_counts

    counts = st.dictionaries(
        st.sampled_from(list("abcdef")), st.integers(0, 10_000), max_size=6
    )

    @settings(max_examples=200, deadline=None)
    @given(cur=counts, ref=counts, scale=st.integers(2, 50))
    def check(cur, ref, scale):
        psi, terms = psi_from_counts(cur, ref)
        assert all(t >= 0 for t in terms.values())  # (pc-pr), ln share sign
        assert psi >= 0 and psi == round(sum(terms.values()), 4)
        assert set(terms) == {k for k in set(cur) | set(ref)}
        # identity: a mix scored against itself is (rounding-level) zero
        psi_id, _ = psi_from_counts(cur, cur)
        assert psi_id == 0
        # scale invariance: shares don't change when one side is scaled
        psi_s, _ = psi_from_counts({k: v * scale for k, v in cur.items()}, ref)
        assert abs(psi_s - psi) <= 2e-4  # term-level rounding at 1e-6
        import math

        assert math.isfinite(psi)

    check()


def test_streaming_count_min_accumulates_exactly(spark, tmp_path):
    """Streaming CMS (foreachBatch): the accumulated table after N
    micro-batches is BIT-IDENTICAL to a single batch build over the union
    (CMS merge = elementwise sum), estimates are overcount-only against
    exact stream totals, and a replayed batch_id is idempotently skipped."""
    from collections import Counter

    import numpy as np

    from savio_training_dask_2019_spark.operators.sketches import count_min_table
    from savio_training_dask_2019_spark.streaming import (
        StreamingCountMin,
        file_stream,
        foreach_batch_sink,
    )

    src = str(tmp_path / "cms_src")
    now = time.time()
    b1 = [("x",)] * 50 + [("y",)] * 10 + [("z",)] * 3
    b2 = [("x",)] * 20 + [("w",)] * 7
    b3 = [("y",)] * 30 + [("z",)] * 1
    true = Counter(t for batch in (b1, b2, b3) for (t,) in batch)
    for name, rows, mt in [("b1", b1, now - 30), ("b2", b2, now - 20), ("b3", b3, now - 10)]:
        df = spark.createDataFrame(rows, "tok string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    w, d = 256, 3
    acc = StreamingCountMin("tok", width=w, depth=d)
    q = foreach_batch_sink(file_stream(spark, f"{src}/*", "tok string"), acc)
    assert q.awaitTermination(180), "stream did not finish in time"
    assert acc.n_batches == 3

    # exact-merge property: accumulated == one build over the union
    union = spark.createDataFrame(b1 + b2 + b3, "tok string")
    batch_tab = np.zeros((d, w), dtype="int64")
    for r in count_min_table(union, "tok", width=w, depth=d).collect():
        batch_tab[r["d"]] = r["counts"]
    assert (acc.table == batch_tab).all()

    # overcount-only against the exact stream totals, at stream end
    est = acc.estimate(true.keys())
    assert all(est[t] >= c for t, c in true.items())

    # replay: re-running a seen batch_id must not change the table
    before = acc.table.copy()
    acc(spark.createDataFrame([("x",)] * 99, "tok string"), 2)
    assert (acc.table == before).all() and acc.n_batches == 3
    assert acc.estimate([]) == {}


def test_streaming_weighted_reservoir_exact_merge(spark, tmp_path):
    """Streaming ES reservoir: the sample after 3 micro-batches is
    BIT-IDENTICAL to the batch operator over the union (ES keys are
    per-row, so top-k over per-batch top-k's == top-k over the union);
    replay is idempotent; weight <= 0 never sampled."""
    from savio_training_dask_2019_spark.operators.sampling import (
        weighted_sample_exact,
    )
    from savio_training_dask_2019_spark.streaming import (
        StreamingWeightedReservoir,
        file_stream,
        foreach_batch_sink,
    )

    src = str(tmp_path / "res_src")
    now = time.time()
    b1 = [(i, (i % 7) * 10 + 5) for i in range(0, 40)]
    b2 = [(i, (i % 5) * 25 + 1) for i in range(40, 80)]
    b3 = [(i, 3) for i in range(80, 100)] + [(999, 0), (998, -4)]
    for name, rows, mt in [("b1", b1, now - 30), ("b2", b2, now - 20), ("b3", b3, now - 10)]:
        df = spark.createDataFrame(rows, "doc_id long, w long")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mt, mt))

    k = 16
    acc = StreamingWeightedReservoir("doc_id", "w", k=k)
    q = foreach_batch_sink(file_stream(spark, f"{src}/*", "doc_id long, w long"), acc)
    assert q.awaitTermination(180), "stream did not finish in time"
    assert acc.n_batches == 3

    got = [d["doc_id"] for d in acc.sample()]
    assert len(got) == k
    assert 999 not in got and 998 not in got

    union = spark.createDataFrame(b1 + b2 + b3, "doc_id long, w long")
    from pyspark.sql import functions as F

    want = [
        r["doc_id"]
        for r in weighted_sample_exact(
            union.withColumn("__all", F.lit(1)), "__all", "doc_id", "w", k
        ).orderBy("rk").collect()
    ]
    assert got == want

    # replay: a seen batch_id must not change the sample
    before = acc.sample()
    acc(spark.createDataFrame([(5000, 10_000_000)], "doc_id long, w long"), 1)
    assert acc.sample() == before


def test_numeric_drift_monitor_foreach_batch_ks(spark, tmp_path):
    """Streaming KS drift monitor (foreachBatch): per-batch two-sample KS
    vs the trailing reference, hand-computed on frozen 8-wide bins — batch
    0 has no baseline (d None), an identical-mix batch scores 0.0, a
    fully shifted batch scores 1.0 with the argmax bucket naming the value
    region, the ring rolls off, and a replayed batch_id is skipped."""
    import time as _time

    from savio_training_dask_2019_spark.streaming import (
        NumericDriftMonitor,
        file_stream,
        foreach_batch_sink,
        ks_from_bin_counts,
    )

    # pure-function pin first: exact-integer cumulative shares
    assert ks_from_bin_counts({0: 8, 2: 2}, {0: 8, 2: 2}) == (0.0, 0)
    assert ks_from_bin_counts({12: 10}, {0: 16, 2: 4}) == (1.0, 2)
    assert ks_from_bin_counts({}, {0: 1}) == (0.0, None)

    src = str(tmp_path / "ksdrift_src")
    now = _time.time()

    def _write(name, vals, mtime):
        df = spark.createDataFrame([(float(v),) for v in vals], "value double")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        import os as _os

        for root, _dirs, files in _os.walk(f"{src}/{name}"):
            for f in files:
                _os.utime(_os.path.join(root, f), (mtime, mtime))

    _write("b0", [4.0] * 8 + [20.0] * 2, now - 40)   # bins {0:8, 2:2}
    _write("b1", [4.0] * 8 + [20.0] * 2, now - 30)   # identical mix
    _write("b2", [100.0] * 10, now - 20)             # bin 12 only
    _write("b3", [4.0] * 4, now - 10)                # ref = b1+b2 only

    mon = NumericDriftMonitor(value="value", bin_width=8.0, n_bins=64, ref_batches=2)
    q = foreach_batch_sink(file_stream(spark, f"{src}/*", "value double"), mon)
    assert q.awaitTermination(180), "stream did not finish in time"

    got = {bid: rest for bid, *rest in mon.results}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == [None, None, 10, 0]      # no baseline yet
    assert got[1] == [0.0, 0, 10, 10]         # identical mix
    assert got[2] == [1.0, 2, 10, 20]         # disjoint support, argmax bin 2
    # b3: ref = b1+b2 = {0:8, 2:2, 12:10}; cur = {0:4}
    # cum diffs: bin0 |1 - 8/20| = .6, bin2 |1 - 10/20| = .5, bin12 0
    assert got[3] == [0.6, 0, 4, 20]

    n_results, ring_before = len(mon.results), list(mon._ring)
    mon(spark.createDataFrame([(999.0,)], "value double"), 3)  # replay
    assert len(mon.results) == n_results and list(mon._ring) == ring_before


def test_streaming_twap_exact_merge_and_order_guard(spark, sf_dir):
    """StreamingTwap: after 3 event-time-split micro-batches over the
    fixture events, every key's (n_events, wsum, dsum) is EXACTLY the
    batch query's; a replayed batch_id is skipped; an out-of-order batch
    raises instead of corrupting the sums."""
    import pytest

    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.queries.timeseries import q_twap
    from savio_training_dask_2019_spark.sources import load_table
    from savio_training_dask_2019_spark.streaming import StreamingTwap

    e = load_table(spark, sf_dir, "events")
    cut1, cut2 = "2024-01-10", "2024-01-20"
    batches = [
        e.where(F.col("ts") < cut1),
        e.where((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
        e.where(F.col("ts") >= cut2),
    ]
    acc = StreamingTwap()
    for i, b in enumerate(batches):
        acc(b, batch_id=i)
    got = acc.result()

    want = {r["event_type"]: r for r in q_twap(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k, g in got.items():
        wr = want[k]
        assert g["n_events"] == wr["n_events"], k
        assert g["wsum"] == wr["wsum"], k
        assert g["dsum"] == wr["dsum"], k
        assert g["twap"] == wr["twap"], k

    # replay: same batch_id is idempotently skipped
    before = {k: dict(v) for k, v in acc.result().items()}
    acc(batches[1], batch_id=1)
    assert acc.result() == before

    # out-of-order: a batch starting before a key's last event raises
    with pytest.raises(ValueError, match="out-of-order"):
        acc(batches[0], batch_id=99)


def test_streaming_ann_ingest_composition(spark, tmp_path):
    """StreamingAnnIngest (VERDICT r11 #4): bloom dedup → cell assign →
    ANN match composed in one foreachBatch pipeline over a file-replay
    stream. Pins: per-batch ingest reports (snapshot dup, CROSS-BATCH dup
    via the admitted read-back, intra-batch keep-first), the planted
    near-dup's top-1 ANN match, per-batch idempotent outputs, and
    replayed-batch_id skip."""
    import time as _time

    from savio_training_dask_2019_spark.streaming import (
        StreamingAnnIngest,
        file_stream,
        foreach_batch_sink,
    )

    # existing corpus: 6 vectors split between two well-separated cells
    corpus = spark.createDataFrame(
        [
            (100, [1.0, 0.0, 0.0, 0.0]),
            (101, [0.9, 0.1, 0.0, 0.0]),
            (102, [0.8, 0.0, 0.1, 0.0]),
            (103, [0.0, 1.0, 0.0, 0.0]),
            (104, [0.0, 0.9, 0.1, 0.0]),
            (105, [0.1, 0.8, 0.0, 0.0]),
        ],
        "doc_id long, vec array<double>",
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid int, ce array<double>",
    )
    snapshot = spark.createDataFrame(
        [(9000, "known historical doc")], "doc_id long, text string"
    )

    src = str(tmp_path / "ann_src")
    now = _time.time()
    schema = "doc_id long, text string, vec array<double>"

    def wbatch(name, rows, mtime):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # batch 0: one novel doc planted next to corpus 101, one snapshot dup
    wbatch(
        "b1",
        [
            (1, "fresh alpha", [0.9, 0.1, 0.0, 0.0]),
            (2, "known historical doc", [0.0, 0.0, 1.0, 0.0]),
        ],
        now - 30,
    )
    # batch 1: novel; cross-batch dup of doc 1; intra-batch dup pair
    wbatch(
        "b2",
        [
            (3, "fresh beta", [0.0, 1.0, 0.0, 0.0]),
            (4, "fresh alpha", [0.5, 0.5, 0.0, 0.0]),
            (5, "fresh gamma", [0.7, 0.3, 0.0, 0.0]),
            (6, "fresh gamma", [0.7, 0.3, 0.0, 0.0]),
        ],
        now - 20,
    )

    out = str(tmp_path / "ann_out")
    handle = StreamingAnnIngest(
        snapshot, corpus, centroids, out, k=2, nprobe=2
    )
    stream = file_stream(spark, f"{src}/*", schema)
    q = foreach_batch_sink(stream, handle)
    assert q.awaitTermination(180), "stream did not finish in time"

    reps = {r["batch_id"]: r for r in handle.reports}
    assert reps[0] == {
        "batch_id": 0, "n_batch": 2, "n_known": 1, "n_dup": 0, "n_admitted": 1,
    }
    assert reps[1] == {
        "batch_id": 1, "n_batch": 4, "n_known": 1, "n_dup": 1, "n_admitted": 2,
    }

    admitted = sorted(
        r["doc_id"]
        for r in spark.read.parquet(*(f"{out}/admitted/batch={b}" for b in (0, 1))).collect()
    )
    assert admitted == [1, 3, 5]

    matches = spark.read.parquet(
        *(f"{out}/matches/batch={b}" for b in (0, 1))
    ).collect()
    assert len(matches) == 3 * 2  # 3 admitted docs × k=2
    top = {}
    for r in matches:
        cur = top.get(r["query_id"])
        if cur is None or (r["cosine"], -r["corpus_id"]) > (cur[1], -cur[0]):
            top[r["query_id"]] = (r["corpus_id"], r["cosine"])
    assert top[1][0] == 101 and top[1][1] > 0.999  # planted near-dup
    assert top[3][0] == 103  # exact centroid-1 match

    # recovery replay: same batch_id again must change nothing
    n_reports = len(handle.reports)
    handle(spark.createDataFrame([(7, "x", [0.0] * 4)], schema), batch_id=1)
    assert len(handle.reports) == n_reports
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted/batch=1").collect()
    ) == [3, 5]


def test_streaming_ann_ingest_empty_batch(spark, tmp_path):
    """An empty micro-batch must produce a zero report and empty (but
    readable) per-batch outputs — not a crash; the next real batch is
    unaffected."""
    from savio_training_dask_2019_spark.streaming import StreamingAnnIngest

    corpus = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], "doc_id long, vec array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, ce array<double>"
    )
    snapshot = spark.createDataFrame([(9, "known")], "doc_id long, text string")
    out = str(tmp_path / "out")
    handle = StreamingAnnIngest(snapshot, corpus, centroids, out, k=1, nprobe=1)

    schema = "doc_id long, text string, vec array<double>"
    handle(spark.createDataFrame([], schema), batch_id=0)
    assert handle.reports[0] == {
        "batch_id": 0, "n_batch": 0, "n_known": 0, "n_dup": 0, "n_admitted": 0,
    }
    assert spark.read.parquet(f"{out}/admitted/batch=0").count() == 0
    assert spark.read.parquet(f"{out}/matches/batch=0").count() == 0

    handle(
        spark.createDataFrame([(1, "fresh", [0.9, 0.1])], schema), batch_id=1
    )
    assert handle.reports[1]["n_admitted"] == 1
    [m] = spark.read.parquet(f"{out}/matches/batch=1").collect()
    assert m["corpus_id"] == 100
    # the empty batch contributed no path to the cross-batch anti-join
    # re-read (ADVICE r12): only batch 1's non-empty admitted write is kept
    assert handle._admitted_paths == [f"{out}/admitted/batch=1"]


def test_streaming_ann_ingest_failed_batch_replays_in_full(spark, tmp_path):
    """ADVICE r12 (medium): a batch whose write throws mid-processing must
    NOT be marked seen — the recovery replay of the same batch_id
    re-processes it in full (idempotent per-batch overwrite paths), so its
    admitted hashes and ANN matches are not silently lost."""
    import pytest

    from savio_training_dask_2019_spark.operators import similarity
    from savio_training_dask_2019_spark.streaming import StreamingAnnIngest

    corpus = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], "doc_id long, vec array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, ce array<double>"
    )
    snapshot = spark.createDataFrame([(9, "known")], "doc_id long, text string")
    out = str(tmp_path / "out")
    handle = StreamingAnnIngest(snapshot, corpus, centroids, out, k=1, nprobe=1)

    schema = "doc_id long, text string, vec array<double>"
    batch = spark.createDataFrame([(1, "fresh", [0.9, 0.1])], schema)

    real = similarity.cell_knn_join
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated mid-batch sink failure")
        return real(*args, **kwargs)

    similarity.cell_knn_join = flaky
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            handle(batch, batch_id=0)
        # failed batch left no durable driver state behind
        assert handle.reports == []
        assert handle._admitted_paths == []
        assert 0 not in handle._seen
        # recovery replay of the SAME batch_id processes it in full
        handle(batch, batch_id=0)
    finally:
        similarity.cell_knn_join = real

    assert handle.reports[0]["n_admitted"] == 1
    assert 0 in handle._seen
    [m] = spark.read.parquet(f"{out}/matches/batch=0").collect()
    assert m["corpus_id"] == 100
    # and a completed-batch replay still skips
    handle(batch, batch_id=0)
    assert len(handle.reports) == 1


def test_streaming_ann_ingest_compaction_bounds_rescan(spark, tmp_path):
    """``compact_every`` folds admitted hashes into the snapshot set + a
    rebuilt Bloom and clears the path list (ADVICE r12): the per-batch
    anti-join re-read stays O(compact_every) paths, and docs admitted
    BEFORE the compaction are still recognized as duplicates after it."""
    from savio_training_dask_2019_spark.streaming import StreamingAnnIngest

    corpus = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], "doc_id long, vec array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, ce array<double>"
    )
    snapshot = spark.createDataFrame([(9, "known")], "doc_id long, text string")
    out = str(tmp_path / "out")
    handle = StreamingAnnIngest(
        snapshot, corpus, centroids, out, k=1, nprobe=1, compact_every=2
    )

    schema = "doc_id long, text string, vec array<double>"
    handle(spark.createDataFrame([(1, "alpha", [0.9, 0.1])], schema), batch_id=0)
    assert len(handle._admitted_paths) == 1
    handle(spark.createDataFrame([(2, "beta", [0.1, 0.9])], schema), batch_id=1)
    # second non-empty batch hit compact_every=2 → paths folded + cleared
    assert handle._admitted_paths == []
    # a re-sent copy of a COMPACTED doc is caught via the snapshot set now
    handle(spark.createDataFrame([(3, "alpha", [0.5, 0.5])], schema), batch_id=2)
    assert handle.reports[2] == {
        "batch_id": 2, "n_batch": 1, "n_known": 1, "n_dup": 0, "n_admitted": 0,
    }
    # nothing admitted in batch 2 → still no paths
    assert handle._admitted_paths == []


def test_streaming_ann_ingest_rate_source_end_to_end(spark, tmp_path):
    """VERDICT r12 #8: StreamingAnnIngest under a REAL streaming runtime —
    a ``rate-micro-batch`` readStream with a checkpointLocation and
    Trigger.AvailableNow, not a hand-called foreachBatch. Pins the
    streaming-runtime wiring: the query terminates, the handle sees the
    checkpointed batch_id, per-batch outputs land, and a RESTART from the
    same checkpoint resumes at the next offset (values 8..15) whose texts
    all dedup against batch 0's admitted hashes."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.streaming import StreamingAnnIngest

    corpus = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], "doc_id long, vec array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, ce array<double>"
    )
    snapshot = spark.createDataFrame([(9, "known")], "doc_id long, text string")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    handle = StreamingAnnIngest(snapshot, corpus, centroids, out, k=1, nprobe=1)

    def rate_docs():
        # values v → 4 distinct texts per 8-row batch (intra-batch dups)
        return (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 8)
            .option("numPartitions", 2)
            .load()
            .select(
                F.col("value").alias("doc_id"),
                F.concat(F.lit("doc-"), (F.col("value") % 4).cast("string")).alias(
                    "text"
                ),
                F.array(
                    ((F.col("value") % 2) == 0).cast("double"),
                    ((F.col("value") % 2) == 1).cast("double"),
                ).alias("vec"),
            )
        )

    q = (
        rate_docs()
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "rate-source query did not finish"
    assert handle.reports[0] == {
        "batch_id": 0, "n_batch": 8, "n_known": 0, "n_dup": 4, "n_admitted": 4,
    }
    assert spark.read.parquet(f"{out}/admitted/batch=0").count() == 4
    assert spark.read.parquet(f"{out}/matches/batch=0").count() == 4  # k=1

    # restart from the SAME checkpoint: the runtime resumes at batch 1
    # (values 8..15) — same 4 texts, all cross-batch duplicates now
    q2 = (
        rate_docs()
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "restarted query did not finish"
    # every row's hash was admitted in batch 0 → all 8 are prior-known
    assert handle.reports[1] == {
        "batch_id": 1, "n_batch": 8, "n_known": 8, "n_dup": 0, "n_admitted": 0,
    }


def test_streaming_embedding_drift_exact_merge_and_alarm(spark):
    """StreamingEmbeddingDrift: (1) EXACT merge — the running centroid
    after any batch split is bit-identical to one batch over the union
    (integer sums merge associatively); (2) the drift alarm — batches
    drawn from the snapshot's own distribution score ~1.0, an orthogonal
    batch scores ~0.0 and drags the running cosine down; (3) replayed
    batch_ids and empty batches are no-ops that still record."""
    from savio_training_dask_2019_spark.streaming import StreamingEmbeddingDrift

    def vecs(rows):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)], "id long, embedding array<double>"
        )

    snapshot = vecs([[1.0, 0.0, 0.0], [0.9, 0.1, 0.0], [0.8, 0.2, 0.0]])
    b1 = [[1.0, 0.0, 0.0], [0.8, 0.0, 0.2]]
    b2 = [[0.9, 0.1, 0.0]]
    ortho = [[0.0, 0.0, 1.0], [0.0, 0.0, 0.9]]

    # split replay
    h = StreamingEmbeddingDrift(snapshot)
    h(vecs(b1), 0)
    h(vecs(b2), 1)
    split_running = h.results[-1][3]
    assert h.results[0][2] is not None and h.results[0][2] > 0.98

    # single-batch union — running cosine must be BIT-identical
    h2 = StreamingEmbeddingDrift(snapshot)
    h2(vecs(b1 + b2), 0)
    assert h2.results[0][3] == split_running

    # orthogonal batch: its own cosine ~0, running cosine drops
    h(vecs(ortho), 2)
    bid, n, batch_cos, run_cos = h.results[-1]
    assert (bid, n) == (2, 2)
    assert batch_cos < 0.05
    assert run_cos < split_running

    # replayed id: no state change, no new row
    n_res, run_before = len(h.results), h.results[-1][3]
    h(vecs([[5.0, 5.0, 5.0]]), 2)
    assert len(h.results) == n_res and h.results[-1][3] == run_before

    # empty batch records (id, 0, None, running-unchanged)
    h(vecs([]) if False else spark.createDataFrame([], "id long, embedding array<double>"), 3)
    assert h.results[-1][:3] == (3, 0, None)
    assert h.results[-1][3] == run_before

    # empty snapshot refuses
    import pytest

    with pytest.raises(ValueError, match="snapshot"):
        StreamingEmbeddingDrift(
            spark.createDataFrame([], "id long, embedding array<double>")
        )


def test_streaming_embedding_drift_matches_batch_query_discipline(spark, tmp_path):
    """The monitor's running centroid-vs-reference cosine over the
    fixture's 'current' half, with the 'reference' half as snapshot,
    reproduces q_embedding_drift's centroid_cosine at the same SF — the
    equality-to-batch pin tying the streaming twin to the oracle-checked
    batch query."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.queries.vectorops import q_embedding_drift
    from savio_training_dask_2019_spark.sources import load_table
    from savio_training_dask_2019_spark.streaming import StreamingEmbeddingDrift

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    ref = emb.where(F.col("vec_id") % 2 == 0).select("embedding")
    cur = emb.where(F.col("vec_id") % 2 == 1).select("embedding")

    h = StreamingEmbeddingDrift(ref)
    # replay the current half as two micro-batches (vec_id % 4 splits it)
    emb_cur = load_table(spark, sf, "embeddings").where(F.col("vec_id") % 2 == 1)
    h(emb_cur.where(F.col("vec_id") % 4 == 1).select("embedding"), 0)
    h(emb_cur.where(F.col("vec_id") % 4 == 3).select("embedding"), 1)
    [batch_row] = q_embedding_drift(spark, sf).collect()
    assert h.results[-1][3] == batch_row["centroid_cosine"]


def test_streaming_cusum_equals_batch_query(spark, tmp_path):
    """StreamingCusum: (1) the post-batch readout over ANY batch split
    equals q_changepoint_cusum over the concatenated stream (integer
    cell merge is associative); (2) a same-day cell arriving across two
    batches must SUM, not overwrite; (3) replayed batch_ids and empty
    batches are no-ops that still leave a correct readout."""
    import pandas as pd

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_changepoint_cusum,
    )
    from savio_training_dask_2019_spark.streaming import StreamingCusum

    def events(rows, start=0):
        return spark.createDataFrame(
            [
                (start + i, pd.Timestamp(ts).to_pydatetime(), 1, et, float(v))
                for i, (ts, et, v) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double",
        )

    b1 = [
        ("2024-01-01 05:00", "click", 0.00),
        ("2024-01-02 05:00", "click", 0.00),
        ("2024-01-03 05:00", "click", 0.00),
        ("2024-01-04 05:00", "click", 4.00),
    ]
    b2 = [
        ("2024-01-04 06:00", "click", 6.00),  # same day as b1's last: SUM
        ("2024-01-05 05:00", "click", 10.00),
        ("2024-01-06 05:00", "click", 10.00),
        ("2024-01-06 07:00", "view", 3.25),
    ]

    h = StreamingCusum()
    h(events(b1), 0)
    h(events(b2, start=100), 1)
    h(events(b2, start=100), 1)  # replay: idempotent skip
    h(events([], start=200), 2)  # empty batch: unchanged readout

    # batch twin over the concatenated stream
    pd.DataFrame(
        {
            "event_id": range(len(b1) + len(b2)),
            "ts": [pd.Timestamp(ts) for ts, _, _ in b1 + b2],
            "user_id": 1,
            "event_type": [et for _, et, _ in b1 + b2],
            "value": [float(v) for _, _, v in b1 + b2],
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    want = sorted(
        (
            r["event_type"],
            r["n_days"],
            (pd.Timestamp(r["cp_date"]) - pd.Timestamp("1970-01-01")).days,
            r["cusum_dollars"],
        )
        for r in q_changepoint_cusum(spark, str(tmp_path)).collect()
    )
    assert h.results[-1] == want
    assert h.results[-1] == h.results[-2]  # empty batch changed nothing
    assert len(h.results) == 3  # replayed id recorded nothing
    # the planted shift lands on day 3 with max|S| = 15 dollars
    click = [r for r in h.results[-1] if r[0] == "click"][0]
    assert click[1] == 6 and click[3] == 15.0
