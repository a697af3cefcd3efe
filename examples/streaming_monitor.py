#!/usr/bin/env python
"""Streaming ingest monitoring — the foreachBatch accumulator family over
ONE replayed micro-batch stream (SCALING.md streaming rows):

    PYTHONPATH=. python examples/streaming_monitor.py [workdir]

One stream of (event_type, domain, n_tok) ingest records drives four
monitors simultaneously, each the bounded-driver-state shape:

  DriftMonitor              — per-batch PSI of the event-type mix vs a
                              trailing reference ring (O(classes·ref) ints
                              on the driver; distributed groupBy per batch)
  NumericDriftMonitor       — per-batch two-sample KS of the n_tok CDF on
                              frozen-width bins vs the same trailing-ring
                              shape (O(bins·ref) driver ints)
  StreamingCountMin         — point frequencies over everything seen so
                              far, O(depth·width) driver table; per-batch
                              tables build DISTRIBUTED and fold by
                              elementwise sum (exact merge)
  StreamingWeightedReservoir— running top-k domains by token mass
                              (Efraimidis-Spirakis keys; per-batch top-k
                              DISTRIBUTED, O(k) driver state, union-exact)

The fifth member — per-key heavy hitters via applyInPandasWithState
(`streaming_heavy_hitters`) — lives in the stateful-UDF wiring instead of
foreachBatch; see tests/test_streaming.py for its replayed twin.

All four handles skip replayed batch_ids, so recovery re-runs are
idempotent. The demo replays three parquet micro-batches with a planted
mix flip in batch 2 (the drift alarm must fire) and a dominant domain by
token mass (the reservoir must keep it).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main(workdir: str | None = None) -> None:
    from savio_training_dask_2019_spark.session import get_spark
    from savio_training_dask_2019_spark.streaming import (
        DriftMonitor,
        NumericDriftMonitor,
        StreamingCountMin,
        StreamingWeightedReservoir,
        file_stream,
        foreach_batch_sink,
    )

    spark = get_spark(app_name="streaming-monitor")
    workdir = workdir or tempfile.mkdtemp(prefix="stream_monitor_")
    src = os.path.join(workdir, "ingest")
    now = time.time()

    # three micro-batches: steady mix, steady mix, FLIPPED mix (drift);
    # big.com dominates token mass throughout without dominating row count
    batches = [
        [("page", "big.com", 9000)] * 2
        + [("page", f"site{i}.net", 40) for i in range(8)]
        + [("click", "big.com", 7000)],
        [("page", "big.com", 8000)] * 2
        + [("page", f"blog{i}.org", 35) for i in range(8)]
        + [("click", "small.io", 30)],
        # mix flips to clicks AND token counts move to a previously-unseen
        # bin (the numeric CDF shift the KS monitor watches)
        [("click", f"ad{i}.biz", 120) for i in range(9)]
        + [("page", "big.com", 8500)],
    ]
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_type string, domain string, n_tok long"
        )
        path = os.path.join(src, f"b{b}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        mtime = now - 30 + 10 * b  # replay order = mtime order
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    drift = DriftMonitor(item="event_type", ref_batches=2)
    # the KS twin watches the NUMERIC side of the same stream: batch 2's
    # 120-token ads land in a bin the reference never populated, shifting
    # the n_tok CDF even where the categorical mix alone might not alarm
    ksdrift = NumericDriftMonitor(value="n_tok", bin_width=100.0, n_bins=16,
                                  ref_batches=2)
    cms = StreamingCountMin("domain", width=256, depth=3)
    reservoir = StreamingWeightedReservoir("domain", "n_tok", k=5)

    def monitor(batch_df, batch_id):
        batch_df = batch_df.cache()  # four consumers per micro-batch
        drift(batch_df, batch_id)
        ksdrift(batch_df, batch_id)
        cms(batch_df, batch_id)
        reservoir(batch_df, batch_id)
        batch_df.unpersist()

    stream = file_stream(
        spark, f"{src}/*", "event_type string, domain string, n_tok long"
    )
    q = foreach_batch_sink(stream, monitor)
    assert q.awaitTermination(180), "stream did not finish in time"

    print("drift monitor (batch_id, psi, n_cur, n_ref):")
    for bid, psi, n_cur, n_ref in drift.results:
        tag = ""
        if psi is not None and psi > 0.25:
            tag = "  <-- SHIFTED (alert band > 0.25)"
        print(f"  b{bid}: psi={psi if psi is None else round(psi, 4)} "
              f"cur={n_cur} ref={n_ref}{tag}")
    # the planted flip must alarm: batch 2 is click-only vs a page-heavy ref
    flagged = [psi for _bid, psi, _c, _r in drift.results if psi and psi > 0.25]
    assert flagged, "planted mix flip did not alarm"

    print("KS drift monitor (batch_id, D, argmax_bucket, n_cur, n_ref):")
    for bid, d, arg, n_cur, n_ref in ksdrift.results:
        tag = "  <-- SHIFTED (D > 0.5)" if d is not None and d > 0.5 else ""
        print(f"  b{bid}: D={d} argmax_bucket={arg} cur={n_cur} ref={n_ref}{tag}")
    ks_flagged = [d for _b, d, _a, _c, _r in ksdrift.results if d and d > 0.5]
    assert ks_flagged, "planted n_tok CDF shift did not alarm"

    est = cms.estimate(["big.com", "small.io", "never-seen.example"])
    print(f"count-min: big.com>={est['big.com']} occurrences, "
          f"small.io>={est['small.io']}, unseen~{est['never-seen.example']}")
    assert est["big.com"] >= 5  # 5 true occurrences, overcount-only

    top = reservoir.sample()
    print("weighted reservoir (top domains by token mass):",
          [d["domain"] for d in top])
    assert top and top[0]["domain"] == "big.com", "dominant mass must lead"
    print("streaming monitor complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
