"""Structured Streaming layer (SURVEY.md §2.8 — capability extension; the
2019 Dask reference has no streaming engine, its time-series story is batch
resample/rolling).

Design rule: every windowed transformation here is written against a plain
DataFrame and works identically in batch and streaming mode — the batch twin
is what the DuckDB oracle checks (queries.timeseries), and the streaming
execution is smoke-tested in tests/test_streaming.py with file sources,
watermarks, and availableNow triggers.
"""

from .windows import (
    dedup_within_watermark,
    session_counts,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)
from .io import file_stream, foreach_batch_sink, memory_sink, rate_stream
from .ingest import StreamingAnnIngest, incremental_ingest
from .joins import interval_join
from .stateful import (
    DriftMonitor,
    NumericDriftMonitor,
    StreamingCountMin,
    StreamingCusum,
    StreamingEmbeddingDrift,
    StreamingTwap,
    StreamingWeightedReservoir,
    ks_from_bin_counts,
    psi_from_counts,
    running_totals,
    streaming_heavy_hitters,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "with_watermark",
    "dedup_within_watermark",
    "rate_stream",
    "file_stream",
    "foreach_batch_sink",
    "memory_sink",
    "running_totals",
    "streaming_heavy_hitters",
    "DriftMonitor",
    "NumericDriftMonitor",
    "StreamingCountMin",
    "StreamingCusum",
    "StreamingEmbeddingDrift",
    "StreamingTwap",
    "StreamingWeightedReservoir",
    "ks_from_bin_counts",
    "psi_from_counts",
    "interval_join",
    "StreamingAnnIngest",
    "incremental_ingest",
]
