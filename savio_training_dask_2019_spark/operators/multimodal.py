"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``BinaryType`` payloads + typed ``StructType`` metadata, with decode /
feature-extract / resize / frame-sample as Arrow-batched Python ops.

The Spark-side plumbing — schemas, binary packing, mapInPandas batch shape,
partition behavior — is REAL and tested. The codec layer is STUBBED: this
container has no image/audio libraries, so ``decode_meta`` uses a
clearly-marked deterministic fake "codec" (pure arithmetic on the payload
bytes) and the pixel-level ops raise ``NotImplementedError`` until a real
backend (PIL/ffmpeg) is injected. Swapping in a real codec changes ONE
function body and none of the distributed plumbing.

At 100 TB: payloads ride in parquet binary columns next to their metadata;
decode runs as a narrow ``mapInPandas`` over the scan (no shuffle), and
``spark.sql.files.maxPartitionBytes`` controls batch memory. Feature vectors
produced here feed the similarity/dedup operators directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Sidecar metadata schema carried next to every binary payload column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("uri", StringType()),
    ]
)


def pack_payload(df: DataFrame, src_col: str, mime: str, id_col: str) -> DataFrame:
    """Pack a source column into (id, payload BinaryType, meta struct).

    For fixtures the source is text (utf-8 bytes); in production the payload
    arrives pre-encoded from the ingestion layer — the downstream contract
    (binary + meta struct) is identical."""
    payload = F.encode(F.col(src_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("mem://"), F.col(id_col).cast("string")).alias("uri"),
        ).alias("meta"),
    )


def decode_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "id") -> DataFrame:
    """'Decode' each payload to (width, height, checksum) via mapInPandas.

    DETERMINISTIC FAKE CODEC (clearly marked): a real implementation would
    call PIL/libav here; the fake derives dimensions arithmetically from the
    payload bytes so the full Arrow round-trip stays testable and
    oracle-checkable. The batch shape, schema, and partitioning are exactly
    what a real decoder uses."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            p = pdf[payload_col]
            n = p.map(len).astype("int64")
            first = p.map(lambda b: b[0] if len(b) else 0).astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": (64 + (n % 577)).astype("int32"),
                    "height": (64 + ((n * 31 + first) % 577)).astype("int32"),
                    "checksum": (n * 2654435761 % (1 << 31)).astype("int64"),
                }
            )

    return df.mapInPandas(_decode, "id long, width int, height int, checksum long")


def resize_images(df: DataFrame, payload_col: str = "payload", size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB: pixel-level resize needs an image backend not present in this
    container (re-probed 2026-08-13 round 5: ``import PIL`` still fails;
    soundfile/cv2/av and the ffmpeg binary are also absent).
    The signature + schema are final; only the body is pending."""
    raise NotImplementedError(
        "resize_images requires an image codec (PIL/opencv); inject a real "
        "backend into decode/resize — the mapInPandas plumbing is in place"
    )


def sample_frames(df: DataFrame, payload_col: str = "payload", every_ms: int = 1000) -> DataFrame:
    """STUB: video frame sampling needs ffmpeg/libav (not in container)."""
    raise NotImplementedError(
        "sample_frames requires a video backend (ffmpeg); the 1→N-rows "
        "mapInPandas contract is defined by decode_meta's pattern"
    )
