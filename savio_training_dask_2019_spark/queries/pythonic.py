"""Python-boundary queries (SURVEY.md §2.11, §3.2): the dask ``apply`` /
``map_partitions`` / custom-``Aggregation`` / delayed-fan-out surfaces, each
expressed through Spark's Arrow-batched bridges (pandas_udf, applyInPandas,
mapInPandas, mapInArrow) — never row-at-a-time Python UDFs.

These are deliberately oracle-checked: each Python computation reproduces a
SQL-expressible result so the Arrow plumbing itself is what gets verified.
The multimodal query exercises BinaryType payload plumbing end-to-end.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources import load_table


def q_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Series→Series, Arrow-vectorized): token counts
    summed per language. pandas ``str.split()`` with no args drops empty
    tokens — identical semantics to functions.text.tokens."""

    @pandas_udf("int")
    def tok_count(s: pd.Series) -> pd.Series:
        return s.str.split().str.len().astype("int32")

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(tok_count("text")).cast("bigint").alias("total_tokens")
    )


_PANDAS_UDF_TOKENS_SQL = r"""
SELECT lang,
       CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang
"""


def q_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf — the dd.Aggregation(chunk/agg/finalize)
    equivalent: geometric mean of order totals per priority."""
    import numpy as np

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(geomean("o_totalprice"), 2).alias("geo_total")
    )


_GROUPED_AGG_PANDAS_SQL = """
SELECT o_orderpriority, round(exp(avg(ln(o_totalprice))), 2) AS geo_total
FROM orders GROUP BY o_orderpriority
"""


def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (dask groupby().apply): per-priority OLS
    slope of order total vs order date (in days). Oracle: regr_slope."""
    import numpy as np

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_orderdate"].astype("int64").to_numpy(dtype="float64") / (86400 * 1e9)
        y = pdf["o_totalprice"].to_numpy(dtype="float64")
        xc = x - x.mean()
        s = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
        return pd.DataFrame(
            {"o_orderpriority": [pdf["o_orderpriority"].iloc[0]], "slope": [round(s, 6)]}
        )

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").applyInPandas(
        slope, "o_orderpriority string, slope double"
    )


_APPLY_IN_PANDAS_SQL = """
SELECT o_orderpriority,
       -- + 0.0: a tiny-negative slope must not round to -0.0 (r17 slot fix)
       round(regr_slope(o_totalprice, epoch(o_orderdate) / 86400.0), 6) + 0.0 AS slope
FROM orders GROUP BY o_orderpriority
"""


def q_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_partitions: per-batch filter + derive in pandas (Arrow batches,
    1→N row contract)."""

    def high_value(batches):
        for pdf in batches:
            out = pdf[pdf["o_totalprice"] > 300000][["o_orderkey", "o_totalprice"]]
            # raw IEEE division — identical bits in pandas and the oracle
            out = out.assign(price_k=out["o_totalprice"] / 1000)
            yield out[["o_orderkey", "price_k"]]

    o = load_table(spark, sf_dir, "orders")
    return o.mapInPandas(high_value, "o_orderkey long, price_k double")


_MAP_IN_PANDAS_SQL = """
SELECT o_orderkey, o_totalprice / 1000 AS price_k
FROM orders WHERE o_totalprice > 300000
"""


def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_blocks: numpy-per-batch via mapInArrow — L2 norms of embeddings
    computed in float64 numpy (the dask.array block-math surface)."""

    def norms(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            vec_ids = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offsets)
            # fixture vectors are fixed-length; reshape is the fast path
            if len(widths) and (widths == widths[0]).all():
                mat = flat.reshape(len(widths), widths[0])
                out = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            else:  # ragged fallback
                out = np.array(
                    [np.sqrt((flat[s:e] ** 2).sum()) for s, e in zip(offsets, offsets[1:])]
                )
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(np.round(out, 5), type=pa.float64())],
                names=["vec_id", "l2"],
            )

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding").mapInArrow(norms, "vec_id long, l2 double")


_MAP_IN_ARROW_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2
FROM embeddings
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing end-to-end: pack text into a BinaryType
    payload column (standing in for image/audio bytes), then extract typed
    metadata (byte length, sha256) in a mapInPandas pass — the exact shape a
    real decode/feature-extract UDF takes. Real codec work is stubbed per
    operators.multimodal (no image/audio libs in this container)."""

    def extract_meta(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    d = load_table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return packed.mapInPandas(extract_meta, "doc_id long, byte_len long, sha string")


_MULTIMODAL_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha
FROM documents
"""


def q_fanout_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask.delayed / futures fan-out (SURVEY.md §3.2): embarrassingly
    parallel parameter sweep as a single no-shuffle stage over spark.range —
    deterministic integer math so the oracle is exact."""
    r = spark.range(0, 10000)
    return r.select(((F.col("id") * F.col("id")) % 97).alias("g")).agg(
        F.sum("g").alias("total"), F.count(F.lit(1)).alias("n_tasks")
    )


_FANOUT_COMPUTE_SQL = """
SELECT CAST(sum((i * i) % 97) AS BIGINT) AS total, count(*) AS n_tasks
FROM generate_series(0, 9999) t(i)
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: pack text → BinaryType payload + meta struct
    → Arrow-batched 'decode' (deterministic fake codec, operators.multimodal)
    → typed per-item features. The oracle replays the fake codec arithmetic,
    so the whole binary → mapInPandas → struct round-trip is hash-checked."""
    from ..operators.multimodal import decode_meta, pack_payload

    d = load_table(spark, sf_dir, "documents")
    packed = pack_payload(d, "text", "text/plain", "doc_id")
    return decode_meta(packed)


_MULTIMODAL_DECODE_SQL = """
SELECT doc_id AS id,
       CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
       -- first *UTF-8 byte* of the payload (not ascii()'s codepoint-of-first-
       -- char, which diverges on multibyte text): hex of byte 1 -> int
       CAST(64 + (octet_length(encode(text)) * 31
                  + CASE WHEN octet_length(encode(text)) = 0 THEN 0
                         ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INTEGER)
                    END) % 577 AS INTEGER) AS height,
       (octet_length(encode(text)) * 2654435761) % 2147483648 AS checksum
FROM documents
"""


def q_cogroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (SURVEY.md §2.11): customer ⋈ orders merged
    per key in pandas — the dask align-two-frames-by-key surface."""

    def merge(key, cpdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": [key[0]],
                "n_orders": [len(opdf)],
                "acctbal": [float(cpdf["c_acctbal"].iloc[0]) if len(cpdf) else None],
            }
        )

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(merge, "c_custkey long, n_orders long, acctbal double")
    )


_COGROUP_STATS_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders, min(c_acctbal) AS acctbal
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, SURVEY.md §2.11): 1→N row expansion of
    documents into (pos, token) rows via LATERAL — the bag.map().flatten()
    surface. Row-based (the slow path) by nature, so kept to a small slice;
    the vectorized equivalent is explode(tokens(...))."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenExpand:
        def eval(self, text: str):
            for i, tok in enumerate(text.split()):
                yield i, tok

    spark.udtf.register("token_expand", TokenExpand)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, u.pos, u.token FROM _udtf_docs d, LATERAL token_expand(d.text) u"
    )


_UDTF_TOKENS_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE doc_id < 50
), ex AS (
  SELECT doc_id, unnest([{'pos': i - 1, 'token': t[i]} FOR i IN range(1, len(t) + 1)]) AS u
  FROM toks
)
SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.token AS token FROM ex
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel tier end-to-end (SURVEY.md §2.12): synthesize raw8 image
    payloads from document text (fixture stand-in for a decoder's output),
    nearest-neighbor resize to 16×12 in numpy over mapInPandas, then
    aggregate per source dimension — (width, height, n_imgs, px_sum_total).
    Rows-only by contract: the resize kernel is integer index-sampling over
    binary buffers, not SQL-expressible; accuracy is pinned by the
    differential pytest against a pure-Python reference
    (tests/test_multimodal.py)."""
    from ..operators.multimodal import resize_images, synthesize_raw_images

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = synthesize_raw_images(d, "text", "doc_id")
    resized = resize_images(imgs, size=(16, 12))
    # group by SOURCE dims (from the synth table) to check the whole pipe
    src_dims = imgs.select("id", F.col("width").alias("src_w"), F.col("height").alias("src_h"))
    return (
        resized.join(src_dims, "id")
        .groupBy("src_w", "src_h")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.sum("px_sum").alias("px_sum_total"),
        )
        .orderBy("src_w", "src_h")
    )


def q_multimodal_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed twin of :func:`q_multimodal_resize`: run the SAME real
    pipeline (synthesize raw8 payloads → numpy nearest-neighbor resize over
    mapInPandas → join back to source dims) but project only the
    SQL-expressible outputs — source dimensions, image count per dimension
    group, and total resized payload bytes. The synth dims are closed-form
    in the utf-8 byte length (w = 16 + n % 17, h = 12 + 31n % 13,
    operators/multimodal.py synthesize_raw_images) and every resized
    payload is exactly 16*12 bytes, so DuckDB can recompute all three
    columns from ``strlen(text)`` alone — a driver-green check that the
    Python fan-out, dim propagation, and output buffer sizes are right.
    Only the pixel checksum (px_sum, not SQL-expressible) stays in the
    rows-only twin."""
    from ..operators.multimodal import resize_images, synthesize_raw_images

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = synthesize_raw_images(d, "text", "doc_id")
    resized = resize_images(imgs, size=(16, 12))
    src_dims = imgs.select("id", F.col("width").alias("src_w"), F.col("height").alias("src_h"))
    return (
        resized.join(src_dims, "id")
        .groupBy("src_w", "src_h")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.sum(F.octet_length("payload").cast("long")).alias("out_bytes"),
        )
        .orderBy("src_w", "src_h")
    )


_MULTIMODAL_DIMS_SQL = """
WITH n AS (SELECT strlen(text) AS b FROM documents)
SELECT CAST(16 + b % 17 AS INTEGER) AS src_w,
       CAST(12 + (b * 31) % 13 AS INTEGER) AS src_h,
       count(*) AS n_imgs,
       CAST(count(*) * 16 * 12 AS BIGINT) AS out_bytes
FROM n GROUP BY 1, 2 ORDER BY src_w, src_h
"""


def q_multimodal_imgstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature-extraction tier end-to-end (SURVEY.md §2.12):
    synthesize raw8 payloads, extract per-image normalization stats (mean,
    std) and an 8-bin intensity histogram as real numpy kernels over
    mapInPandas, then aggregate per source width — (src_w, n_imgs,
    avg_px_mean, avg_px_std, dark_bin_total = Σ histogram[0]). Rows-only
    by contract: the pixel math runs over binary buffers; accuracy is
    pinned by the differential pytest against a pure-Python reference
    (tests/test_multimodal.py)."""
    from ..operators.multimodal import image_features, synthesize_raw_images

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = synthesize_raw_images(d, "text", "doc_id")
    feats = image_features(imgs, n_bins=8)
    dims = imgs.select("id", F.col("width").alias("src_w"))
    return (
        feats.join(dims, "id")
        .groupBy("src_w")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.round(F.avg("px_mean"), 2).alias("avg_px_mean"),
            F.round(F.avg("px_std"), 2).alias("avg_px_std"),
            F.sum(F.element_at("hist", 1)).cast("long").alias("dark_bin_total"),
        )
        .orderBy("src_w")
    )


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio tier end-to-end (SURVEY.md §2.12): synthesize PCM16 payloads
    from document text (fixture stand-in for an audio decoder's output),
    extract frame-level RMS energy + zero-crossing rate as real numpy
    kernels over mapInPandas, then aggregate per duration bucket —
    (duration_bucket_ms, n_clips, n_frames_total, avg_rms, avg_zcr).
    Rows-only by contract: the signal math isn't SQL-expressible; accuracy
    is pinned by the differential pytest against a pure-Python reference
    (tests/test_multimodal.py). Structural columns (sample counts /
    durations) follow the same closed-form-in-strlen design the
    oracle-backed multimodal_dims twin verifies for the pixel tier."""
    from ..operators.multimodal import audio_features, synthesize_raw_audio

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clips = synthesize_raw_audio(d, "text", "doc_id")
    feats = audio_features(clips, frame_len=256)
    meta = clips.select("id", "duration_ms")
    return (
        feats.join(meta, "id")
        .groupBy((F.floor(F.col("duration_ms") / 50) * 50).alias("duration_bucket_ms"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_frames").cast("long").alias("n_frames_total"),
            F.round(F.avg("rms"), 2).alias("avg_rms"),
            F.round(F.avg(F.expr("aggregate(frame_zcr, 0.0D, (a, x) -> a + x)") / F.greatest("n_frames", F.lit(1))), 4).alias("avg_zcr"),
        )
        .orderBy("duration_bucket_ms")
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling end-to-end: synthesize raw8 video payloads
    (4..8 frames at 4 fps), sample one frame every 500 ms (stride 2), and
    aggregate per frame index — (frame_idx, t_ms, n_frames_sampled,
    px_sum_total). Rows-only by contract (same reason as
    multimodal_resize); the 1→N fan-out count and timestamps are
    pytest-pinned."""
    from ..operators.multimodal import sample_frames, synthesize_raw_video

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vids = synthesize_raw_video(d, "text", "doc_id")
    frames = sample_frames(vids, every_ms=500)
    return (
        frames.groupBy("frame_idx", "t_ms")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.sum("px_sum").alias("px_sum_total"),
        )
        .orderBy("frame_idx")
    )


QUERIES = {
    "pandas_udf_tokens": q_pandas_udf_tokens,
    "grouped_agg_pandas": q_grouped_agg_pandas,
    "apply_in_pandas": q_apply_in_pandas,
    "map_in_pandas": q_map_in_pandas,
    "map_in_arrow": q_map_in_arrow,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_dims": q_multimodal_dims,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_imgstats": q_multimodal_imgstats,
    "multimodal_audio": q_multimodal_audio,
    "cogroup_stats": q_cogroup_stats,
    "udtf_tokens": q_udtf_tokens,
    "fanout_compute": q_fanout_compute,
}

ORACLE = {
    "pandas_udf_tokens": _PANDAS_UDF_TOKENS_SQL,
    "grouped_agg_pandas": _GROUPED_AGG_PANDAS_SQL,
    "apply_in_pandas": _APPLY_IN_PANDAS_SQL,
    "map_in_pandas": _MAP_IN_PANDAS_SQL,
    "map_in_arrow": _MAP_IN_ARROW_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "multimodal_dims": _MULTIMODAL_DIMS_SQL,
    "cogroup_stats": _COGROUP_STATS_SQL,
    "udtf_tokens": _UDTF_TOKENS_SQL,
    "fanout_compute": _FANOUT_COMPUTE_SQL,
}
