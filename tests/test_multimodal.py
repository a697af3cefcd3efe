"""Multimodal-column plumbing tests (operators.multimodal): real binary
packing + Arrow decode round-trip; stubbed codec ops must fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.operators import (
    MEDIA_META_SCHEMA,
    decode_meta,
    embedding_near_dup_pairs,
    pack_payload,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 1000)], ["doc_id", "text"]
    )
    return pack_payload(df, "text", "text/plain", "doc_id")


def test_pack_payload_schema_and_meta(packed):
    assert dict(packed.dtypes)["payload"] == "binary"
    rows = {r["id"]: r for r in packed.collect()}
    assert rows[1]["payload"] == b"hello world"
    assert rows[1]["meta"]["mime"] == "text/plain"
    assert rows[1]["meta"]["byte_len"] == 11
    assert rows[2]["meta"]["byte_len"] == 0
    assert rows[3]["meta"]["uri"] == "mem://3"
    assert {f.name for f in MEDIA_META_SCHEMA.fields} == set(
        rows[1]["meta"].asDict().keys()
    )


def test_decode_meta_deterministic_fake(packed):
    rows = {r["id"]: r for r in decode_meta(packed).collect()}
    # fake codec arithmetic, computable by hand: n=11, first=ord('h')=104
    assert rows[1]["width"] == 64 + 11 % 577
    assert rows[1]["height"] == 64 + (11 * 31 + 104) % 577
    assert rows[1]["checksum"] == (11 * 2654435761) % (1 << 31)
    assert rows[2]["width"] == 64 and rows[2]["checksum"] == 0  # empty payload
    again = {r["id"]: r for r in decode_meta(packed).collect()}
    assert rows == again


def test_stubbed_codecs_fail_loudly(packed):
    with pytest.raises(NotImplementedError, match="image codec"):
        resize_images(packed)
    with pytest.raises(NotImplementedError, match="video backend"):
        sample_frames(packed)


def test_embedding_near_dup_brute_vs_lsh(spark):
    # two planted near-dup clusters + noise
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),     # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.15, 0.0]),    # near 2
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    brute = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(df, "embedding", "vec_id", 0.95, "brute").collect()}
    assert brute == {(0, 1), (2, 3)}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs(df, "embedding", "vec_id", 0.95, "lsh").collect()}
    assert lsh <= brute  # LSH never invents pairs (distances are exact)
    with pytest.raises(ValueError, match="unknown method"):
        embedding_near_dup_pairs(df, "embedding", "vec_id", 0.9, "bogus")
