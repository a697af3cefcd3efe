"""Unit tests for the expression libraries (functions.text / functions.vectors)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.functions import (
    as_double,
    cosine_similarity,
    doc_fingerprint,
    dot,
    l2_norm,
    l2_normalize,
    predict_lang,
    punct_ratio,
    token_count,
    tokens,
)


def test_tokens_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("  a  b\tc\nd  ",)], ["text"]
    )
    out = [r[0] for r in df.select(tokens("text")).collect()]
    assert out == [[], [], ["one"], ["a", "b", "c", "d"]]


def test_token_count_and_punct(spark):
    df = spark.createDataFrame([("a, b! c?",), ("clean words",)], ["text"])
    rows = df.select(token_count("text").alias("n"), punct_ratio("text").alias("p")).collect()
    assert rows[0]["n"] == 3
    assert rows[0]["p"] == pytest.approx(3 / 8)
    assert rows[1]["p"] == 0.0


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a"), (3, "a b c c c"), (4, "a b d")], ["i", "text"]
    )
    fps = [r[0] for r in df.select(doc_fingerprint("text")).collect()]
    assert fps[0] == fps[1] == fps[2]  # same token set
    assert fps[3] != fps[0]


def test_predict_lang_markers(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat and it sleeps",),
         ("le chat est sur la table et les livres",),
         ("der hund ist ein freund und die katze",)],
        ["text"],
    )
    out = [r[0] for r in df.select(predict_lang("text")).collect()]
    assert out == ["en", "fr", "de"]


def test_vector_math_vs_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        F.aggregate(l2_normalize(F.col("a")), F.lit(0.0), lambda acc, x: acc + x * x).alias("unit_sq"),
    ).collect()[0]
    pdot = sum(x * y for x, y in zip(a, b))
    pna = math.sqrt(sum(x * x for x in a))
    pnb = math.sqrt(sum(x * x for x in b))
    assert row["dot"] == pytest.approx(pdot, rel=1e-12)
    assert row["na"] == pytest.approx(pna, rel=1e-12)
    assert row["cos"] == pytest.approx(pdot / (pna * pnb), rel=1e-12)
    assert row["unit_sq"] == pytest.approx(1.0, rel=1e-12)


def test_as_double_preserves_float32_values(spark):
    df = spark.createDataFrame([([0.5, 0.25],)], "arr: array<float>")
    out = df.select(as_double(F.col("arr")).alias("d")).collect()[0]["d"]
    assert out == [0.5, 0.25]


def test_bpe_pre_tokens_vs_python_re(spark):
    import re

    from savio_training_dask_2019_spark.functions import bpe_pre_tokens
    from savio_training_dask_2019_spark.functions.text import BPE_PRETOKEN_RE

    samples = ["don't stop", "hello world123!", "a,b ,, c42d", "  spaced  out  "]
    df = spark.createDataFrame([(s,) for s in samples], ["text"])
    got = [r[0] for r in df.select(bpe_pre_tokens("text")).collect()]
    want = [re.findall(BPE_PRETOKEN_RE, s) for s in samples]
    assert got == want


def test_rolling_fingerprint_order_sensitive(spark):
    from savio_training_dask_2019_spark.functions import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c"), (4, "")], ["i", "text"]
    )
    fp = {r["i"]: r["f"] for r in df.select("i", rolling_fingerprint("text").alias("f")).collect()}
    assert fp[1] == fp[3]          # deterministic
    assert fp[1] != fp[2]          # order matters (unlike doc_fingerprint)
    assert fp[4] == 0              # empty doc -> identity
    assert all(0 <= v < 2**31 - 1 for v in fp.values())


def test_hll_sketch_merge_accuracy(spark, sf_dir):
    """Unioning per-partition sketches must estimate the GLOBAL distinct
    within HLL error (~2% at lgK=12) — the property that makes sketch
    tables re-aggregable without raw data."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.queries.relational import q_hll_sketch_union
    from savio_training_dask_2019_spark.sources import load_table

    row = q_hll_sketch_union(spark, sf_dir).collect()[0]
    exact = (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()[0]["n"]
    )
    assert abs(row["merged_custs"] - exact) / exact < 0.05
    # per-group estimates overcount when summed (shared customers) — the
    # union must NOT be a sum
    assert row["merged_custs"] <= row["sum_per_group"]


def test_kll_quantile_merge_accuracy(spark, sf_dir):
    """Merged per-partition KLL sketches must estimate global quantiles
    within KLL's rank error (~1.7% at default k) of the exact values."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.queries.relational import q_kll_quantiles
    from savio_training_dask_2019_spark.sources import load_table

    est = q_kll_quantiles(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    exact = o.agg(
        *[
            F.percentile("o_totalprice", F.lit(q)).alias(f"p{int(q*100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    ).collect()[0]
    n = o.count()
    vals = sorted(r[0] for r in o.select("o_totalprice").collect())
    for q, key in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        # rank-error check: the estimate's rank must be within 3% of target
        import bisect

        rank = bisect.bisect_left(vals, est[key]) / n
        assert abs(rank - q) < 0.03, (key, est[key], rank)
