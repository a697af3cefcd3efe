"""Misra-Gries heavy hitters: the mergeable-summary error contract checked
against EXACT counts (computable at fixture scale), plus the survival
guarantee on a planted-skew stream and summary-size bounds."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from savio_training_dask_2019_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_summaries,
)
from savio_training_dask_2019_spark.functions.text import tokens
from savio_training_dask_2019_spark.sources import load_table


def test_heavy_hitters_error_contract_on_fixture(spark, sf_dir):
    """est <= true <= est + err_bound for every returned token, and the
    err bound itself is <= n/(k+1) summed over partitions."""
    d = load_table(spark, sf_dir, "documents")
    true = Counter(
        t
        for r in d.select("text").collect()
        for t in r["text"].split()
    )
    n = sum(true.values())
    k = 32
    rows = heavy_hitters(
        d.select(F.explode(tokens("text")).alias("tok")), "tok", k=k, top=20
    ).collect()
    assert rows, "sketch returned nothing"
    err = rows[0]["err_bound"]
    assert all(r["err_bound"] == err for r in rows)
    n_parts = d.select(F.explode(tokens("text")).alias("tok")).rdd.getNumPartitions()
    assert 0 <= err <= n_parts * (n // (k + 1) + 1)
    for r in rows:
        t = true[r["item"]]
        assert r["est_count"] <= t <= r["est_count"] + err, (
            r["item"], r["est_count"], t, err
        )


def test_heavy_hitters_survival_guarantee_planted_skew(spark):
    """Any item with true count > err_bound MUST survive: plant one token
    holding ~40% of a stream over a k far too small for the tail, across
    several partitions."""
    n, k = 50_000, 8
    df = (
        spark.range(n)
        .repartition(8)
        .select(
            F.when(F.col("id") % 5 < 2, F.lit("HOT"))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 997).cast("string")))
            .alias("tok")
        )
    )
    out = {r["item"]: r for r in heavy_hitters(df, "tok", k=k, top=5).collect()}
    assert "HOT" in out
    hot = out["HOT"]
    true_hot = 2 * n // 5
    assert hot["est_count"] <= true_hot <= hot["est_count"] + hot["err_bound"]
    # and it must rank first: nothing else comes close to 40%
    top_item = max(out.values(), key=lambda r: r["est_count"])
    assert top_item["item"] == "HOT"


def test_summaries_are_bounded_per_partition(spark):
    """Each partition emits <= k item rows + exactly one NULL error row,
    regardless of distinct-item count."""
    k = 16
    df = spark.range(20_000).repartition(4).select(
        (F.col("id") % 5000).cast("string").alias("item")  # 5000 distinct >> k
    )
    summ = misra_gries_summaries(df, "item", k=k)
    per_part = (
        summ.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(
            F.sum(F.col("item").isNotNull().cast("int")).alias("items"),
            F.sum(F.col("item").isNull().cast("int")).alias("errs"),
        )
        .collect()
    )
    assert per_part
    for r in per_part:
        assert r["items"] <= k
        assert r["errs"] == 1

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        misra_gries_summaries(df, "item", k=0)


def test_heavy_hitters_catalog_query_shape(spark, sf_dir):
    from savio_training_dask_2019_spark.queries import QUERIES

    rows = QUERIES["heavy_hitters"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_weighted_heavy_hitters_by_token_mass(spark, sf_dir):
    """Weighted MG: heavy SOURCES by token mass. Contract against exact
    weighted totals computable at fixture scale."""
    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("w")
    )
    true = {
        r["source"]: r["t"]
        for r in d.groupBy("source").agg(F.sum("w").alias("t")).collect()
    }
    rows = heavy_hitters(d, "source", k=4, top=5, weight_col="w").collect()
    assert rows
    err = rows[0]["err_bound"]
    for r in rows:
        t = true[r["item"]]
        assert r["est_count"] <= t <= r["est_count"] + err
    # the true heaviest source must survive and rank first if it dominates
    top_true = max(true, key=lambda s: (true[s], s))
    if true[top_true] > err:
        assert any(r["item"] == top_true for r in rows)


def test_heavy_domains_catalog_query_contract(spark, sf_dir):
    """The catalog's weighted-MG entry: top sources by token mass must
    satisfy est <= true_mass <= est + err_bound against exact per-source
    token totals (computable at fixture scale), with a descending cut."""
    from savio_training_dask_2019_spark.queries import QUERIES
    from savio_training_dask_2019_spark.queries.textops import tokens
    from savio_training_dask_2019_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).cast("long").alias("w")
    )
    true = {
        r["source"]: r["t"]
        for r in d.groupBy("source").agg(F.sum("w").alias("t")).collect()
    }
    rows = QUERIES["heavy_domains"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)
    err = rows[0]["err_bound"]
    for r in rows:
        assert r["est_count"] <= true[r["item"]] <= r["est_count"] + err


def test_weighted_heavy_hitters_rejects_negative_weights(spark):
    import pytest

    df = spark.createDataFrame([("a", 5), ("b", -1)], "item string, w long")
    with pytest.raises(Exception, match="negative weights"):
        heavy_hitters(df, "item", k=4, weight_col="w").collect()
    # zero-weight rows are dropped, not slot-occupying
    df2 = spark.createDataFrame([("a", 5), ("z", 0)], "item string, w long")
    rows = heavy_hitters(df2, "item", k=4, weight_col="w").collect()
    assert [r["item"] for r in rows] == ["a"]
