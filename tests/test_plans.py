"""Physical-plan assertions (SURVEY.md §4 / the 100 TB posture): pushdown,
pruning, broadcast choice, and shuffle counts are part of the engine's
contract, not accidents. These tests pin the plans we designed for."""

from __future__ import annotations

from pyspark.sql import functions as F

from savio_training_dask_2019_spark import plans
from savio_training_dask_2019_spark.queries import QUERIES
from savio_training_dask_2019_spark.sources import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    pushed = " ".join(plans.pushed_filters(li))
    assert "l_quantity" in pushed and "GreaterThan" in pushed


def test_projection_pruned_to_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = plans.read_schema_columns(li)
    assert set(cols) == {"l_orderkey", "l_quantity"}  # 2 of 11 columns read


def test_join_3way_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_3way"](spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1  # nation must broadcast


def test_agg_groupby_single_shuffle(spark, sf_dir):
    df = QUERIES["agg_groupby"](spark, sf_dir)
    # partial+final hash agg: exactly one exchange of O(groups) rows
    assert plans.shuffle_count(df) == 1


def test_topk_avoids_global_sort(spark, sf_dir):
    df = QUERIES["topk"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_knn_brute_no_shuffle_before_topk(spark, sf_dir):
    df = QUERIES["knn_brute"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    # scoring is a narrow map over the scan; top-k is TakeOrdered, not Sort
    assert "TakeOrderedAndProject" in plan
    assert plans.shuffle_count(df) == 0
