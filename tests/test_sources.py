"""Source/sink roundtrips (SURVEY.md §2.1): parquet + partitioned layout,
CSV with explicit schema, JSON lines, pandas interchange."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.sources import (
    from_iterator,
    from_pandas,
    load_table,
    read_csv,
    read_json_lines,
    read_text,
    write_csv,
    write_parquet,
)
from savio_training_dask_2019_spark.sources.text_json import parse_json_column


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet(d, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # partition pruning: lang=en scan must touch only the en directory
    en = back.filter(F.col("lang") == "en").select("doc_id")
    assert en.count() == d.filter(F.col("lang") == "en").count()


def test_csv_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_csv")
    write_csv(c, out)
    back = read_csv(
        spark, out,
        schema="c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    assert back.count() == c.count()
    assert dict(back.dtypes)["c_acctbal"] == "double"
    assert back.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).collect()[0]["s"] == \
        c.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).collect()[0]["s"]


def test_json_lines_and_parse_column(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_json_lines(spark, str(p), schema="a bigint, b string")
    assert [r["a"] for r in df.orderBy("a").collect()] == [1, 2]

    txt = read_text(spark, str(p))
    parsed = parse_json_column(txt, "value", "a INT, b STRING")
    assert parsed.select(F.sum("value_parsed.a")).collect()[0][0] == 3


def test_json_lines_sink_roundtrip(spark, sf_dir, tmp_path):
    from savio_training_dask_2019_spark.sources import write_json_lines

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = str(tmp_path / "events_jsonl")
    write_json_lines(e, out, partition_by=["event_type"])
    # directory partition discovery recovers event_type, like parquet
    back = read_json_lines(
        spark, out, schema="event_id bigint, value double, event_type string"
    )
    assert back.count() == e.count()
    assert back.filter(F.col("event_type") == "click").count() == \
        e.filter(F.col("event_type") == "click").count()
    # values survive the text roundtrip
    assert back.agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"] == \
        e.agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"]
    assert sorted(r["event_id"] for r in back.collect()) == \
        sorted(r["event_id"] for r in e.collect())


def test_from_pandas_roundtrip(spark):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    df = from_pandas(spark, pdf, npartitions=2)
    assert df.rdd.getNumPartitions() == 2
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3]


def test_from_iterator_roundtrip(spark):
    it = ((i, f"row{i}") for i in range(10))  # a generator, like from_delayed
    df = from_iterator(spark, it, "k long, v string", npartitions=3)
    assert df.rdd.getNumPartitions() == 3
    assert df.schema.simpleString() == "struct<k:bigint,v:string>"
    assert sorted(r["k"] for r in df.collect()) == list(range(10))


def test_from_iterator_empty_keeps_schema(spark):
    df = from_iterator(spark, [], "k long, v string")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<k:bigint,v:string>"


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    from savio_training_dask_2019_spark.sources import read_orc, write_orc

    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(d, out, partition_by=["lang"])
    back = read_orc(spark, out)
    assert back.count() == d.count()
    assert back.filter(F.col("lang") == "en").count() == \
        d.filter(F.col("lang") == "en").count()
    # pushdown reaches the ORC scan like parquet
    plan = back.filter(F.col("doc_id") < 100)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan


def test_write_sorted_parquet_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """The sorted layout's contract: output files cover disjoint sort-key
    ranges (range partitioning) and rows inside each file are sorted — the
    two properties that make parquet min/max stats prune files/row groups
    for range predicates. Also: a range predicate over the layout still
    returns exactly the right rows, and it reaches the scan as a pushed
    filter."""
    import glob

    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark import plans
    from savio_training_dask_2019_spark.sources import write_sorted_parquet

    out = str(tmp_path / "orders_sorted")
    orders = load_table(spark, sf_dir, "orders")
    write_sorted_parquet(orders, out, ["o_orderdate"], n_files=4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        part = spark.read.parquet(f)
        r = part.agg(
            F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
        ).collect()[0]
        ranges.append((r["lo"], r["hi"]))
        # sorted within the file
        dates = [x["o_orderdate"] for x in part.select("o_orderdate").collect()]
        assert dates == sorted(dates)
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, "file key ranges must not interleave"

    # round-trip + pushdown
    back = spark.read.parquet(out).filter(F.col("o_orderdate") >= "1997-01-01")
    want = orders.filter(F.col("o_orderdate") >= "1997-01-01").count()
    assert back.count() == want
    assert any("o_orderdate" in p for p in plans.pushed_filters(back))


def test_register_views_sql_surface(spark, sf_dir):
    """After one register_views call the whole corpus is drivable from
    plain spark.sql, with the load-path normalizations applied (events.ts
    arrives as a usable timestamp, not raw nanos) — and an ANSI query over
    the views matches the DataFrame path exactly."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import (
        FIXTURE_TABLES,
        load_table,
        register_views,
    )

    names = register_views(spark, sf_dir)
    assert names == list(FIXTURE_TABLES)
    got = spark.sql(
        """
        SELECT c.c_mktsegment AS seg, COUNT(*) AS n,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    ).collect()
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # nano-ts normalization reached the view: hour() works directly
    r = spark.sql("SELECT MIN(hour(ts)) AS h FROM events").first()
    assert r["h"] is not None and 0 <= r["h"] <= 23
    # prefixed registration doesn't clobber
    assert register_views(spark, sf_dir, prefix="x_")[0] == "x_region"
    assert spark.sql("SELECT COUNT(*) AS n FROM x_region").first()["n"] == 5
