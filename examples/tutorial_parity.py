#!/usr/bin/env python
"""Tutorial parity walk-through: every demo from the reference training
(`ucb-rit/savio-training-dask-2019` — SURVEY.md §0 syllabus), re-expressed
in this engine, runnable end-to-end on the driver fixtures.

    PYTHONPATH=. python examples/tutorial_parity.py [sf_dir]

Each section names the Dask call it replaces. This is the "switching guide":
a user of the reference runs the same computations here with the mappings
shown (SURVEY.md §1.1, §2).
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from savio_training_dask_2019_spark.session import get_spark
    from savio_training_dask_2019_spark.sources import (
        from_pandas,
        load_table,
        read_csv,
        write_csv,
        write_parquet,
    )

    spark = get_spark(app_name="tutorial-parity")
    print("== 1. dataframes: dd.read_csv('201*.csv') -> filter -> groupby mean ==")
    # the airline demo shape, on the events fixture; CSV roundtrip included
    events = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp()
    write_csv(events.drop("ts"), f"{tmp}/events_csv")  # dd.to_csv('out-*.csv')
    back = read_csv(
        spark, f"{tmp}/events_csv",
        schema="event_id bigint, user_id bigint, event_type string, value double, props string",
    )
    # df[df.Origin == 'SFO'].groupby('DayOfWeek').DepDelay.mean().compute()
    res = (
        back.filter(F.col("event_type") == "click")          # boolean mask
        .groupBy("user_id")                                   # groupby
        .agg(F.round(F.avg("value"), 3).alias("mean_value"))  # .mean()
        .orderBy(F.col("mean_value").desc())
        .limit(5)
    )
    res.show()  # .compute() -> an action

    print("== 2. delayed / futures: client.map(sim, range(p)) ==")
    # embarrassingly-parallel parameter sweep: one no-shuffle stage
    sims = spark.range(0, 1000).select(
        F.col("id").alias("param"), ((F.col("id") * 2654435761) % 997).alias("result")
    )
    print("sims:", sims.agg(F.sum("result").alias("total")).collect()[0]["total"])

    print("== 3. bag: db.read_text(...).map(json.loads).pluck('k') ==")
    parsed = events.withColumn("k", F.from_json("props", "k INT")["k"])
    parsed.groupBy("event_type").agg(F.round(F.avg("k"), 2).alias("avg_k")).show()

    print("== 4. array: da.random.normal(...).mean() / elementwise ufuncs ==")
    emb = load_table(spark, sf_dir, "embeddings")
    from savio_training_dask_2019_spark.functions import l2_norm, as_double

    emb.select(
        F.round(F.avg(l2_norm(as_double(F.col("embedding")))), 4).alias("mean_norm")
    ).show()

    print("== 5. persist + parquet sink: df.persist(); df.to_parquet(...) ==")
    hot = events.filter(F.col("event_type") == "purchase").persist()
    print("purchases:", hot.count())
    write_parquet(hot, f"{tmp}/purchases", partition_by=["user_id"], mode="overwrite")
    hot.unpersist()

    print("== 6. from_pandas interchange ==")
    import pandas as pd

    dims = from_pandas(spark, pd.DataFrame({"bucket": [0, 1, 2], "name": ["a", "b", "c"]}))
    events.withColumn("bucket", (F.col("value") % 3).cast("long")).join(
        F.broadcast(dims), "bucket"
    ).groupBy("name").count().show()

    print("tutorial parity walk-through complete")


if __name__ == "__main__":
    main(*sys.argv[1:2])
