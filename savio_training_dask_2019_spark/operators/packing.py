"""Sequence packing — the concat-and-chunk global-offset cascade, factored
out of the text packing query so any cost column packs the same way (text
tokens, multimodal token+patch budgets, audio frames).

``pack_offsets`` computes each row's global running offset in id order with
NO unpartitioned window anywhere — the three-level cascade documented at
queries/llmpipe.q_pack_sequences (per-block sums → driver-side prefix over
n/B² super-blocks, the zipWithIndex pattern → two partitioned windows of
≤B rows each). Block size B is adaptive (max(2048, ~n^(1/3))) so all three
levels stay ~cube-root-sized at any corpus size; B changes the physical
plan only, never the offsets (pinned by the block-size-invariance test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_block_for(n_rows: int) -> int:
    """Adaptive block size: ~ceil(n^(1/3)) floored at 2048 — keeps blocks
    (n/B), supers (n/B²), and window partitions (≤B) all ≤ max(2048,
    ~n^(1/3)) at any n. Exactness is irrelevant; only magnitude balance
    matters, and B never affects offsets."""
    b = max(2048, int(max(n_rows, 0) ** (1.0 / 3.0)))
    while b * b * b < n_rows:
        b += 1
    return b


def pack_offsets(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    block: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global running offset of ``cost_col`` in ``id_col`` order: returns
    ``df``'s (id, cost) projection plus an ``offset`` column (sum of all
    earlier rows' costs). Ids should be roughly dense so ``id DIV B``
    yields balanced blocks (the corpus doc_id contract).

    ``block`` overrides the adaptive size (tests); ``n_rows`` supplies a
    cheap row count for the adaptive path (pass the source table's
    metadata count when ``df``'s lineage is expensive — e.g. a Python
    kernel — so sizing does not execute it twice)."""
    spark = df.sparkSession
    if block is None:
        block = pack_block_for(df.count() if n_rows is None else n_rows)
    d = df.select(
        F.col(id_col).alias("__id"),
        F.expr(f"{id_col} DIV {block}").alias("__block"),
        F.col(cost_col).alias("__cost"),
    )
    blocks = d.groupBy("__block").agg(F.sum("__cost").alias("__block_cost")).persist()
    supered = blocks.withColumn("__super", F.expr(f"__block DIV {block}"))
    super_rows = (
        supered.groupBy("__super")
        .agg(F.sum("__block_cost").alias("__super_cost"))
        .orderBy("__super")
        .collect()
    )
    acc, prefix = 0, []
    for r in super_rows:
        prefix.append((r["__super"], acc))
        acc += r["__super_cost"]
    super_off = spark.createDataFrame(
        prefix or [(0, 0)], "__super long, __super_off long"
    )
    w_blocks = (
        Window.partitionBy("__super")
        .orderBy("__block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # localCheckpoint the bounded offset table (n/B rows of two longs) and
    # release the blocks cache NOW — the leak/scan contract documented at
    # q_pack_sequences; the eager job reads the already-cached blocks.
    offsets = (
        supered.join(F.broadcast(super_off), "__super")
        .select(
            "__block",
            (
                F.col("__super_off")
                + F.coalesce(F.sum("__block_cost").over(w_blocks), F.lit(0))
            ).alias("__block_off"),
        )
        .localCheckpoint(eager=True)
    )
    blocks.unpersist()
    w_intra = (
        Window.partitionBy("__block")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(offsets, "__block")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cost").alias(cost_col),
            (
                F.col("__block_off") + F.coalesce(F.sum("__cost").over(w_intra), F.lit(0))
            ).alias("offset"),
        )
    )


def assign_bins(offsets: DataFrame, cost_col: str, budget: int) -> DataFrame:
    """Bin summary over a ``pack_offsets`` result: bin = offset DIV budget
    (rows straddling a boundary count toward their start bin) → per-bin
    row count and cost mass."""
    return (
        offsets.select(
            F.floor(F.col("offset") / budget).alias("bin"), F.col(cost_col)
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(cost_col).alias("bin_tokens"))
    )
