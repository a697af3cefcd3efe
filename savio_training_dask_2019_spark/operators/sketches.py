"""Misra-Gries heavy hitters — the frequency member of the mergeable-sketch
family (HLL for cardinality, KLL for quantiles, MG for top items).

Why this shape at 100 TB: exact top-k over a token stream needs a full
(item → count) shuffle — vocabulary-sized state through one aggregation.
A Misra-Gries(k) summary is O(k) per partition, merges associatively
(Agarwal et al. 2012, "Mergeable Summaries", PODS '12: combine counts,
subtract the (k+1)-th largest, keep positives), and carries a deterministic
error contract: for every surviving item,

    est <= true <= est + err_bound

where err_bound is the total mass subtracted across all prunes — at most
n/(k+1). Any item with true frequency > err_bound is GUARANTEED to survive
(it cannot be decremented to zero). So the reduction is: per-partition O(k)
summaries (narrow, one pass) → one tiny union → an O(parts·k) final merge,
instead of a vocabulary-wide shuffle.

The per-partition pass is Arrow-batched and vectorized: each pandas batch
contributes its exact ``value_counts`` (C speed), which is then MERGED into
the running summary — the sequential textbook loop is never run per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "item string, est long, pruned long"


def _prune(counts: "pd.Series", k: int) -> tuple["pd.Series", int]:
    """Keep <= k items by subtracting the (k+1)-th largest count from all
    and dropping non-positives — the mergeable-summaries prune. Returns the
    pruned summary and the amount subtracted (the error this step adds)."""
    if len(counts) <= k:
        return counts, 0
    cut = int(counts.nlargest(k + 1).iloc[k])
    counts = counts - cut
    return counts[counts > 0], cut


def misra_gries_summaries(
    df: DataFrame, item_col: str, k: int = 64, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra-Gries(k) summaries: <= k rows of (item, est, 0)
    per partition plus ONE (NULL, 0, pruned_total) error row. Output is
    O(partitions · k) whatever the input size.

    ``weight_col`` (integer) generalizes to weighted frequencies — heavy
    DOMAINS by token mass instead of heavy tokens by occurrence — with the
    same contract: est <= true_weight <= est + err (the weighted MG of the
    mergeable-summaries paper; the prune subtracts the (k+1)-th largest
    weighted mass). Weights must be POSITIVE — the contract is meaningless
    under negative mass, so a negative weight raises (in the task); zero-
    weight rows are dropped rather than wasting summary slots."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        pruned = 0
        for pdf in batches:
            col = pdf[item_col]
            if weight_col is None:
                batch = col.dropna().value_counts()
            else:
                w = pdf[[item_col, weight_col]].dropna()
                if (w[weight_col] < 0).any():
                    raise ValueError(
                        "misra_gries_summaries: negative weights break the "
                        "est <= true <= est + err contract"
                    )
                w = w[w[weight_col] > 0]  # zero mass must not occupy a slot
                batch = w.groupby(item_col, sort=False)[weight_col].sum()
            counts = counts.add(batch, fill_value=0).astype("int64")
            counts, cut = _prune(counts, k)
            pruned += cut
        out = pd.DataFrame(
            {"item": counts.index.astype(str), "est": counts.values}
        )
        out["pruned"] = 0
        err = pd.DataFrame({"item": [None], "est": [0], "pruned": [pruned]})
        yield pd.concat([out, err], ignore_index=True)

    cols = [F.col(item_col).cast("string").alias(item_col)]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias(weight_col))
    return df.select(*cols).mapInPandas(summarize, _SUMMARY_SCHEMA)


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 64,
    top: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Approximate top items: merge the per-partition Misra-Gries(k)
    summaries and return the ``top`` largest estimates with the global
    error bound attached. Contract (pinned in tests/test_sketches.py):
    ``est <= true <= est + err_bound`` for every returned item, and every
    item with true count > err_bound survives the sketch.

    Plan: narrow one-pass summaries → O(parts·k)-row shuffle on item →
    TakeOrdered cut; the error bound rides as a broadcast 1-row scalar
    agg. The token stream itself never shuffles."""
    summaries = misra_gries_summaries(df, item_col, k=k, weight_col=weight_col)
    # one tiny frame feeds both branches; without a checkpoint each branch
    # would re-run the full per-partition summarize pass over the corpus
    summaries = summaries.localCheckpoint(eager=True)
    err = F.broadcast(
        summaries.agg(F.sum("pruned").cast("bigint").alias("err_bound"))
    )
    merged = (
        summaries.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").cast("bigint").alias("est_count"))
    )
    return (
        merged.crossJoin(err)
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(top)
    )
