"""Skew evidence for the substring-dedup tier (VERDICT r7 #7).

The scale threat: one boilerplate span repeated across ~10^5+ documents is a
single hot window-hash ``h`` carrying one row PER DOCUMENT into the totals
join-back of ``substring_dup_stats``. Two facts pinned here:

1. **AQE's skew-split provably cannot fire on the join-back's plan shape.**
   ``OptimizeSkewedJoin`` needs BOTH join children to be re-readable shuffle
   stages; the totals side is a HashAggregate already partitioned on ``h``
   that pipelines into the join with no shuffle stage of its own.
   ``test_aqe_skew_split_blocked_by_pipelined_agg_side`` demonstrates this
   on a minimal pair (raw ⋈ table splits, raw ⋈ agg-totals does not) so the
   limitation is machine-checked knowledge, not folklore — if a future
   Spark lifts it, this test fails and the salting can be revisited.

2. **The query's salted join-back spreads the hot key by construction and
   stays exact.** Planted boilerplate (every doc = the same _SPAN_W-token
   span) runs through the REAL catalog query against a planted fixture dir;
   results are differentially checked against a pure-Python reference, and
   the plan must show the (h, salt) join keys.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.queries.llmpipe import (
    _JOIN_SALTS,
    _SPAN_W,
    q_substring_dup_stats,
)

_SKEW_CONFS = {
    # force shuffle joins + floor every skew knob: if AQE CAN split, it WILL
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2048",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_base(spark):
    # 990 of every 1000 keys collapse to key 0 — one hot key, many cold ones
    return spark.range(200_000).select(
        F.when(F.col("id") % 1000 < 990, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("h"),
        F.col("id").alias("doc"),
    )


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_skew_split_blocked_by_pipelined_agg_side(spark, skew_confs):
    """The minimal pair behind the salting decision. Same skewed probe side,
    same floored thresholds; only the build side differs."""
    plain = spark.range(1000).select(F.col("id").alias("h"), F.lit(1).alias("tot"))
    j1 = (
        _skewed_base(spark)
        .join(plain, "h")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j1.collect()
    assert "skew=true" in _final_plan(j1), (
        "control failed: AQE did not split the splittable shape — "
        "skew confs are not taking effect"
    )

    agg_totals = _skewed_base(spark).groupBy("h").agg(F.count(F.lit(1)).alias("tot"))
    j2 = (
        _skewed_base(spark)
        .join(agg_totals, "h")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j2.collect()
    assert "skew=true" not in _final_plan(j2), (
        "AQE split the agg-fed join shape — Spark lifted the limitation; "
        "the salted join-back in substring_dup_stats can be reconsidered"
    )


_BOILER = "alpha beta gamma delta epsilon zeta eta theta"  # exactly _SPAN_W tokens


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("planted"))


def _plant_boilerplate(spark, out_dir: str, n_hot: int = 5_000):
    assert len(_BOILER.split()) == _SPAN_W
    rows = [
        (i, _BOILER, "en" if i % 2 == 0 else "fr", f"src{i % 3}", len(_BOILER))
        for i in range(n_hot)
    ]
    # plus a cold tail of unique docs so the non-duplicated path is exercised
    rows += [
        (n_hot + i, " ".join(f"u{i}w{j}" for j in range(_SPAN_W + 1)), "de", "srcu", 0)
        for i in range(50)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return rows


def _python_reference(rows):
    """Per-lang (n_docs, docs_with_dup, total_windows, dup_windows) the slow way."""
    win_total: Counter = Counter()
    doc_wins: dict[int, tuple[str, list[str]]] = {}
    for doc_id, text, lang, _src, _nc in rows:
        toks = text.split()
        if len(toks) < _SPAN_W:
            continue
        wins = [
            " ".join(toks[i : i + _SPAN_W]) for i in range(len(toks) - _SPAN_W + 1)
        ]
        doc_wins[doc_id] = (lang, wins)
        win_total.update(wins)
    agg: dict[str, list[int]] = {}
    for _doc_id, (lang, wins) in doc_wins.items():
        nw = len(wins)
        dw = sum(1 for w in wins if win_total[w] >= 2)
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if dw > 0 else 0
        a[2] += nw
        a[3] += dw
    return {
        lang: (v[0], v[1], v[2], v[3]) for lang, v in agg.items()
    }


def test_substring_dup_stats_exact_under_planted_boilerplate(
    spark, skew_confs, planted_dir
):
    rows = _plant_boilerplate(spark, planted_dir)
    df = q_substring_dup_stats(spark, planted_dir)
    got = {
        r["lang"]: (
            r["n_docs"],
            r["docs_with_dup_span"],
            r["total_windows"],
            r["dup_windows"],
        )
        for r in df.collect()
    }
    assert got == _python_reference(rows)


def test_substring_dup_stats_join_back_is_salted(spark, skew_confs, planted_dir):
    """Structural pin: the totals join-back keys on (h, salt), so a hot h
    spreads across _JOIN_SALTS partitions BY CONSTRUCTION — no runtime
    re-planning needed. Both join-side exchanges must carry the salt."""
    _plant_boilerplate(spark, planted_dir)
    df = q_substring_dup_stats(spark, planted_dir)
    plan = _final_plan(df)
    salted_exchanges = re.findall(r"hashpartitioning\(h#\d+L, salt#\d+", plan)
    assert len(salted_exchanges) >= 1, plan[:2000]
    # and the join condition itself includes the salt on both sides
    assert re.search(r"\[h#\d+L, salt#\d+\], \[h#\d+L, salt#\d+\]", plan), (
        "join keys are not (h, salt) on both sides"
    )
    assert _JOIN_SALTS >= 8  # the lever exists and is non-trivial


def test_knn_cells_hot_cell_is_aqe_splittable(spark, skew_confs):
    """VERDICT r8 #5: cell_knn_join's docstring claims a hot cell 'is an
    AQE skew-split case'. Unlike the agg-fed substring join-back (where the
    claim was FALSE and salting was required), both children of the
    cell ⋈ cell shuffle_hash join are plain shuffle stages (narrow folds
    from the scan), so OptimizeSkewedJoin CAN re-read and split them — and
    the per-query top-k window re-shuffles on query_id afterwards, so no
    output-partitioning requirement blocks the split. Pinned here with a
    planted hot cell (~99.5% of corpus rows in one cell): the executed plan
    must show ShuffledHashJoin(skew=true). If Spark ever regresses this,
    the substring tier's salted-join-back pattern is the fallback."""
    from savio_training_dask_2019_spark.operators.similarity import cell_knn_join

    n = 20_000
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") % 1000 < 995,  # hot direction -> one hot cell
            F.array(F.lit(1.0), (F.col("id") % 7).cast("double") / 100.0),
        )
        .otherwise(
            F.array((F.col("id") % 5).cast("double") / 10.0 - 1.0, F.lit(1.0))
        )
        .alias("embedding"),
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 1.0]), (2, [0.0, -1.0]), (3, [-1.0, -1.0])],
        "cid long, ce array<double>",
    )
    out = cell_knn_join(
        corpus.where(F.col("vec_id") % 50 == 0),
        corpus,
        cents,
        "embedding",
        "vec_id",
        k=3,
        nprobe=2,
        exclude_self=True,
    )
    out.collect()
    plan = _final_plan(out)
    assert "ShuffledHashJoin(skew=true)" in plan, (
        "AQE did not split the planted hot cell — the docstring's skew "
        "claim no longer holds; salt the cell join like the substring tier"
    )
