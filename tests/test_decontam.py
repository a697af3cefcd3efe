"""Decontamination operator tests (operators/decontam.py): the two-corpus
surface on hand-built train/eval splits — planted overlaps detected, clean
docs untouched, thresholded removal."""

from __future__ import annotations


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EVAL = [(100, "the quick brown fox jumps over the lazy dog")]
TRAIN = [
    # contains the eval 5-gram "quick brown fox jumps over" (and more)
    (1, "intro words then the quick brown fox jumps over a fence"),
    # shares words but no 5-gram run
    (2, "quick dog and lazy fox words brown jumps scattered over"),
    # too short to hold any 5-gram
    (3, "tiny doc"),
]


def test_contamination_report_flags_only_overlapping_docs(spark):
    from savio_training_dask_2019_spark.operators import contamination_report

    rep = {
        r["doc_id"]: r
        for r in contamination_report(
            _df(spark, TRAIN), _df(spark, EVAL), n=5
        ).collect()
    }
    assert set(rep) == {1}  # doc 2 shares words, not 5-grams; doc 3 too short
    # doc 1: tokens 3..11 hold the eval run starting at "the quick brown ..."
    assert rep[1]["n_hits"] >= 1
    assert 0 < rep[1]["contam_frac"] <= 1


def test_decontaminate_drops_flagged_keeps_rest(spark):
    from savio_training_dask_2019_spark.operators import decontaminate

    clean = decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=5)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}
    assert clean.columns == ["doc_id", "text"]  # schema preserved


def test_decontaminate_threshold_spares_light_contamination(spark):
    from savio_training_dask_2019_spark.operators import (
        contamination_report,
        decontaminate,
    )

    rep = contamination_report(
        _df(spark, TRAIN), _df(spark, EVAL), n=5
    ).collect()[0]
    # decontaminate thresholds the UNROUNDED fraction, so the sparing
    # threshold must be the exact n_hits/n_shingles, not the 4-decimal
    # display column (which rounds 2/7 down to 0.2857 < 2/7).
    frac = rep["n_hits"] / rep["n_shingles"]
    assert frac < 1.0
    lenient = decontaminate(
        _df(spark, TRAIN), _df(spark, EVAL), n=5, max_contam_frac=frac
    )
    assert {r["doc_id"] for r in lenient.collect()} == {1, 2, 3}


def test_decontaminate_long_doc_rounding_regression(spark):
    """A >20k-shingle doc with ONE eval overlap has contam_frac < 0.00005,
    which rounds to 0.0 in the report — it must still be dropped under the
    default drop-on-ANY-overlap policy (threshold on the unrounded
    fraction, not the display column)."""
    from savio_training_dask_2019_spark.operators import (
        contamination_report,
        decontaminate,
    )

    words = [f"w{i}" for i in range(25000)]
    # splice exactly one eval 5-gram into an otherwise-unique stream:
    # 1 hit / ~25k shingles = 4e-5, which rounds to 0.0 at 4 decimals
    long_text = " ".join(
        words[:12500]
        + ["the", "quick", "brown", "fox", "jumps"]
        + words[12500:]
    )
    train = _df(spark, [(7, long_text)])
    rep = contamination_report(train, _df(spark, EVAL), n=5).collect()
    assert len(rep) == 1 and rep[0]["contam_frac"] == 0.0  # rounds to zero
    clean = decontaminate(train, _df(spark, EVAL), n=5)
    assert clean.count() == 0  # dropped despite the rounded-to-0 display


# --- Bloom-prefiltered tier ---------------------------------------------------


def _bloom_fixture(spark):
    """300 docs over a closed vocab with a shared sentence planted in ~1/9 —
    enough true 5-gram overlap to make equality non-vacuous."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    shared = [
        "the quick brown fox jumps over the lazy dog",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
    ]
    rows = []
    for i in range(300):
        words = rng.choices(vocab, k=rng.randint(6, 40))
        if i % 9 == 0:
            words += shared[i % 2].split()
        rows.append((i, " ".join(words)))
    df = _df(spark, rows)
    return df.where("doc_id % 7 != 0"), df.where("doc_id % 7 = 0")


def test_bloom_report_equals_exact_both_confirm_modes(spark):
    """The Bloom tier is a pre-filter, not an approximation: its report is
    bit-identical to the exact one under broadcast AND shuffle confirm."""
    from savio_training_dask_2019_spark.operators.decontam import (
        bloom_contamination_report,
        contamination_report,
    )

    train, ev = _bloom_fixture(spark)
    exact = sorted(map(tuple, contamination_report(train, ev).collect()))
    assert len(exact) > 10  # non-vacuous: the fixture plants real overlap
    for confirm in ("broadcast", "shuffle"):
        got = sorted(
            map(
                tuple,
                bloom_contamination_report(train, ev, confirm=confirm).collect(),
            )
        )
        assert got == exact


def test_bloom_prefilter_actually_filters(spark):
    """With a DISJOINT eval vocab the exact answer is empty and every
    bloom-positive shingle is a false positive — their count must be a
    small fraction of the train shingle stream (~1 % expected at 10 bits /
    5 hashes; assert a loose 5 % so the pin never flakes — it is
    deterministic anyway given fixed data + xxhash64)."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.operators.bloom import (
        bloom_build,
        bloom_flag,
        next_pow2,
    )
    from savio_training_dask_2019_spark.operators.decontam import (
        _hashed_shingles,
        bloom_contamination_report,
    )

    train, _ = _bloom_fixture(spark)
    ev = _df(
        spark,
        [(1000 + i, " ".join(f"z{i}_{j}" for j in range(12))) for i in range(40)],
    )
    assert bloom_contamination_report(train, ev).count() == 0

    # re-build the candidate stream with the shared bloom operators to
    # observe the admission rate the report hides
    evh = _hashed_shingles(ev, "text", None, 5).select("sh_h").distinct()
    m_bits = next_pow2(max(1024, 10 * evh.count()))
    bloom = bloom_build(evh, "sh_h", m_bits, 5)
    sh = _hashed_shingles(train, "text", "doc_id", 5)
    total = sh.count()
    admitted = (
        bloom_flag(sh, "sh_h", bloom, m_bits, 5).where("__maybe").count()
    )
    assert admitted < 0.05 * total, (admitted, total)


def test_bloom_empty_eval_and_param_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.operators.bloom import bloom_words_masks
    from savio_training_dask_2019_spark.operators.decontam import (
        bloom_contamination_report,
    )

    train, ev = _bloom_fixture(spark)
    empty = ev.where("doc_id < 0")
    assert (
        bloom_contamination_report(train, empty, expected_items=0).count() == 0
    )
    with pytest.raises(ValueError, match="power of two"):
        bloom_words_masks(F.col("x"), 1000, 5)
    with pytest.raises(ValueError, match="confirm"):
        bloom_contamination_report(train, ev, confirm="exactly")


def test_bloom_plan_shape(spark):
    """One BNLJ (the 1-row bitset-map attach) and at least one broadcast
    hash join (the exact confirm) — the corpus side never shuffles before
    the per-doc aggregation."""
    from savio_training_dask_2019_spark import plans
    from savio_training_dask_2019_spark.operators.decontam import (
        bloom_contamination_report,
    )

    train, ev = _bloom_fixture(spark)
    rep = bloom_contamination_report(train, ev, expected_items=4096)
    assert plans.bnlj_count(rep) == 1
    assert plans.broadcast_join_count(rep) >= 1
