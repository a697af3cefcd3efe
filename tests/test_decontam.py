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
