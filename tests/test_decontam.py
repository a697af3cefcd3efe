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

    frac = contamination_report(
        _df(spark, TRAIN), _df(spark, EVAL), n=5
    ).collect()[0]["contam_frac"]
    assert frac < 1.0
    lenient = decontaminate(
        _df(spark, TRAIN), _df(spark, EVAL), n=5, max_contam_frac=frac
    )
    assert {r["doc_id"] for r in lenient.collect()} == {1, 2, 3}
