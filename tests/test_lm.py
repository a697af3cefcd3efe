"""LM-operator unit tests (operators/lm.py): the cap and OOV-floor branches
that never fire when self-scoring the fixture corpus (its vocab is far below
the caps) — exercised here on hand-built fit/score splits."""

from __future__ import annotations

import math

from savio_training_dask_2019_spark.operators import (
    fit_bigram_lm,
    fit_unigram_lm,
    score_bigram_nll,
    score_unigram_nll,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_oov_floor_fires_on_held_out_tokens(spark):
    """Fit on 'a a a b'; score a doc of unseen tokens: every token takes
    the floor -ln(1/s) = ln(4). A mixed doc averages model and floor."""
    fit = _docs(spark, [(1, "a a a b")])
    model, total = fit_unigram_lm(fit, "text", top_k=10)
    scored = {
        r["doc_id"]: r["nll"]
        for r in score_unigram_nll(
            _docs(spark, [(10, "zz yy"), (11, "a zz")]), model, total, "text"
        ).collect()
    }
    s = 4.0
    assert abs(scored[10] - math.log(s)) < 1e-12  # pure OOV: the floor
    expected_mixed = (-math.log(3 / s) + math.log(s)) / 2
    assert abs(scored[11] - expected_mixed) < 1e-12


def test_unigram_cap_cuts_tail_tokens_to_floor(spark):
    """top_k=1 keeps only the most frequent token; the in-corpus tail
    token now scores at the floor, and total mass s stays FULL-vocab (4),
    so the kept token's probability is untouched by the cap."""
    fit = _docs(spark, [(1, "a a a b")])
    model, total = fit_unigram_lm(fit, "text", top_k=1)
    assert [r["token"] for r in model.collect()] == ["a"]
    scored = {
        r["doc_id"]: r["nll"]
        for r in score_unigram_nll(
            _docs(spark, [(10, "a"), (11, "b")]), model, total, "text"
        ).collect()
    }
    assert abs(scored[10] - (-math.log(3 / 4))) < 1e-12
    assert abs(scored[11] - math.log(4)) < 1e-12


def test_bigram_conditional_probability_and_floor(spark):
    """Fit on 'a b a b a c': c(a,b)=2, c(a,c)=1, c(b,a)=2, contexts
    c(a)=3, c(b)=2; s=5. Score 'a b' -> -ln(2/3); score an unseen pair
    -> ln(5)."""
    fit = _docs(spark, [(1, "a b a b a c")])
    model, total = fit_bigram_lm(fit, "text", top_k=10)
    got = {
        (r["w1"], r["w2"]): r["nll_big"] for r in model.collect()
    }
    assert abs(got[("a", "b")] - (-math.log(2 / 3))) < 1e-12
    assert abs(got[("a", "c")] - (-math.log(1 / 3))) < 1e-12
    assert abs(got[("b", "a")] - (-math.log(2 / 2))) < 1e-12
    scored = {
        r["doc_id"]: r["nll"]
        for r in score_bigram_nll(
            _docs(spark, [(10, "a b"), (11, "q q")]), model, total, "text"
        ).collect()
    }
    assert abs(scored[10] - (-math.log(2 / 3))) < 1e-12
    assert abs(scored[11] - math.log(5)) < 1e-12


def test_score_drops_docs_below_min_gram_count(spark):
    """Unigram scoring skips token-less docs; bigram scoring skips docs
    with fewer than 2 tokens — no NULL/NaN rows leak out."""
    fit = _docs(spark, [(1, "a a b")])
    um, ut = fit_unigram_lm(fit, "text")
    bm, bt = fit_bigram_lm(fit, "text")
    target = _docs(spark, [(10, "a b"), (11, "a"), (12, "   ")])
    assert {r["doc_id"] for r in score_unigram_nll(target, um, ut, "text").collect()} == {10, 11}
    assert {r["doc_id"] for r in score_bigram_nll(target, bm, bt, "text").collect()} == {10}
