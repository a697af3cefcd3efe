"""Behavioral pins for the LLM-pipeline corpus-prep queries (llmpipe.py) —
the oracle-parity differential runs in test_oracle_parity.py; these pin the
semantics the SQL twin can't express (scale invariants, exclusions, bounds).
"""

from __future__ import annotations

from savio_training_dask_2019_spark.queries import llmpipe


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pack_sequences_block_size_invariant(spark, sf_dir, monkeypatch):
    """The two-phase cumsum's block size is a physical-plan knob only: any
    block size must yield identical (bin, n_docs, bin_tokens) rows."""
    base = _rows(llmpipe.q_pack_sequences(spark, sf_dir))
    monkeypatch.setattr(llmpipe, "_PACK_BLOCK", 7)
    assert _rows(llmpipe.q_pack_sequences(spark, sf_dir)) == base
    monkeypatch.setattr(llmpipe, "_PACK_BLOCK", 10_000)  # single block: plain cumsum
    assert _rows(llmpipe.q_pack_sequences(spark, sf_dir)) == base


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Every document lands in exactly one bin: token mass is conserved and
    every bin except possibly the last starts below the budget boundary."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.sources import load_table

    bins = llmpipe.q_pack_sequences(spark, sf_dir).collect()
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(token_count("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["bin_tokens"] for r in bins) == total
    assert sum(r["n_docs"] for r in bins) == load_table(spark, sf_dir, "documents").count()
    assert sorted(r["bin"] for r in bins) == list(range(len(bins)))  # contiguous bins


def test_decontam_excludes_eval_and_bounds(spark, sf_dir):
    rows = llmpipe.q_decontam_check(spark, sf_dir).collect()
    assert rows, "fixture should contain at least one contaminated doc"
    for r in rows:
        assert r["doc_id"] % llmpipe._EVAL_MOD != 0  # eval docs never flagged
        assert 1 <= r["n_hits"] <= r["n_shingles"]
        assert 0.0 < r["contam_frac"] <= 1.0


def test_mixture_sample_bounds(spark, sf_dir):
    rows = {r["lang"]: r for r in llmpipe.q_mixture_sample(spark, sf_dir).collect()}
    assert set(rows) == {lang for lang, _ in llmpipe._MIX_RATES}
    for lang, pct in llmpipe._MIX_RATES:
        r = rows[lang]
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if pct == 100:
            assert r["n_sampled"] == r["n_total"]  # rate 100 keeps everything
        # deterministic hash ≈ uniform: realized rate within ±15pp of target
        assert abs(r["realized_rate"] - pct / 100) < 0.15


def test_gopher_quality_rates_consistent(spark, sf_dir):
    for r in llmpipe.q_gopher_quality(spark, sf_dir).collect():
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert abs(r["pass_rate"] - round(r["n_pass"] / r["n_docs"], 4)) < 1e-9
