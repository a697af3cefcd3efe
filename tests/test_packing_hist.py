"""SPFHP histogram packing (operators/packing.py): solver validity on
adversarial histograms, end-to-end assignment structure against the solved
strategies, and efficiency/determinism pins."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.operators.packing import (
    assign_packs_histogram,
    pack_assignment_segments,
    spfhp_strategies,
)

_hists = st.dictionaries(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=40),
    min_size=1,
    max_size=10,
)


@settings(max_examples=50, deadline=None, derandomize=True)
@given(hist=_hists)
def test_spfhp_validity_property(hist):
    """Every strategy fits the budget; slot counts reproduce the histogram
    exactly; the solve is deterministic."""
    max_len = 16
    strategies = spfhp_strategies(hist, max_len)
    got = Counter()
    for comp, n in strategies:
        assert n >= 1
        assert sum(comp) <= max_len
        assert list(comp) == sorted(comp, reverse=True)
        for length in comp:
            got[length] += n
    assert dict(got) == hist
    assert strategies == spfhp_strategies(hist, max_len)
    # never worse than one-doc-per-pack
    assert sum(n for _c, n in strategies) <= sum(hist.values())


def test_spfhp_rejects_bad_inputs():
    with pytest.raises(ValueError, match="max_len"):
        spfhp_strategies({1: 1}, 0)
    with pytest.raises(ValueError, match="outside"):
        spfhp_strategies({9: 1}, 8)
    with pytest.raises(ValueError, match="outside"):
        spfhp_strategies({0: 1}, 8)


def test_spfhp_same_length_co_packing():
    """r9 review regression: a length class with no fitting open residual
    must still co-pack with ITSELF — {100: 10} at budget 512 is 2 packs of
    five, never 10 single-doc packs."""
    assert spfhp_strategies({100: 10}, 512) == [((100,) * 5, 2)]
    # non-divisible remainder: 7 docs must still land in ceil(7/5) = 2
    # packs (the round-robin fill gives a 4/3 split — any split into the
    # minimal pack count is a valid SPFHP outcome)
    got = spfhp_strategies({100: 7}, 512)
    assert sum(n for _c, n in got) == 2
    assert sum(len(c) * n for c, n in got) == 7
    # budget below 2x length still yields singles (nothing else fits)
    assert spfhp_strategies({100: 3}, 150) == [((100,), 3)]


def test_spfhp_perfect_fill_case():
    """Complementary lengths must pair up: 60×(5) + 60×(3) at budget 8
    packs into exactly 60 full packs."""
    strategies = spfhp_strategies({5: 60, 3: 60}, 8)
    assert strategies == [((5, 3), 60)]


def test_segments_cover_each_length_exactly():
    strategies = spfhp_strategies({5: 3, 3: 4, 2: 2, 7: 1}, 8)
    segs = pack_assignment_segments(strategies)
    per_len = Counter()
    for length, start, end, _base, _packs in segs:
        assert end > start
        per_len[length] += end - start
    assert dict(per_len) == {5: 3, 3: 4, 2: 2, 7: 1}
    # pack bases partition the global pack-id space
    n_packs = sum(n for _c, n in strategies)
    bases = sorted({(b, p) for _l, _s, _e, b, p in segs})
    covered = sorted(
        pid for b, p in {(b, p) for _l, _s, _e, b, p in segs} for pid in range(b, b + p)
    )
    assert covered == list(range(n_packs))


def test_assign_packs_histogram_end_to_end(spark):
    """Distributed assignment == the driver solution: every row packed
    exactly once, each pack's sorted lengths equal its strategy
    composition, pack count per composition matches."""
    rows = [(i, length) for i, length in enumerate(
        [5] * 7 + [3] * 9 + [2] * 4 + [7] * 2 + [8] * 1
    )]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    max_len = 8
    assigned, strategies = assign_packs_histogram(df, "doc_id", "n_tok", max_len)
    out = assigned.collect()
    assert sorted(r["doc_id"] for r in out) == [r[0] for r in rows]  # all, once
    by_pack: dict[int, list[int]] = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r["n_tok"])
    comp_counts = Counter(tuple(sorted(v, reverse=True)) for v in by_pack.values())
    assert comp_counts == Counter(dict(strategies))
    assert all(sum(v) <= max_len for v in by_pack.values())
    n_packs = sum(n for _c, n in strategies)
    assert sorted(by_pack) == list(range(n_packs))


def test_pack_bfd_catalog_query(spark, sf_dir):
    """Fixture run: fill ratios in (0, 1], token mass conserved vs the
    truncated corpus, and strictly better packing than one-doc-per-pack."""
    from savio_training_dask_2019_spark.queries.llmpipe import (
        _BFD_MAX_LEN,
        q_pack_bfd,
    )
    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.sources import load_table

    rows = q_pack_bfd(spark, sf_dir).collect()
    assert rows
    assert all(0 < r["avg_fill"] <= 1.0 for r in rows)
    d = load_table(spark, sf_dir, "documents").select(
        F.least(token_count("text"), F.lit(_BFD_MAX_LEN)).alias("n_tok")
    ).where(F.col("n_tok") >= 1)
    agg = d.agg(F.sum("n_tok").alias("toks"), F.count(F.lit(1)).alias("docs")).first()
    assert sum(r["tokens"] for r in rows) == agg["toks"]
    n_packs = sum(r["n_packs"] for r in rows)
    assert n_packs < agg["docs"]  # actually packs multiple docs together


def test_assign_packs_histogram_validates_before_collect(spark):
    """r9 review: out-of-contract lengths must raise from the 1-row bounds
    aggregate (before any length-proportional collect), and empty input
    short-circuits to an empty assignment."""
    bad = spark.createDataFrame([(0, 9)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match=r"lengths outside \[1, max_len=8\]"):
        assign_packs_histogram(bad, "doc_id", "n_tok", 8)
    zero = spark.createDataFrame([(0, 0)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="truncate/filter first"):
        assign_packs_histogram(zero, "doc_id", "n_tok", 8)
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    assigned, strategies = assign_packs_histogram(empty, "doc_id", "n_tok", 8)
    assert strategies == [] and assigned.count() == 0
    assert "pack_id" in assigned.columns
