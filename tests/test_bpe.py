"""Differential pins for the iterative BPE trainer (operators/bpe.py):
the learned merge sequence and final segmentation must match a pure-Python
reference trainer exactly — including argmax tie-breaks and leftmost
non-overlapping apply semantics."""

from __future__ import annotations

from collections import Counter

import pytest

from savio_training_dask_2019_spark.operators import bpe_train, word_frequency_table
from savio_training_dask_2019_spark.sources import load_table


def _py_apply(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _py_train(wc: dict[str, int], n_merges: int):
    seg = {w: (list(w), c) for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter[tuple] = Counter()
        for syms, c in seg.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        seg = {w: (_py_apply(syms, left, right), c) for w, (syms, c) in seg.items()}
    return merges, seg


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """Merge sequence AND final segmentation over the real fixture corpus
    must equal the reference trainer's, round for round."""
    d = load_table(spark, sf_dir, "documents")
    wc_df = word_frequency_table(d, "text")
    wc = {r["word"]: r["wc"] for r in wc_df.collect()}
    want_merges, want_seg = _py_train(wc, n_merges=8)
    got_merges, got_seg = bpe_train(wc_df, n_merges=8)
    assert got_merges == want_merges
    got_rows = {r["word"]: list(r["syms"]) for r in got_seg.collect()}
    assert got_rows == {w: syms for w, (syms, _c) in want_seg.items()}


def test_bpe_apply_overlap_and_ties(spark):
    """Leftmost non-overlapping apply ('aaa' + merge(a,a) -> ['aa','a'])
    and deterministic (count desc, left, right) argmax tie-breaks."""
    df = spark.createDataFrame([(1, "aaa aaa bb bb")], ["id", "text"])
    merges, seg = bpe_train(word_frequency_table(df, "text"), n_merges=1)
    # round 1: (a,a) weight 4 beats (b,b) weight 2
    assert merges[0][:2] == ("a", "a") and merges[0][2] == 4
    rows = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert rows["aaa"] == ["aa", "a"]  # leftmost merge applied, overlap skipped
    # round 2 is a weight tie — ('aa','a') 2 vs ('b','b') 2 — broken on the
    # left symbol: 'aa' < 'b', so the chain merge wins deterministically
    merges2, seg2 = bpe_train(word_frequency_table(df, "text"), n_merges=2)
    assert merges2[1][:2] == ("aa", "a")
    assert {r["word"]: list(r["syms"]) for r in seg2.collect()}["aaa"] == ["aaa"]
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(word_frequency_table(df, "text"), n_merges=0)


def test_bpe_train_merges_query_shape(spark, sf_dir):
    from savio_training_dask_2019_spark.queries import QUERIES

    rows = QUERIES["bpe_train_merges"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["weight"] > 0


def test_corpus_piece_stats_matches_python(spark):
    """Train→apply end-to-end: per-group piece totals under the learned
    merges must equal the pure-Python trainer + segmenter."""
    from savio_training_dask_2019_spark.operators import corpus_piece_stats

    rows = [
        (0, "aba abab ab aba", "en"),
        (1, "abab abab bb a", "en"),
        (2, "ba bab aba abba", "fr"),
        (3, "a b ab ba abab", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    wc = Counter(w for _, t, _ in rows for w in t.split())
    _merges, seg = __import__(
        "savio_training_dask_2019_spark.operators.bpe", fromlist=["bpe_train"]
    ).bpe_train(word_frequency_table(df, "text"), n_merges=4)
    got = {
        r["lang"]: (r["total_words"], r["total_pieces"], r["pieces_per_word"])
        for r in corpus_piece_stats(df, "text", "lang", seg).collect()
    }

    _pm, pseg = _py_train(dict(wc), 4)
    want = {}
    for _, t, lang in rows:
        for w in t.split():
            tw, tp = want.get(lang, (0, 0))
            want[lang] = (tw + 1, tp + len(pseg[w][0]))
    want = {
        lang: (tw, tp, round(tp / tw, 4)) for lang, (tw, tp) in want.items()
    }
    assert got == want


def test_corpus_piece_stats_oov_fallback(spark):
    """Applying a trained segmentation to a corpus with words the trainer
    never saw: OOV words are NOT dropped — they count length(word) pieces
    (the character-level initial segmentation), matching the pure-Python
    reference extended the same way (ADVICE r8)."""
    from savio_training_dask_2019_spark.operators import corpus_piece_stats

    train_rows = [(0, "aba abab ab aba", "en"), (1, "abab abab bb a", "en")]
    train_df = spark.createDataFrame(train_rows, "doc_id long, text string, lang string")
    _merges, seg = bpe_train(word_frequency_table(train_df, "text"), n_merges=3)

    # apply-corpus: 'zzzz' and 'qx' are OOV; 'abab' is in-vocab
    apply_rows = [(0, "abab zzzz qx", "en"), (1, "zzzz zzzz", "fr")]
    apply_df = spark.createDataFrame(apply_rows, "doc_id long, text string, lang string")
    got = {
        r["lang"]: (r["total_words"], r["total_pieces"], r["pieces_per_word"])
        for r in corpus_piece_stats(apply_df, "text", "lang", seg).collect()
    }

    wc = Counter(w for _, t, _ in train_rows for w in t.split())
    _pm, pseg = _py_train(dict(wc), 3)
    want: dict[str, tuple] = {}
    for _, t, lang in apply_rows:
        for w in t.split():
            n = len(pseg[w][0]) if w in pseg else len(w)  # OOV -> chars
            tw, tp = want.get(lang, (0, 0))
            want[lang] = (tw + 1, tp + n)
    want = {lang: (tw, tp, round(tp / tw, 4)) for lang, (tw, tp) in want.items()}
    assert got == want
    assert got["fr"] == (2, 8, 4.0)  # pure-OOV group survives, char-counted
