"""Text-analysis query invariants beyond oracle parity (SURVEY.md §5):
analytic bounds that are true of the math itself, independent of fixtures."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F

from savio_training_dask_2019_spark.functions.text import tokens
from savio_training_dask_2019_spark.queries import textops
from savio_training_dask_2019_spark.sources import load_table


def test_token_entropy_within_shannon_bounds(spark, sf_dir):
    """0 <= H(doc) <= ln(doc token count) for every doc, so every
    per-language band must sit inside [0, ln(max doc length)]; bands are
    internally consistent; and the doc count matches the non-empty corpus."""
    rows = textops.q_token_entropy(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    non_empty = d.where(F.size(tokens("text")) > 0)
    assert sum(r["n_docs"] for r in rows) == non_empty.count()
    max_len = non_empty.select(F.max(F.size(tokens("text")))).collect()[0][0]
    for r in rows:
        assert 0 <= r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"]
        assert r["max_entropy"] <= math.log(max_len) + 1e-9


def test_token_entropy_exact_on_known_distribution(spark):
    """Hand-checkable doc: 'a a b b' has H = ln 2; 'a a a a' has H = 0."""
    df = spark.createDataFrame(
        [(1, "a a b b", "xx"), (2, "a a a a", "xx")],
        "doc_id long, text string, lang string",
    )
    n = F.size(F.col("tk")).cast("double")
    probs = F.transform(
        F.array_distinct("tk"),
        lambda x: F.size(F.filter("tk", lambda y: y == x)).cast("double") / n,
    )
    ent = F.aggregate(probs, F.lit(0.0), lambda acc, p: acc - p * F.log(p))
    got = {
        r["doc_id"]: r["ent"]
        for r in df.select("doc_id", tokens("text").alias("tk"))
        .select("doc_id", ent.alias("ent"))
        .collect()
    }
    assert abs(got[1] - math.log(2)) < 1e-12
    assert abs(got[2]) < 1e-12


def test_normalize_for_dedup_collapses_variants(spark):
    """Case, punctuation, and whitespace variants of the same passage must
    normalize to the identical string; genuinely different text must not."""
    from savio_training_dask_2019_spark.functions.text import normalize_for_dedup

    df = spark.createDataFrame(
        [
            (1, "Shared Passage, Number 3!"),
            (2, "  shared   passage number 3 "),
            (3, "shared passage number 3"),
            (4, "a different passage number 3"),
        ],
        "doc_id long, t string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_for_dedup("t").alias("n")).collect()
    }
    assert got[1] == got[2] == got[3] == "shared passage number 3"
    assert got[4] != got[3]


def test_normalize_for_dedup_unicode_whitespace_and_duckdb_parity(spark):
    """NBSP / vertical-tab / ideographic-space variants must collapse with
    their ASCII-space twins (a bare \\s would strip NBSP into 'foobar'), and
    the Spark normalization must agree byte-for-byte with the DuckDB oracle
    twin on the same inputs — including \\x0B, where Java's \\s and RE2's
    \\s disagree."""
    import duckdb

    from savio_training_dask_2019_spark.functions.text import normalize_for_dedup
    from savio_training_dask_2019_spark.queries.llmpipe import _DUCK_NORM

    rows = [
        (1, "foo bar"),
        (2, "foo\u00a0bar"),          # NBSP
        (3, "foo\x0bbar"),            # vertical tab
        (4, "foo\u3000\u2003bar"),    # ideographic + em space
        (5, "foo\u2028bar!"),         # line separator + punctuation
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_for_dedup("t").alias("n")).collect()
    }
    assert all(v == "foo bar" for v in got.values()), got

    con = duckdb.connect()
    for doc_id, t in rows:
        (duck,) = con.execute(
            f"SELECT {_DUCK_NORM} FROM (SELECT ? AS t)", [t]
        ).fetchone()
        assert duck == got[doc_id], (doc_id, duck, got[doc_id])


def test_norm_dedup_stats_lift_is_positive_and_bounded(spark, sf_dir):
    """The planted variant families guarantee lift > 0, and the distinct
    counts must be consistent: norm <= raw <= n_docs."""
    from savio_training_dask_2019_spark.queries import llmpipe

    r = llmpipe.q_norm_dedup_stats(spark, sf_dir).collect()[0]
    assert r["distinct_norm"] <= r["distinct_raw"] <= r["n_docs"]
    assert r["norm_dup_lift"] == r["distinct_raw"] - r["distinct_norm"]
    assert r["norm_dup_lift"] > 0


def test_predict_lang_model_seam(spark):
    """The declared swap-in contract (functions.text.LangModel): any
    text-Column -> lang-Column callable replaces the marker heuristic via
    predict_lang(..., model=...) with no caller changes. A mock 'trained
    model' (an Arrow-batched pandas_udf, the exact shape a fastText scorer
    takes) must flow through end-to-end; the default path must stay the
    heuristic."""
    from pyspark.sql.functions import pandas_udf

    from savio_training_dask_2019_spark.functions.text import predict_lang

    @pandas_udf("string")
    def mock_model(texts: pd.Series) -> pd.Series:
        # stand-in for fastText.predict: deterministic on content
        return texts.map(lambda t: "zz" if "zebra" in t else "qq")

    df = spark.createDataFrame(
        [(1, "the zebra and the fox"), (2, "the cat and the dog")],
        "doc_id long, text string",
    )
    swapped = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", predict_lang("text", model=mock_model).alias("lang")
        ).collect()
    }
    assert swapped == {1: "zz", 2: "qq"}
    default = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", predict_lang("text").alias("lang")).collect()
    }
    assert default == {1: "en", 2: "en"}  # heuristic untouched by the seam


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """Round-one BPE pair counts == a pure-Python recount over the same
    fixture corpus (frequency-weighted, per-position overlapping pairs)."""
    from collections import Counter

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    wc: Counter[str] = Counter()
    for t in texts:
        wc.update(w for w in t.split() if w)
    pc: Counter[str] = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += n
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        (r["pair"], r["cnt"]) for r in textops.q_bpe_merges(spark, sf_dir).collect()
    ]
    assert got == expected


def test_collocations_match_python_reference(spark, sf_dir):
    """Top-20 PMI collocations == a pure-Python recount (bigram/unigram
    frequencies, natural-log PMI, min-count floor, rounded-PMI ordering
    with pair tie-breaks)."""
    import math
    from collections import Counter

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    uni: Counter[str] = Counter()
    bi: Counter[tuple] = Counter()
    for t in texts:
        tk = [w for w in t.split() if w]
        uni.update(tk)
        bi.update(zip(tk, tk[1:]))
    t_uni, t_bi = sum(uni.values()), sum(bi.values())
    scored = [
        (w1, w2, n, round(math.log((n / t_bi) / ((uni[w1] / t_uni) * (uni[w2] / t_uni))), 4))
        for (w1, w2), n in bi.items()
        if n >= textops._COLLOC_MIN_COUNT
    ]
    expected = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:20]
    got = [
        (r["w1"], r["w2"], r["n_ab"], r["pmi"])
        for r in textops.q_collocations(spark, sf_dir).collect()
    ]
    assert got == expected


def test_bm25_search_matches_python_reference(spark, sf_dir):
    """Top-10 BM25 == a pure-Python Okapi implementation (Lucene IDF
    variant, k1=1.2, b=0.75) over the same fixture corpus."""
    import math
    from collections import Counter

    docs = {
        r["doc_id"]: r["text"].split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    tf = {did: Counter(w for w in tk if w in textops._BM25_TERMS) for did, tk in docs.items()}
    df = Counter(term for c in tf.values() for term in c)
    k1, b = textops._BM25_K1, textops._BM25_B
    scores = {}
    for did, c in tf.items():
        if not c:
            continue
        dl = len(docs[did])
        s = sum(
            math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            * (n * (k1 + 1))
            / (n + k1 * (1 - b + b * dl / avgdl))
            for t, n in c.items()
        )
        scores[did] = round(s, 4)
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["doc_id"], r["bm25"]) for r in textops.q_bm25_search(spark, sf_dir).collect()]
    assert got == expected


def test_winnow_fp_matches_python_reference(spark):
    """Winnowing selection == the paper's algorithm run in pure Python:
    per window of _WINNOW_W consecutive k-gram keys, select the minimum by
    (key asc, position desc) — rightmost minimal — then dedup positions.
    Includes a tie-heavy doc (all-same tokens) and a too-short doc."""
    from savio_training_dask_2019_spark.queries import textops

    k, w = textops._WINNOW_K, textops._WINNOW_W
    rows = [
        (0, "b a c a b a c a b d e f", "en"),
        (1, "x x x x x x x x", "en"),          # all ties -> rightmost wins
        (2, "only five tokens right here", "fr"),  # 5 < k+w-1=6: excluded
        (3, "m n o p q r s t u v", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def ref_doc(toks):
        sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(sh) < w:
            return None
        sel = set()
        for j in range(len(sh) - w + 1):
            # min by (key asc, pos desc): max position among minimal keys
            win = list(range(j, j + w))
            mkey = min(sh[p] for p in win)
            sel.add(max(p for p in win if sh[p] == mkey))
        return sorted(sel), [sh[p] for p in sorted(sel)]

    want = {}
    for _did, text, lang in rows:
        r = ref_doc(text.split())
        if r is None:
            continue
        pos, keys = r
        st = want.setdefault(lang, {"n": 0, "sel": 0, "dist": 0, "keys": set()})
        st["n"] += 1
        st["sel"] += len(pos)
        st["dist"] += len(set(keys))
        st["keys"] |= set(keys)

    # route through the catalog query against a planted parquet dir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.withColumn("source", F.lit("s")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["lang"]: (
                r["n_docs"],
                r["avg_selected"],
                r["avg_distinct"],
                r["corpus_unique_keys"],
            )
            for r in textops.q_winnow_fp(spark, d).collect()
        }
    assert got == {
        lang: (
            st["n"],
            round(st["sel"] / st["n"], 4),
            round(st["dist"] / st["n"], 4),
            len(st["keys"]),
        )
        for lang, st in want.items()
    }
    # density sanity: expected ~2/(w+1) of windows for random-ish text, and
    # the all-ties doc collapses to ONE fingerprint per run of w
    assert got["en"][0] == 2


def test_repetition_stats_pinned_examples(spark):
    """The Gopher top-2-gram char fraction on hand-computable docs,
    including the overlap cap ('a a a a' -> capped at 1.0), a no-repeat
    doc, and a one-token doc (frac 0, still counted)."""
    from savio_training_dask_2019_spark.queries.llmpipe import q_repetition_stats

    rows = [
        # 'a a' x3 (overlapping), len('a a')=3, chars=7 -> 9/7 capped 1.0
        (0, "a a a a", "en"),
        # top bigram 'x y' x2, len 3, chars = len('x y z x y')=9 -> 6/9=0.6667
        (1, "x y z x y", "en"),
        (2, "p q r s", "fr"),  # all bigrams unique: 1*3/7 = 0.4286
        (3, "solo", "fr"),     # <2 tokens -> 0.0, still in n_docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.withColumn("source", F.lit("s")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["lang"]: (
                r["n_docs"],
                r["avg_top2_frac"],
                r["max_top2_frac"],
                r["n_flagged"],
            )
            for r in q_repetition_stats(spark, d).collect()
        }
    en = round((1.0 + round(6 / 9, 4)) / 2, 4)
    fr = round((round(3 / 7, 4) + 0.0) / 2, 4)
    assert got == {
        "en": (2, en, 1.0, 2),
        "fr": (2, fr, round(3 / 7, 4), 1),
    }


def test_source_overlap_planted_matrix(spark, tmp_path):
    """Cross-source duplicate matrix on a hand-built corpus: sources A/B
    share 2 texts, A/C share 1, B/C none; overlap_frac divides by the
    smaller inventory."""
    import os

    from savio_training_dask_2019_spark.queries import QUERIES

    rows = [
        # doc_id chosen % 29 != 0 so the planted-hash branch stays quiet
        (1, "A", "shared one"), (2, "A", "shared two"), (3, "A", "only a"),
        (4, "B", "shared one"), (5, "B", "shared two"),
        (6, "C", "shared one"), (7, "C", "only c1"), (8, "C", "only c2"),
        (9, "C", "only c3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = str(tmp_path / "so")
    df.write.parquet(os.path.join(out, "documents.parquet"))
    got = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["overlap_frac"])
        for r in QUERIES["source_overlap"](spark, out).collect()
    }
    # A: 3 distinct hashes, B: 2, C: 4
    assert got[("A", "B")] == (2, round(2 / 2, 6))
    assert got[("A", "C")] == (1, round(1 / 3, 6))
    assert got[("B", "C")] == (1, round(1 / 2, 6))
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_melt_metrics_expand_no_shuffle(spark, sf_dir):
    """Native unpivot plans as Expand — a narrow per-task fan-out: zero
    exchanges, one pushed-predicate scan; output rows = 4x input rows with
    all four metrics per (order, line)."""
    from collections import Counter

    from savio_training_dask_2019_spark import plans
    from savio_training_dask_2019_spark.queries import QUERIES

    df = QUERIES["melt_metrics"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Expand" in plan
    assert plans.shuffle_count(df) == 0
    assert plans.scan_count(df) == 1
    rows = df.collect()
    from savio_training_dask_2019_spark.queries.relational import _MELT_MOD
    from savio_training_dask_2019_spark.sources import load_table

    n_in = (
        load_table(spark, sf_dir, "lineitem")
        .where(f"l_orderkey % {_MELT_MOD} = 0")
        .count()
    )
    assert len(rows) == 4 * n_in  # Expand: exactly one row per metric per input
    per_line = Counter((r["l_orderkey"], r["l_linenumber"]) for r in rows)
    # (orderkey, linenumber) is not unique in the synthetic fixture — each
    # key's fan-out is a multiple of 4, never a remainder
    assert per_line and all(v % 4 == 0 for v in per_line.values())
    assert {r["metric"] for r in rows} == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    }


def test_heaps_curve_planted_vocabulary(spark, tmp_path):
    """Hand-built corpus: bucket 0 introduces 2 shingle types, bucket 1
    re-uses one of them and adds 1 new type, so new_types = [2, 1] and
    vocab_cum = [2, 3]; a repeat of a known doc adds nothing."""
    import pandas as pd

    from savio_training_dask_2019_spark.queries import textops

    docs = [
        (0, "a b c d"),          # shingles: 'a b c', 'b c d'
        (60, "a b c x"),         # re-uses 'a b c', adds 'a b c x'→'b c x'
        (70, "a b c d"),         # exact repeat — nothing new
    ]
    pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": "en",
            "source": "s",
            "n_chars": [len(d[1]) for d in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        r["bucket"]: (r["new_types"], r["vocab_cum"])
        for r in textops.q_heaps_curve(spark, str(tmp_path)).collect()
    }
    assert got == {0: (2, 2), 1: (1, 3)}


def _jsd_docs(tmp_path, pairs):
    """pairs: (source, text)."""
    pd.DataFrame(
        {
            "doc_id": list(range(len(pairs))),
            "text": [t for _, t in pairs],
            "lang": "en",
            "source": [s for s, _ in pairs],
            "n_chars": [len(t) for _, t in pairs],
        }
    ).to_parquet(tmp_path / "documents.parquet")


def test_jsd_sources_closed_forms(spark, tmp_path):
    """Disjoint vocabularies -> JSD exactly 1 bit each way; identical
    distributions -> 0; a single-source corpus has no rest -> NULL."""
    from savio_training_dask_2019_spark.queries.textops import q_jsd_sources

    d1 = tmp_path / "disjoint"
    d1.mkdir()
    _jsd_docs(d1, [("A", "x x"), ("B", "y")])
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["jsd_bits"])
        for r in q_jsd_sources(spark, str(d1)).collect()
    }
    assert got == {"A": (2, 1, 1.0), "B": (1, 1, 1.0)}

    d2 = tmp_path / "identical"
    d2.mkdir()
    _jsd_docs(d2, [("A", "w z"), ("B", "w z")])
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["jsd_bits"])
        for r in q_jsd_sources(spark, str(d2)).collect()
    }
    assert got == {"A": (2, 2, 0.0), "B": (2, 2, 0.0)}

    d3 = tmp_path / "single"
    d3.mkdir()
    _jsd_docs(d3, [("A", "hello world")])
    got = [
        (r["source"], r["n_tokens"], r["n_types"], r["jsd_bits"])
        for r in q_jsd_sources(spark, str(d3)).collect()
    ]
    assert got == [("A", 2, 2, None)]
