"""LLM-training-data pipeline queries (SURVEY.md §2.12 extension tier):
benchmark decontamination, Gopher-style quality gating, sequence packing,
mixture-weighted sampling, and intra-document repetition signals.

These are the corpus-preparation operations a 100 TB pretraining pipeline
runs *after* dedup (operators/dedup.py) and *before* tokenizer sharding.
Every query here stays JVM-side (higher-order array functions inside
whole-stage codegen — no Python boundary, no row UDFs) and every one has an
exact DuckDB oracle twin.

Scale design (SCALING.md has the long-form versions):

- **decontam_check**: the eval-benchmark shingle set is tiny relative to the
  corpus (benchmarks are MBs; the corpus is TBs), so it is ``broadcast`` —
  the corpus side is one scan plus one per-doc count shuffle. At 100 TB,
  shingle *strings* would widen the shuffle; hash each shingle to
  ``xxhash64`` (8 bytes) on both sides first — elided here only so the
  oracle twin stays cross-engine exact.
- **pack_sequences**: a naive global-order cumulative sum is a
  single-partition window — the classic scale trap. Implemented two-phase:
  per-block partial sums → a tiny window over block ids → broadcast the
  block offsets back and finish with a window *partitioned by block*. The
  only global window runs over n_docs/BLOCK rows.
- **gopher_quality / dup_ngram_ratio / mixture_sample**: pure narrow maps +
  one O(groups) aggregation — scan-speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import avg_word_len, stopword_ratio, token_count, tokens
from ..sources import ensure_min_partitions, load_table

# DuckDB twin of functions.text.tokens() (kept in sync with textops.py)
_DUCK_TOKENS = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"


def _word_shingles(tok_col, n: int):
    """n-token shingles joined with ' ' — JVM-side (transform over sequence).

    Caller must filter ``size(tok) >= n`` first: Spark's ``sequence(1, k)``
    with k < 1 yields a *descending* sequence, not an empty one.
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
        lambda i: F.array_join(F.slice(tok_col, i, n), " "),
    )


# --- benchmark decontamination ---------------------------------------------

_EVAL_MOD = 23  # doc_id % 23 == 0 plays the role of the held-out eval set
_SHINGLE_N = 5


def q_decontam_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination scan: which training docs contain a word
    5-gram that also appears in the eval set (docs with doc_id % 23 == 0)?

    The standard pretraining hygiene step (n-gram overlap decontamination à
    la GPT-3 appendix C): eval shingles are collected small-side and
    broadcast; training docs count their distinct overlapping shingles.
    Output: one row per contaminated doc with hit count and contamination
    fraction — the downstream pipeline drops or redacts flagged docs.
    """
    base = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0

    def shingled(docs: DataFrame) -> DataFrame:
        # filter FIRST, shingle after: the eval split is ~4% of the corpus,
        # and shingling is the expensive transform — shingle-then-filter
        # would pay it for every doc on both branches
        d = docs.select("doc_id", tokens("text").alias("tk")).where(
            F.size("tk") >= _SHINGLE_N
        )
        per_doc = d.select(
            "doc_id",
            F.array_distinct(_word_shingles(F.col("tk"), _SHINGLE_N)).alias("shs"),
        )
        return per_doc.select(
            "doc_id", F.size("shs").alias("n_shingles"), F.explode("shs").alias("shingle")
        )

    eval_shingles = shingled(base.where(is_eval)).select("shingle").distinct()
    return (
        shingled(base.where(~is_eval))
        .join(F.broadcast(eval_shingles), "shingle")  # eval set: small, broadcast
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),  # shingles pre-distinct per doc
            F.max("n_shingles").alias("n_shingles"),
            F.round(F.count(F.lit(1)) / F.max("n_shingles"), 4).alias("contam_frac"),
        )
    )


_DECONTAM_SQL = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
  WHERE len({_DUCK_TOKENS}) >= {_SHINGLE_N}
),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tk) - {_SHINGLE_N - 2}),
                                      i -> array_to_string(tk[i:i + {_SHINGLE_N - 1}], ' '))) AS shs
  FROM t
),
sh AS (SELECT doc_id, len(shs) AS n_shingles, unnest(shs) AS shingle FROM shl),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0)
SELECT s.doc_id,
       count(*) AS n_hits,
       CAST(max(s.n_shingles) AS INTEGER) AS n_shingles,
       round(CAST(count(*) AS DOUBLE) / max(s.n_shingles), 4) AS contam_frac
FROM sh s JOIN ev USING (shingle)
WHERE s.doc_id % {_EVAL_MOD} <> 0
GROUP BY s.doc_id
"""


# --- Gopher-style quality gate ----------------------------------------------


def _dup_bigram_frac(tok_col) -> F.Column:
    """1 - distinct/total over word bigrams — the Gopher repetition signal."""
    bigrams = _word_shingles(tok_col, 2)
    return F.when(F.size(tok_col) < 2, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams)
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 §A1.1 shape): token count in
    [50, 100k], mean word length in [3, 10], stopword ratio ≥ 0.05, repeated-
    bigram fraction ≤ 0.10. Per-language pass counts — the corpus-curation
    dashboard number. All four signals are codegen'd array expressions; the
    whole query is one scan + one O(langs) aggregation at any corpus size."""
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    tk = tokens("text")
    passes = (
        token_count("text").between(50, 100_000)
        & avg_word_len("text").between(3.0, 10.0)
        & (stopword_ratio("text") >= 0.05)
        & (_dup_bigram_frac(tk) <= 0.10)
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(passes.cast("long")).alias("n_pass"),
        F.round(F.avg(passes.cast("double")), 4).alias("pass_rate"),
    )


_GOPHER_SQL = f"""
WITH s AS (
  SELECT lang,
         CASE WHEN len(tk) BETWEEN 50 AND 100000
               AND list_sum(list_transform(tk, x -> CAST(length(x) AS DOUBLE))) / len(tk)
                   BETWEEN 3.0 AND 10.0
               AND CAST(len(list_filter(tk,
                     x -> x IN ('the','a','an','and','or','of','to','is','in','it'))) AS DOUBLE)
                   / len(tk) >= 0.05
               AND (CASE WHEN len(tk) < 2 THEN 0.0
                    ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END) <= 0.10
              THEN 1 ELSE 0 END AS pass
  FROM (
    SELECT lang, tk,
           list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i + 1], ' ')) AS bg
    FROM (SELECT lang, {_DUCK_TOKENS} AS tk FROM documents)
  )
)
SELECT lang, count(*) AS n_docs, sum(pass) AS n_pass,
       round(avg(CAST(pass AS DOUBLE)), 4) AS pass_rate
FROM s GROUP BY lang
"""


# --- sequence packing --------------------------------------------------------

_PACK_BUDGET = 2048  # context-window token budget per training bin
_PACK_BLOCK = 512  # docs per cumsum block (scale knob, result-invariant)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in doc_id
    order and cut every 2048 tokens (the GPT-style pretraining sharder —
    each doc's bin is its start offset DIV budget). Output: per-bin doc
    count and token mass (docs straddling a boundary count toward their
    start bin).

    The cumulative offset is computed in two phases so no single partition
    ever sees the whole corpus: (1) per-block token sums, (2) an
    unbounded-preceding window over the ~n/512 block rows, (3) block
    offsets broadcast back, intra-block window partitioned by block. The
    block size changes the physical plan only, never the offsets.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"doc_id DIV {_PACK_BLOCK}").alias("block"),
        token_count("text").alias("n_tok"),
    )
    block_tot = d.groupBy("block").agg(F.sum("n_tok").alias("block_tok"))
    w_blocks = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    offsets = block_tot.select(
        "block", F.coalesce(F.sum("block_tok").over(w_blocks), F.lit(0)).alias("block_off")
    )
    w_intra = (
        Window.partitionBy("block").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = d.join(F.broadcast(offsets), "block").select(
        "n_tok",
        (F.col("block_off") + F.coalesce(F.sum("n_tok").over(w_intra), F.lit(0))).alias("offset"),
    )
    return (
        placed.select(F.floor(F.col("offset") / _PACK_BUDGET).alias("bin"), "n_tok")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))
    )


_PACK_SQL = f"""
WITH t AS (SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tok FROM documents),
c AS (
  SELECT n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT CAST(floor(off / {_PACK_BUDGET}.0) AS BIGINT) AS bin,
       count(*) AS n_docs, sum(n_tok) AS bin_tokens
FROM c GROUP BY bin
"""


# --- mixture-weighted sampling ----------------------------------------------

# per-language target sampling percentage (the data-mixture knob)
_MIX_RATES: tuple[tuple[str, int], ...] = (
    ("en", 20),
    ("fr", 40),
    ("de", 60),
    ("es", 80),
    ("zh", 100),
)


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus sampling: keep a per-language fraction of
    documents (down-weighting over-represented languages — the pretraining
    data-mixture step). Selection is a *deterministic* per-row hash
    (``(doc_id·2654435761 + 40503) mod 100 < rate``), not ``rand()`` — stable
    under task retry and identically computable by the oracle; ``sampleBy``
    gives the same shape non-deterministically. The rates dim is broadcast;
    the corpus side is one scan + one O(langs) aggregation."""
    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(list(_MIX_RATES), "lang string, rate_pct int")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761) + F.lit(40503), F.lit(100))
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.max("rate_pct").alias("rate_pct"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum((bucket < F.col("rate_pct")).cast("long")).alias("n_sampled"),
            F.round(
                F.sum((bucket < F.col("rate_pct")).cast("double")) / F.count(F.lit(1)), 4
            ).alias("realized_rate"),
        )
    )


_MIX_VALUES = ", ".join(f"('{lang}', {pct})" for lang, pct in _MIX_RATES)
_MIXTURE_SQL = f"""
WITH rates(lang, rate_pct) AS (VALUES {_MIX_VALUES})
SELECT d.lang,
       CAST(max(r.rate_pct) AS INTEGER) AS rate_pct,
       count(*) AS n_total,
       sum(CASE WHEN (d.doc_id * 2654435761 + 40503) % 100 < r.rate_pct
                THEN 1 ELSE 0 END) AS n_sampled,
       round(avg(CASE WHEN (d.doc_id * 2654435761 + 40503) % 100 < r.rate_pct
                      THEN 1.0 ELSE 0.0 END), 4) AS realized_rate
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang
"""


# --- intra-document repetition ----------------------------------------------


def q_dup_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language repeated-bigram profile (avg and worst-case duplicate
    fraction): the intra-document repetition signal used to drop
    boilerplate/spam before training. Narrow map + O(langs) agg."""
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    frac = F.round(_dup_bigram_frac(tokens("text")), 4)
    return d.groupBy("lang").agg(
        F.round(F.avg(frac), 4).alias("avg_dup_frac"),
        F.max(frac).alias("max_dup_frac"),
    )


_DUP_NGRAM_SQL = f"""
WITH r AS (
  SELECT lang,
         round(CASE WHEN len(tk) < 2 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END, 4) AS frac
  FROM (
    SELECT lang, tk,
           list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i + 1], ' ')) AS bg
    FROM (SELECT lang, {_DUCK_TOKENS} AS tk FROM documents)
  )
)
SELECT lang, round(avg(frac), 4) AS avg_dup_frac, max(frac) AS max_dup_frac
FROM r GROUP BY lang
"""


QUERIES = {
    "decontam_check": q_decontam_check,
    "gopher_quality": q_gopher_quality,
    "pack_sequences": q_pack_sequences,
    "mixture_sample": q_mixture_sample,
    "dup_ngram_ratio": q_dup_ngram_ratio,
}

ORACLE = {
    "decontam_check": _DECONTAM_SQL,
    "gopher_quality": _GOPHER_SQL,
    "pack_sequences": _PACK_SQL,
    "mixture_sample": _MIXTURE_SQL,
    "dup_ngram_ratio": _DUP_NGRAM_SQL,
}
