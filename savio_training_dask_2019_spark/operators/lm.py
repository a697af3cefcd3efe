"""Corpus-fit n-gram language-model quality scoring (CCNet-style; Wenzek et
al. 2019, "CCNet: Extracting high quality monolingual datasets from web crawl
data", arXiv:1911.00359 — the LM-perplexity filter, in unigram and bigram
editions).

Build/score split: ``fit_*`` returns a broadcast-sized model plus the 1-row
total-mass frame; ``score_*`` joins any document set against them — the fit
corpus (the self-scoring quality filter the catalog queries demonstrate) or
NEW data against a frozen model (the production shape, where the OOV floor
actually fires). The catalog queries ``unigram_logprob`` / ``bigram_logprob``
are thin per-language rollups over these operators, oracle-checked end to
end; the OOV branches are pinned by held-out-document tests.

Scale contract (mirrors the query docstrings):

- fitting is ONE corpus scan ending in one token-keyed shuffle whose rows
  are per-partition distinct tokens (map-side partial aggregation), with the
  count table **persisted** — it is vocab-sized, and its multiple consumers
  (total mass, top-K cut, context counts) must never re-tokenize the corpus;
- the model is cut to the top-K grams by count via ``orderBy().limit()``
  (TakeOrderedAndProject over the cached counts — per-partition heaps, no
  global sort) and tokens outside the cap score at the ``-ln(1/total)``
  floor — the NLL of a singleton, an upper bound on any real tail gram;
- ``total`` sums the FULL vocabulary, so in-cap probabilities are true
  corpus frequencies, not renormalized over the cap;
- scoring is a left **broadcast** join against the exploded documents — the
  corpus is never shuffled on token — followed by one per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def fit_unigram_lm(
    docs: DataFrame, text_col: str = "text", top_k: int = 50_000
) -> tuple[DataFrame, DataFrame]:
    """Fit a unigram LM: returns ``(model, total)`` where ``model`` is
    (token, nll_tok = -ln c/s) for the ``top_k`` most frequent tokens
    (ties broken by token for determinism) and ``total`` is the 1-row
    frame (s = corpus token count over the FULL vocab). The intermediate
    count table is persisted (vocab-sized; released by clearCache or the
    context cleaner when the returned frames are dropped)."""
    tok = docs.select(F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")).persist()
    total = counts.agg(F.sum("c").alias("s"))
    vocab = counts.orderBy(F.col("c").desc(), "token").limit(top_k)
    model = vocab.crossJoin(F.broadcast(total)).select(
        "token", (-F.ln(F.col("c") / F.col("s"))).alias("nll_tok")
    )
    return model, total


def score_unigram_nll(
    docs: DataFrame,
    model: DataFrame,
    total: DataFrame,
    text_col: str = "text",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-document mean token NLL under a fitted unigram model: one row
    per doc that has >= 1 token, columns ``(*keys, nll)``. Out-of-vocab
    tokens (cut by the cap, or unseen when scoring new data) take the
    ``-ln(1/s) = ln(s)`` floor."""
    tok = docs.select(*keys, F.explode(tokens(text_col)).alias("token"))
    return (
        tok.join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(total))
        .select(*keys, F.coalesce("nll_tok", F.ln("s")).alias("nll_tok"))
        .groupBy(*keys)
        .agg(F.avg("nll_tok").alias("nll"))
    )


def _bigram_pairs(docs: DataFrame, text_col: str, keys: tuple[str, ...]) -> DataFrame:
    """(keys..., w1, w2) — one row per adjacent token pair per doc."""
    tk = tokens(text_col)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("__tk") - 2),
        lambda i: F.struct(
            F.get("__tk", i).alias("w1"), F.get("__tk", i + 1).alias("w2")
        ),
    )
    return (
        docs.select(*keys, tk.alias("__tk"))
        .where(F.size("__tk") >= 2)
        .select(*keys, F.explode(pairs).alias("p"))
        .select(*keys, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def fit_bigram_lm(
    docs: DataFrame, text_col: str = "text", top_k: int = 200_000
) -> tuple[DataFrame, DataFrame]:
    """Fit a conditional bigram LM: returns ``(model, total)`` where
    ``model`` is (w1, w2, nll_big = -ln c(w1,w2)/c(w1)) for the ``top_k``
    most frequent bigrams and ``total`` is the 1-row frame (s = corpus
    bigram count). Context counts c(w1) are derived from the persisted
    bigram-count table by a vocab-sized re-aggregation — fitting costs ONE
    corpus scan, never two."""
    bi = _bigram_pairs(docs, text_col, ())
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).persist()
    ctx = counts.groupBy("w1").agg(F.sum("cb").alias("cu"))
    total = counts.agg(F.sum("cb").alias("s"))
    vocab = counts.orderBy(F.col("cb").desc(), "w1", "w2").limit(top_k)
    model = vocab.join(ctx, "w1").select(
        "w1", "w2", (-F.ln(F.col("cb") / F.col("cu"))).alias("nll_big")
    )
    return model, total


def score_bigram_nll(
    docs: DataFrame,
    model: DataFrame,
    total: DataFrame,
    text_col: str = "text",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-document mean conditional bigram NLL: one row per doc with >= 2
    tokens, columns ``(*keys, nll)``. Bigrams outside the model take the
    ``ln(s)`` floor (cut by the cap, or unseen contexts on new data)."""
    bi = _bigram_pairs(docs, text_col, keys)
    return (
        bi.join(F.broadcast(model), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(total))
        .select(*keys, F.coalesce("nll_big", F.ln("s")).alias("nll_big"))
        .groupBy(*keys)
        .agg(F.avg("nll_big").alias("nll"))
    )
