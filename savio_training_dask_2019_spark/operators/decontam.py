"""Benchmark decontamination operators (GPT-3 appendix C shape: Brown et al.
2020, arXiv:2005.14165 — n-gram overlap between training documents and a
held-out evaluation set).

Two-corpus surface: callers pass the training frame and the eval frame
separately — the production shape, where the eval set is a benchmark suite,
not a split of the training corpus itself. The catalog query
``decontam_check`` is a thin wrapper that carves both sides out of the
fixture corpus so its DuckDB oracle can replay the same split.

Scale contract: eval benchmarks are MBs while the corpus is TBs, so the
eval shingle set is always the broadcast side and the corpus pays one scan
plus one per-doc aggregation. Shingles are matched as ``xxhash64`` longs
(8 bytes) on both sides — broadcast set and probe hash table stay
fixed-width at any n-gram length; exact up to 64-bit collisions
(p ≈ n·m/2⁶⁴ — negligible at any realistic eval-set size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _hashed_shingles(
    docs: DataFrame, text_col: str, id_col: str | None, n: int
) -> DataFrame:
    """Per-doc distinct word-n-gram hashes, exploded: (``id_col``?,
    n_shingles, sh_h). Docs with fewer than ``n`` tokens contribute
    nothing (they cannot contain an n-gram)."""
    keys = [id_col] if id_col else []
    d = docs.select(*keys, tokens(text_col).alias("__tk")).where(
        F.size("__tk") >= n
    )
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice("__tk", i, n), " ")),
    )
    per_doc = d.select(*keys, F.array_distinct(shingles).alias("__shs"))
    return per_doc.select(
        *keys,
        F.size("__shs").alias("n_shingles"),
        F.explode("__shs").alias("sh_h"),
    )


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """One row per CONTAMINATED training doc: (``id_col``, n_hits,
    n_shingles, contam_frac) — how many of its distinct word ``n``-grams
    also occur anywhere in ``eval_docs``, and the contaminated fraction.
    Docs with zero overlap are absent (join semantics); the common case at
    scale, so the output is tiny."""
    ev = (
        _hashed_shingles(eval_docs, text_col, None, n)
        .select("sh_h")
        .distinct()
    )
    return (
        _hashed_shingles(train, text_col, id_col, n)
        .join(F.broadcast(ev), "sh_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("n_shingles").alias("n_shingles"),
            F.round(F.count(F.lit(1)) / F.max("n_shingles"), 4).alias(
                "contam_frac"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_contam_frac: float = 0.0,
) -> DataFrame:
    """Return ``train`` minus the docs whose contaminated shingle fraction
    exceeds ``max_contam_frac`` (default 0.0: drop on ANY eval overlap —
    the GPT-3 policy). One broadcast anti-join on the (tiny) flagged-id
    set; the surviving frame keeps the input schema.

    The threshold is applied to the UNROUNDED fraction ``n_hits /
    n_shingles`` — the report's ``contam_frac`` column is rounded to 4
    decimals for display/oracle parity, and a >20k-shingle doc with one
    overlapping n-gram would round to 0.0 and wrongly survive the
    drop-on-ANY-overlap default if the rounded column were thresholded.
    """
    flagged = contamination_report(train, eval_docs, text_col, id_col, n)
    drop = flagged.where(
        F.col("n_hits") / F.col("n_shingles") > max_contam_frac
    ).select(id_col)
    return train.join(F.broadcast(drop), id_col, "left_anti")



# --- Bloom-prefiltered tier --------------------------------------------------


def bloom_contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    bits_per_item: int = 10,
    n_hashes: int = 5,
    expected_items: int | None = None,
    confirm: str = "broadcast",
) -> DataFrame:
    """:func:`contamination_report` with a Bloom pre-filter tier (the
    generic ``operators.bloom`` bitset) — SAME output, bit for bit: the
    Bloom tier only admits false POSITIVES, and every candidate is
    re-checked against the exact eval shingle set, so the exact DuckDB
    oracle still pins it.

    Why this tier exists at 100 TB: the exact report broadcasts the full
    distinct eval shingle-hash set — 8 bytes/shingle plus JVM hash-table
    overhead (~30 B/entry in a HashedRelation). A 100M-shingle eval suite
    is a ~3 GB broadcast. The Bloom bitset at ``bits_per_item=10`` is
    m = 1.25 B/shingle packed in 64-bit words (~20x smaller), and with
    ``n_hashes=5`` admits ~1 % false positives — so the corpus-side probe
    stream entering the EXACT confirm stage is (true hits + ~1 % of
    distinct corpus shingles) instead of every shingle. With
    ``confirm="shuffle"`` the confirm join shuffles BOTH sides on the
    hash — the regime where even the raw eval set is too big to broadcast;
    the Bloom tier is what makes that shuffle carry candidates only.

    ``expected_items``: sizes the bitset. Default None counts the distinct
    eval shingles first — one tiny job on the SMALL side only (the corpus
    is never touched by sizing); pass the known benchmark-suite size to
    skip it.
    """
    from .bloom import bloom_build, bloom_flag, next_pow2

    if confirm not in ("broadcast", "shuffle"):
        raise ValueError(f"confirm must be broadcast|shuffle, got {confirm!r}")
    ev = (
        _hashed_shingles(eval_docs, text_col, None, n)
        .select("sh_h")
        .distinct()
    )
    if expected_items is None:
        ev = ev.persist()  # sizing count + build + confirm reuse one pass
        expected_items = ev.count()
    m_bits = next_pow2(max(1024, bits_per_item * max(1, expected_items)))

    bloom = bloom_build(ev, "sh_h", m_bits, n_hashes)
    sh = _hashed_shingles(train, text_col, id_col, n)
    candidates = (
        bloom_flag(sh, "sh_h", bloom, m_bits, n_hashes, flag="__maybe")
        .where("__maybe")
        .drop("__maybe")
    )
    confirmed = candidates.join(
        F.broadcast(ev) if confirm == "broadcast" else ev, "sh_h"
    )
    return confirmed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max("n_shingles").alias("n_shingles"),
        F.round(F.count(F.lit(1)) / F.max("n_shingles"), 4).alias("contam_frac"),
    )
