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


def _bloom_words_masks(hcol, m_bits: int, n_hashes: int):
    """The ``n_hashes`` (word, mask) column pairs a 64-bit shingle hash
    sets/probes in a Bloom bitset of ``m_bits`` bits stored as 64-bit words.

    Classic double hashing (Kirsch & Mitzenmacher 2006, "Less Hashing, Same
    Performance"): position_i = (h1 + i*h2) mod m with h1 = the xxhash64
    itself and h2 = (h1 >>> 29) | 1 — h2 odd, so when ``m_bits`` is a power
    of two the probe stride is coprime with m and the i-sequence never
    collapses onto one slot. Everything is Catalyst long arithmetic
    (pmod / shifts / masks — ``call_function`` for the column-valued shift
    amount), shared VERBATIM by the build side and the probe side, so
    build/probe can never disagree.
    """
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    one = F.lit(1).cast("long")
    h2 = F.shiftrightunsigned(hcol, 29).bitwiseOR(one)
    pairs = []
    for i in range(n_hashes):
        pos = F.pmod(hcol + F.lit(i).cast("long") * h2, F.lit(m_bits).cast("long"))
        word = F.shiftrightunsigned(pos, 6).cast("int")
        mask = F.call_function(
            "shiftleft", one, pos.bitwiseAND(F.lit(63).cast("long")).cast("int")
        )
        pairs.append((word, mask))
    return pairs


def _next_pow2(n: int) -> int:
    p = 64
    while p < n:
        p <<= 1
    return p


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
    """:func:`contamination_report` with a Bloom pre-filter tier — SAME
    output, bit for bit (the Bloom tier only admits false POSITIVES, and
    every candidate is re-checked against the exact eval shingle set), so
    the exact DuckDB oracle still pins it.

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

    Physical shape: the bitset is built as a ``map<int,long>`` of 64-bit
    words — groupBy(word).agg(bit_or(mask)) over the eval probes, folded
    into ONE map row (bounded: <= m/64 entries, absent words = empty, map
    beats a dense array when the eval set underfills the bitset) and
    attached to the corpus shingle stream by broadcast crossJoin (the
    repo's 1-row model-attach pattern). Probing is n_hashes element_at +
    bitwise-AND conditions — pure Catalyst, no Python boundary, NULL word
    (never set) short-circuits to not-present via coalesce(0).

    ``expected_items``: sizes the bitset. Default None counts the distinct
    eval shingles first — one tiny job on the SMALL side only (the corpus
    is never touched by sizing); pass the known benchmark-suite size to
    skip it.
    """
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
    m_bits = _next_pow2(max(1024, bits_per_item * max(1, expected_items)))

    set_pairs = _bloom_words_masks(F.col("sh_h"), m_bits, n_hashes)
    probes = ev.select(
        F.explode(
            F.array(*[F.struct(w.alias("word"), mk.alias("mask")) for w, mk in set_pairs])
        ).alias("p")
    )
    bloom = (
        probes.groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bf"))
    )

    sh = _hashed_shingles(train, text_col, id_col, n)
    probe_pairs = _bloom_words_masks(F.col("sh_h"), m_bits, n_hashes)
    hit = None
    for w, mk in probe_pairs:
        c = F.coalesce(F.element_at("__bf", w), F.lit(0).cast("long")).bitwiseAND(mk) != 0
        hit = c if hit is None else hit & c
    candidates = sh.crossJoin(F.broadcast(bloom)).where(hit).drop("__bf")

    confirmed = candidates.join(
        F.broadcast(ev) if confirm == "broadcast" else ev, "sh_h"
    )
    return confirmed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max("n_shingles").alias("n_shingles"),
        F.round(F.count(F.lit(1)) / F.max("n_shingles"), 4).alias("contam_frac"),
    )
