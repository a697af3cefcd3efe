"""Generic broadcastable Bloom filter over 64-bit hash keys — the shared
pre-filter tier for membership-heavy joins (benchmark decontamination,
incremental snapshot dedup).

Representation: a ``map<int,long>`` of 64-bit words folded into ONE row —
bounded by ``m_bits/64`` entries whatever the data size, sparse-friendly
(never-set words are simply absent), attached to the probe stream by 1-row
broadcast crossJoin (the repo's model-attach pattern) and probed with
``n_hashes`` pure-Catalyst ``element_at`` + bitwise-AND tests. At
``bits_per_item = 10`` the bitset is ~1.25 B/key packed in words — roughly
20x under a raw broadcast hash set's ~30 B/entry HashedRelation — and with
5 probes admits ~1 % false positives.

Exactness contract: a Bloom filter admits false POSITIVES only, so any
consumer that re-checks candidates against the exact key set (a confirm
join over the bloom-positive stream) produces bit-identical results to the
unfiltered plan — the tier buys broadcast size and probe-stream volume,
never correctness. Both public consumers are pinned equal to their exact
twins in tests.

Hashing: double hashing from the 64-bit key itself (Kirsch & Mitzenmacher
2006, "Less Hashing, Same Performance"): position_i = (h1 + i*h2) mod m
with h1 = the key and h2 = (h1 >>> 29) | 1 — h2 odd, so with ``m_bits`` a
power of two the probe stride never collapses onto one slot. The SAME
column expressions serve the build side and the probe side, so they can
never disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def next_pow2(n: int) -> int:
    """Smallest power of two >= max(n, 64)."""
    p = 64
    while p < n:
        p <<= 1
    return p


def bloom_words_masks(hcol: Column, m_bits: int, n_hashes: int):
    """The ``n_hashes`` (word_index, bit_mask) column pairs a 64-bit key
    sets/probes in a bitset of ``m_bits`` bits stored as 64-bit words.
    Everything is Catalyst long arithmetic (pmod / shifts / masks —
    ``call_function`` for the column-valued shift amount)."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    one = F.lit(1).cast("long")
    h2 = F.shiftrightunsigned(hcol, 29).bitwiseOR(one)
    pairs = []
    for i in range(n_hashes):
        pos = F.pmod(
            hcol + F.lit(i).cast("long") * h2, F.lit(m_bits).cast("long")
        )
        word = F.shiftrightunsigned(pos, 6).cast("int")
        mask = F.call_function(
            "shiftleft", one, pos.bitwiseAND(F.lit(63).cast("long")).cast("int")
        )
        pairs.append((word, mask))
    return pairs


def bloom_build(
    keys: DataFrame, hash_col: str, m_bits: int, n_hashes: int = 5
) -> DataFrame:
    """Fold the 64-bit keys of ``keys[hash_col]`` into a ONE-row bitset
    frame (column ``__bf``: map<int,long> of 64-bit words). Build cost is
    one groupBy(word).bit_or(mask) over n_hashes probes per key — always
    run on the SMALL side of the membership question; the fold's single-
    partition exchange carries <= m_bits/64 rows by construction."""
    pairs = bloom_words_masks(F.col(hash_col), m_bits, n_hashes)
    probes = keys.select(
        F.explode(
            F.array(
                *[F.struct(w.alias("word"), m.alias("mask")) for w, m in pairs]
            )
        ).alias("p")
    )
    return (
        probes.groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("__bf")
        )
    )


def bloom_flag(
    df: DataFrame,
    hash_col: str,
    bloom: DataFrame,
    m_bits: int,
    n_hashes: int = 5,
    flag: str = "__maybe",
) -> DataFrame:
    """``df`` plus a boolean ``flag`` column: True iff ``hash_col`` is
    POSSIBLY in the set ``bloom`` was built from (definitely-absent keys
    flag False — that direction is exact). The bitset attaches by 1-row
    broadcast crossJoin; the probe is n_hashes element_at + bit tests with
    a NULL word (never set) short-circuiting to absent via coalesce(0)."""
    cond = None
    for w, m in bloom_words_masks(F.col(hash_col), m_bits, n_hashes):
        c = (
            F.coalesce(F.element_at("__bf", w), F.lit(0).cast("long"))
            .bitwiseAND(m)
            != 0
        )
        cond = c if cond is None else cond & c
    return (
        df.crossJoin(F.broadcast(bloom))
        .withColumn(flag, cond)
        .drop("__bf")
    )
