"""Sequence packing — the concat-and-chunk global-offset cascade, factored
out of the text packing query so any cost column packs the same way (text
tokens, multimodal token+patch budgets, audio frames).

``pack_offsets`` computes each row's global running offset in id order with
NO unpartitioned window anywhere — the three-level cascade documented at
queries/llmpipe.q_pack_sequences (per-block sums → driver-side prefix over
n/B² super-blocks, the zipWithIndex pattern → two partitioned windows of
≤B rows each). Block size B is adaptive (max(2048, ~n^(1/3))) so all three
levels stay ~cube-root-sized at any corpus size; B changes the physical
plan only, never the offsets (pinned by the block-size-invariance test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_block_for(n_rows: int) -> int:
    """Adaptive block size: ~ceil(n^(1/3)) floored at 2048 — keeps blocks
    (n/B), supers (n/B²), and window partitions (≤B) all ≤ max(2048,
    ~n^(1/3)) at any n. Exactness is irrelevant; only magnitude balance
    matters, and B never affects offsets."""
    b = max(2048, int(max(n_rows, 0) ** (1.0 / 3.0)))
    while b * b * b < n_rows:
        b += 1
    return b


def pack_offsets(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    block: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global running offset of ``cost_col`` in ``id_col`` order: returns
    ``df``'s (id, cost) projection plus an ``offset`` column (sum of all
    earlier rows' costs). Ids should be roughly dense so ``id DIV B``
    yields balanced blocks (the corpus doc_id contract).

    ``block`` overrides the adaptive size (tests); ``n_rows`` supplies a
    cheap row count for the adaptive path (pass the source table's
    metadata count when ``df``'s lineage is expensive — e.g. a Python
    kernel — so sizing does not execute it twice)."""
    spark = df.sparkSession
    if block is None:
        block = pack_block_for(df.count() if n_rows is None else n_rows)
    d = df.select(
        F.col(id_col).alias("__id"),
        F.expr(f"{id_col} DIV {block}").alias("__block"),
        F.col(cost_col).alias("__cost"),
    )
    blocks = d.groupBy("__block").agg(F.sum("__cost").alias("__block_cost")).persist()
    supered = blocks.withColumn("__super", F.expr(f"__block DIV {block}"))
    super_rows = (
        supered.groupBy("__super")
        .agg(F.sum("__block_cost").alias("__super_cost"))
        .orderBy("__super")
        .collect()
    )
    acc, prefix = 0, []
    for r in super_rows:
        prefix.append((r["__super"], acc))
        acc += r["__super_cost"]
    super_off = spark.createDataFrame(
        prefix or [(0, 0)], "__super long, __super_off long"
    )
    w_blocks = (
        Window.partitionBy("__super")
        .orderBy("__block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # localCheckpoint the bounded offset table (n/B rows of two longs) and
    # release the blocks cache NOW — the leak/scan contract documented at
    # q_pack_sequences; the eager job reads the already-cached blocks.
    offsets = (
        supered.join(F.broadcast(super_off), "__super")
        .select(
            "__block",
            (
                F.col("__super_off")
                + F.coalesce(F.sum("__block_cost").over(w_blocks), F.lit(0))
            ).alias("__block_off"),
        )
        .localCheckpoint(eager=True)
    )
    blocks.unpersist()
    w_intra = (
        Window.partitionBy("__block")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(offsets, "__block")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cost").alias(cost_col),
            (
                F.col("__block_off") + F.coalesce(F.sum("__cost").over(w_intra), F.lit(0))
            ).alias("offset"),
        )
    )


def assign_bins(offsets: DataFrame, cost_col: str, budget: int) -> DataFrame:
    """Bin summary over a ``pack_offsets`` result: bin = offset DIV budget
    (rows straddling a boundary count toward their start bin) → per-bin
    row count and cost mass."""
    return (
        offsets.select(
            F.floor(F.col("offset") / budget).alias("bin"), F.col(cost_col)
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(cost_col).alias("bin_tokens"))
    )


# --- histogram packing (SPFHP) ----------------------------------------------
#
# Krell et al. 2021, "Efficient Sequence Packing without Cross-contamination"
# (arXiv:2107.02027): solve the bin-packing problem ON THE LENGTH HISTOGRAM
# (<= max_len rows, whatever the corpus size), then map documents to pack
# slots arithmetically. Concat-and-chunk (pack_offsets/assign_bins above)
# splits documents across bin boundaries; histogram packing never splits a
# document — each pack is a set of whole documents with total length
# <= max_len — at the cost of some residual padding, which the strategy
# solver minimizes. The driver-side solve is O(histogram), NOT O(corpus):
# the same split as BPE training (model-sized driver work, corpus-sized
# distributed work).


def spfhp_strategies(
    hist: dict[int, int], max_len: int
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-pack-first histogram-packing: walk lengths DESCENDING; each
    batch of equal-length docs goes to the open strategy with the SMALLEST
    residual that still fits (ties: lexicographically smallest
    composition), else opens new packs. Deterministic given the histogram.

    Returns [(composition lengths desc, pack_count), ...] with
    sum(comp) <= max_len for every strategy and
    sum(count(L in comp) * packs) == hist[L] for every L.

    Cost: each bulk step either fills an existing strategy class or opens
    one; distinct strategy classes stay O(histogram · max_len/L) in the
    worst case — driver-trivial next to any corpus scan."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    bad = {length for length in hist if length > max_len or length < 1}
    if bad:
        raise ValueError(f"lengths outside [1, max_len]: {sorted(bad)[:5]}")
    open_: dict[tuple[int, ...], int] = {}  # composition -> pack count
    for length in sorted(hist, reverse=True):
        remaining = hist[length]
        while remaining > 0:
            fits = [
                comp
                for comp in open_
                if max_len - sum(comp) >= length
            ]
            if fits:
                comp = min(fits, key=lambda c: (max_len - sum(c), c))
                take = min(remaining, open_[comp])
                new_comp = tuple(sorted(comp + (length,), reverse=True))
                open_[comp] -= take
                if open_[comp] == 0:
                    del open_[comp]
                open_[new_comp] = open_.get(new_comp, 0) + take
                remaining -= take
            else:
                # open only as many fresh packs as the length NEEDS
                # (ceil(remaining / per-pack capacity)), seed each with one
                # doc, and let the loop's fits branch distribute the rest
                # into them — opening one pack per remaining doc here would
                # leave same-length docs one-per-pack forever (r9 review
                # finding: {100: 10} @ 512 must pack 2×(100⁵), not 10×(100¹))
                cap = max_len // length
                q = min(remaining, -(-remaining // cap))
                open_[(length,)] = open_.get((length,), 0) + q
                remaining -= q
    return sorted(open_.items(), key=lambda kv: kv[0])


def pack_assignment_segments(
    strategies: list[tuple[tuple[int, ...], int]],
) -> list[tuple[int, int, int, int, int]]:
    """Flatten a strategy solution into per-length rank segments for the
    distributed assignment join: rows of (length, seg_start, seg_end,
    pack_base, pack_count), meaning docs of ``length`` with within-length
    rank in (seg_start, seg_end] belong to the strategy whose global pack
    ids start at ``pack_base``; within the segment, rank r maps to
    pack_base + (r - seg_start - 1) % pack_count. O(Σ|composition|) rows —
    histogram-sized, broadcastable."""
    segs: list[tuple[int, int, int, int, int]] = []
    cursor: dict[int, int] = {}
    base = 0
    for comp, count in strategies:
        per_len: dict[int, int] = {}
        for length in comp:
            per_len[length] = per_len.get(length, 0) + 1
        for length, slots in sorted(per_len.items()):
            start = cursor.get(length, 0)
            end = start + slots * count
            segs.append((length, start, end, base, count))
            cursor[length] = end
        base += count
    return segs


def assign_packs_histogram(
    df: DataFrame, id_col: str, len_col: str, max_len: int
) -> tuple[DataFrame, list[tuple[tuple[int, ...], int]]]:
    """End-to-end histogram packing: collect the length histogram
    (<= max_len rows — bounded by construction), solve SPFHP driver-side,
    and assign every row a pack id via a broadcast range join on its
    within-length rank. Returns (df + pack_id, strategies).

    Plan: one histogram agg (map-side combine), one rank window
    PARTITIONED BY length (if one length dominates the corpus its rank
    window is the hot partition — the pack_offsets three-level cascade is
    the documented upgrade path for that shape), one broadcast range join,
    narrow arithmetic. No corpus-sized driver state ever."""
    bounds = df.agg(
        F.min(len_col).alias("mn"), F.max(len_col).alias("mx")
    ).first()  # 1-row pre-validation BEFORE any length-proportional collect
    if bounds["mn"] is None:
        return df.limit(0).withColumn("pack_id", F.lit(0).cast("long")), []
    if bounds["mn"] < 1 or bounds["mx"] > max_len:
        raise ValueError(
            f"lengths outside [1, max_len={max_len}]: observed "
            f"[{bounds['mn']}, {bounds['mx']}] — truncate/filter first "
            "(q_pack_bfd does least(n_tok, max_len) and drops zeros)"
        )
    hist_rows = (
        df.groupBy(F.col(len_col).alias("__len"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()  # bounded: <= max_len distinct lengths, validated above
    )
    hist = {int(r["__len"]): int(r["__cnt"]) for r in hist_rows}
    strategies = spfhp_strategies(hist, max_len)
    segs = pack_assignment_segments(strategies)
    spark = df.sparkSession
    seg_df = F.broadcast(
        spark.createDataFrame(
            segs,
            "__len long, __seg_start long, __seg_end long, __base long, __packs long",
        )
    )
    w = Window.partitionBy(len_col).orderBy(id_col)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    joined = ranked.join(
        seg_df,
        (F.col(len_col) == F.col("__len"))
        & (F.col("__rk") > F.col("__seg_start"))
        & (F.col("__rk") <= F.col("__seg_end")),
    )
    return (
        joined.withColumn(
            "pack_id",
            F.col("__base")
            + (F.col("__rk") - F.col("__seg_start") - 1) % F.col("__packs"),
        ).drop("__len", "__seg_start", "__seg_end", "__base", "__packs", "__rk"),
        strategies,
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Sliding-window chunking — the context-window prep step upstream of
    packing/RAG indexing: each document becomes ceil(n_tok/stride) chunks of
    up to ``size`` tokens, consecutive chunks overlapping by
    ``size - stride`` tokens (stride < size; stride == size is
    non-overlapping tiling). Output, one row per chunk:
    (``id_col``, chunk_idx 0-based, chunk_start 1-based token offset,
    n_tok_chunk, chunk_text).

    Policy corners are deliberate and SQL-replicable: window starts are
    1, 1+stride, 1+2·stride, ... <= n_tok (so the tail yields a final
    short chunk rather than dropping tokens — every token lands in >= 1
    chunk), and an empty/whitespace doc yields exactly ONE empty chunk
    (chunk coverage of the corpus keeps the doc count).

    Scale: pure narrow per-row work — sequence/transform/posexplode inside
    whole-stage codegen, no shuffle, no Python boundary; the output is
    ~n_tok/stride times the input row count, which the caller controls by
    ``stride``."""
    if size < 1 or stride < 1:
        raise ValueError(f"size/stride must be >= 1, got {size}/{stride}")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would drop tokens between windows"
        )
    from ..functions.text import tokens

    tk = tokens(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size(tk)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"), F.slice(tk, s, size).alias("ctk")
        ),
    )
    exploded = df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "c")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.col("c.start").alias("chunk_start"),
        F.size("c.ctk").alias("n_tok_chunk"),
        F.array_join("c.ctk", " ").alias("chunk_text"),
    )
