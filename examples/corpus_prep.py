#!/usr/bin/env python
"""End-to-end LLM training-corpus preparation over the documents fixture —
the stage that follows dedup_pipeline.py (SCALING.md "Corpus-prep tier"):
take a deduplicated corpus through decontamination, quality gating,
mixture-weighted sampling, and sequence packing, ending with the per-bin
layout a tokenizer sharder would consume.

    PYTHONPATH=. python examples/corpus_prep.py [sf_dir]

Stages (each one scan + at most one shuffle; 100 TB shapes noted inline):

  0. domain filter  — C4/RefinedWeb domain-reputation gate: per-source
                      decision table (blocklist + stopword-density rule),
                      applied as a broadcast anti-join — the corpus never
                      shuffles to be filtered
  1. decontaminate  — drop docs sharing a word 5-gram with the eval split
                      (eval shingles broadcast; corpus never replicated);
                      the Bloom-prefiltered tier (~20x smaller broadcast,
                      bit-identical report) and the SEMANTIC tier (max
                      embedding cosine vs the eval set — catches reworded
                      leakage) run alongside
  2. quality gate   — Gopher-style rules + model-based profiles (token
                      entropy, conditional bigram NLL), pure JVM column math
  3. PII scrub      — regex detect/redact audit (narrow map, scan speed)
  4. passage dedup  — C4-style chunk keep-first retention (one shuffle)
  5. mixture sample — per-language keep-rate via deterministic hash gate
  6. pack           — concat-and-chunk into 2048-token bins (two-phase
                      cumsum: no partition ever holds the whole corpus)
  7. split + shard  — train/val hash split with leakage audit, content-hash
                      shard balance for the writer fan-out, and the
                      exact-quota stratified + length-weighted
                      (Efraimidis-Spirakis) eval subsets
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.queries import llmpipe
    from savio_training_dask_2019_spark.session import get_spark
    from savio_training_dask_2019_spark.sources import load_table

    spark = get_spark(app_name="corpus-prep")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 0. domain-reputation filter: the decision table is O(domains) — tiny —
    #    so APPLYING it is a broadcast anti-join on the drop list; at web
    #    scale this is the only shape that works (the corpus never shuffles)
    decisions = llmpipe.q_domain_filter(spark, sf_dir)
    dropped_sources = decisions.where(~F.col("kept")).select("source")
    docs = docs.join(F.broadcast(dropped_sources), "source", "left_anti")
    n_after_domains = docs.count()
    print(f"domain filter: {n_docs} -> {n_after_domains} docs "
          f"({dropped_sources.count()} sources dropped)")

    # 1. decontamination: drop training docs overlapping the held-out split
    #    (the two-corpus operator surface — train frame vs eval frame)
    from savio_training_dask_2019_spark.operators import decontaminate

    is_eval = F.col("doc_id") % llmpipe._EVAL_MOD == 0
    clean = decontaminate(docs.where(~is_eval), docs.where(is_eval))
    n_clean = clean.count()
    # 1a. the Bloom-prefiltered tier produces the IDENTICAL report with a
    #     ~20x smaller broadcast (bitset words vs a raw hash set) — the
    #     shape that survives a 100M-shingle benchmark suite
    from savio_training_dask_2019_spark.operators.decontam import (
        bloom_contamination_report,
        contamination_report,
    )

    n_exact = contamination_report(docs.where(~is_eval), docs.where(is_eval)).count()
    n_bloom = bloom_contamination_report(docs.where(~is_eval), docs.where(is_eval)).count()
    assert n_bloom == n_exact  # structural exactness: FPs only, all confirmed
    print(f"decontam report: {n_exact} contaminated docs "
          f"(bloom tier identical: {n_bloom})")
    # 1c. semantic tier: reworded leakage n-grams miss — max embedding
    #     cosine vs the broadcast-folded eval set
    from savio_training_dask_2019_spark.queries import vectorops

    sem = vectorops.q_decontam_semantic(spark, sf_dir)
    n_sem = sem.where("flagged").count()
    print(f"semantic decontam: {n_sem} vectors over cosine "
          f"{vectorops._SEM_DECONTAM_T} vs the eval set")

    # 1b. targeted selection: DSIR importance profile against the same
    #     held-out slice (who in the corpus looks like the target?) — a
    #     production run keeps the top-importance slice per language
    dsir = llmpipe.q_dsir_weights(spark, sf_dir).collect()
    print("DSIR selection profile (importance > 0 = target-like):")
    for r in sorted(dsir, key=lambda r: r["lang"]):
        print(f"  {r['lang']}: {r['n_selected']}/{r['n_docs']} selected "
              f"(avg imp {r['avg_imp']:+.3f})")

    # 2. quality gate (per-language pass rates, then the surviving docs),
    #    with the three model-based quality profiles next to the rule gate:
    #    token entropy (repetition), unigram NLL (rare-token noise), and
    #    conditional bigram NLL (word-salad ordering)
    gate = llmpipe.q_gopher_quality(spark, sf_dir)
    print("quality pass rates by lang:")
    for r in sorted(gate.collect(), key=lambda r: r["lang"]):
        print(f"  {r['lang']}: {r['n_pass']}/{r['n_docs']} ({r['pass_rate']:.1%})")
    from savio_training_dask_2019_spark.queries import textops

    ent = {r["lang"]: r for r in textops.q_token_entropy(spark, sf_dir).collect()}
    big = {r["lang"]: r for r in llmpipe.q_bigram_logprob(spark, sf_dir).collect()}
    print("model-based quality bands by lang (entropy / bigram NLL):")
    for lang in sorted(ent):
        e, b = ent[lang], big.get(lang)
        print(
            f"  {lang}: H∈[{e['min_entropy']:.2f},{e['max_entropy']:.2f}]"
            + (f", nll∈[{b['min_nll']:.2f},{b['max_nll']:.2f}]" if b else "")
        )

    # 3. PII scrub audit (the compliance table shipped with the release)
    pii = llmpipe.q_pii_redact(spark, sf_dir)
    hits = pii.agg(
        F.sum("docs_with_pii").alias("d"), F.sum("chars_removed").alias("c")
    ).collect()[0]
    print(f"PII scrub: {hits['d']} docs redacted, {hits['c']} chars removed")
    # the planted-payload branch (docstring convention) must actually fire:
    # fixtures carry no real PII, so zero hits would mean the detector ran
    # on nothing and the oracle parity proved nothing
    assert hits["d"] > 0 and hits["c"] > 0, "planted PII branch did not fire"

    # 4. passage-level dedup retention (post-strip token survival), plus
    #    the stride-1 duplicate-substring audit (Lee et al. criterion —
    #    catches copied passages at unaligned offsets tumbling chunks miss)
    pd_rows = llmpipe.q_passage_dedup(spark, sf_dir).collect()
    kept = sum(r["n_chunks"] - r["dup_chunks"] for r in pd_rows)
    total_ch = sum(r["n_chunks"] for r in pd_rows)
    print(f"passage dedup: {kept}/{total_ch} chunks kept ({kept/total_ch:.1%})")
    sub = llmpipe.q_substring_dup_stats(spark, sf_dir).collect()
    dupw = sum(r["dup_windows"] for r in sub)
    totw = sum(r["total_windows"] for r in sub)
    print(f"substring audit: {dupw}/{totw} stride-1 windows duplicated "
          f"({dupw/totw:.1%})")
    # ...and the Gopher character-mass repetition gate (in-row fold — the
    # whole signal costs one scan, no shuffle beyond the O(langs) agg)
    rep = llmpipe.q_repetition_stats(spark, sf_dir).collect()
    flagged = sum(r["n_flagged"] for r in rep)
    print(f"repetition gate: {flagged}/{sum(r['n_docs'] for r in rep)} docs "
          f"over the 0.20 top-2-gram char fraction")

    # 5. mixture-weighted sampling (deterministic hash gate per language) —
    #    preceded by the XLM-R temperature weights a production run would
    #    derive its per-language rates FROM (tokens^0.7 smoothing)
    wts = llmpipe.q_mixture_weights(spark, sf_dir).collect()
    print("temperature mixture (alpha=%.1f):" % llmpipe._MIX_ALPHA)
    for r in sorted(wts, key=lambda r: r["lang"]):
        print(f"  {r['lang']}: raw {r['share_raw']:.1%} -> temp "
              f"{r['share_temp']:.1%} ({r['implied_epochs']:.2f} epochs)")
    mix = {r["lang"]: r for r in llmpipe.q_mixture_sample(spark, sf_dir).collect()}
    rates = spark.createDataFrame(
        [(lang, r["rate_pct"]) for lang, r in mix.items()], "lang string, rate_pct int"
    )
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761) + F.lit(40503), F.lit(100))
    sampled = (
        clean.join(F.broadcast(rates), "lang")
        .where(bucket < F.col("rate_pct"))
        .drop("rate_pct")
    )
    n_sampled = sampled.count()

    # 6. pack into training bins — both layouts: concat-and-chunk (splits
    #    docs at bin boundaries; zero padding) and SPFHP histogram packing
    #    (whole docs only; the driver solves on the <= max_len-row length
    #    histogram, the cluster assigns — some padding, no splits)
    bins = llmpipe.q_pack_sequences(spark, sf_dir)
    n_bins = bins.count()
    bfd = llmpipe.q_pack_bfd(spark, sf_dir).collect()
    bfd_packs = sum(r["n_packs"] for r in bfd)
    bfd_fill = sum(r["n_packs"] * r["avg_fill"] for r in bfd) / max(bfd_packs, 1)
    tok_total = sampled.select(F.sum(token_count("text"))).collect()[0][0]
    # 6b. sliding-window chunking — the context-window layout RAG/embedding
    #     pipelines consume instead of packed bins (tail kept, never dropped)
    n_chunks = llmpipe.q_chunk_documents(spark, sf_dir).count()

    # 7. train/val split with leakage audit, then writer shard balance —
    #    plus the exact-quota stratified eval subset (K docs per language)
    splits = {r["split"]: r for r in llmpipe.q_split_leakage(spark, sf_dir).collect()}
    shards = llmpipe.q_shard_corpus(spark, sf_dir).collect()
    shard_docs = [r["n_docs"] for r in shards]
    eval_subset = llmpipe.q_stratified_sample(spark, sf_dir)
    n_eval = eval_subset.count()
    # ...and the LENGTH-WEIGHTED eval subset (Efraimidis-Spirakis, P ∝
    # n_chars, deterministic md5 keys — re-crawls reproduce the sample)
    n_weval = llmpipe.q_weighted_sample(spark, sf_dir).count()

    print(f"corpus: {n_docs} docs")
    print(f"after decontamination: {n_clean} docs")
    print(f"after mixture sampling: {n_sampled} docs ({tok_total} tokens kept)")
    print(f"packed layout: {n_bins} bins of {llmpipe._PACK_BUDGET} tokens")
    print(f"chunked layout: {n_chunks} sliding windows of "
          f"{llmpipe._CHUNK_SIZE} tokens at stride {llmpipe._CHUNK_STRIDE}")
    print(
        f"SPFHP alternative: {bfd_packs} whole-doc packs of "
        f"{llmpipe._BFD_MAX_LEN}, avg fill {bfd_fill:.1%} (no splits)"
    )
    for name in ("train", "val"):
        r = splits[name]
        print(f"{name}: {r['n_docs']} docs, {r['n_leaked']} leaked across split")
    # the planted shared-content groups (doc_id % 29 == 0) must produce at
    # least one cross-split collision, or the leakage audit exercised nothing
    assert sum(r["n_leaked"] for r in splits.values()) > 0, (
        "planted leakage branch did not fire"
    )
    print(
        f"shards: {len(shards)} (docs/shard min {min(shard_docs)} / "
        f"max {max(shard_docs)})"
    )
    print(
        f"stratified eval subset: {n_eval} docs "
        f"(≤{llmpipe._STRATUM_QUOTA}/lang, deterministic hash order)"
    )
    print(
        f"length-weighted eval subset: {n_weval} docs "
        f"(≤{llmpipe._WS_QUOTA}/source, P ∝ n_chars, ES keys)"
    )
    print("corpus prep complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
