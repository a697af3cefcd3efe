#!/usr/bin/env python
"""End-to-end LLM training-data dedup pipeline over the documents fixture —
the composition the individual tiers exist for (SCALING.md "LLM-pipeline
operators"): each stage bounds the next stage's candidate set, and the final
output is one canonical doc per near-dup cluster plus quality/token columns.

    PYTHONPATH=. python examples/dedup_pipeline.py [sf_dir]

Stages (cheapest first, 100 TB shapes noted inline):

  1. exact dedup         — one shuffle on a 128-bit content hash
                           (keep-first here; keep_best_by_hash swaps in a
                           quality-argmax representative at the same cost)
  2. near-dup pairs      — MinHash banding (sub-quadratic bucket join)
  3. cluster collapse    — connected components (min-label propagation)
  4. canonical selection — keep min doc_id per cluster
  5. quality + tokens    — narrow JVM column math, no shuffle
  6. semantic tier       — SemDeDup cluster-scoped cosine keep-first over
                           the embedding corpus (pairwise bounded per cluster)

At 100 TB every stage is the same plan, just with the inverted-index /
banding knobs (max_df, bands) sized per SCALING.md.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from savio_training_dask_2019_spark.functions.text import (
        predict_lang,
        punct_ratio,
        stopword_ratio,
        token_count,
    )
    from savio_training_dask_2019_spark.operators import (
        connected_components,
        keep_first_by_hash,
        minhash_banded_pairs,
    )
    from savio_training_dask_2019_spark.session import get_spark
    from savio_training_dask_2019_spark.sources import load_table

    spark = get_spark(app_name="dedup-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 0. pre-flight: profile the dedup shuffle key BEFORE committing to it
    #    (the skew_profile/join_explosion discipline) — at 100 TB a hot
    #    content hash (a boilerplate page mirrored millions of times)
    #    predicts the straggler task; the numbers below size the salting /
    #    AQE-skew thresholds for stage 1's shuffle.
    key_counts = docs.groupBy(F.xxhash64("text").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pre = key_counts.agg(
        F.count(F.lit(1)).alias("keys"),
        F.max("c").alias("hottest"),
        F.round(F.max("c") / F.sum("c"), 4).alias("hot_share"),
    ).first()
    print(
        f"pre-flight: {pre['keys']} distinct content hashes, hottest key "
        f"x{pre['hottest']} ({pre['hot_share']:.1%} of rows)"
    )

    # 1. exact tier: collapse byte-identical copies (keep lowest doc_id).
    #    A quality-aware pipeline swaps in keep_best_by_hash(docs, "text",
    #    "doc_id", score=...) — same single hash shuffle, argmax instead of
    #    first-seen, and a policy_diverges column to audit the difference.
    exact = keep_first_by_hash(docs, "text", "doc_id")
    survivors = docs.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_exact = survivors.count()

    # 2. near-dup pairs on the survivors (minhash banding, sub-quadratic)
    pairs = minhash_banded_pairs(
        survivors, "text", "doc_id", n=3, max_jaccard_distance=0.5
    )

    # 3. pairs -> clusters (min-label propagation; cluster_id = min doc_id).
    #    Near-dup clusters are small and dense, so propagation converges in
    #    a few rounds; a corpus whose pair graph forms long CHAINS (e.g.
    #    drifting boilerplate) should use connected_components_star —
    #    O(log n) rounds on any topology, same output contract.
    clusters = connected_components(pairs)

    # 4. canonical = the cluster label itself; drop other cluster members
    drop = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    canonical = survivors.join(drop, "doc_id", "left_anti")
    n_final = canonical.count()

    # 5. per-doc quality + token features on the kept corpus (narrow, no
    #    shuffle: everything is JVM column math over the scan)
    final = canonical.select(
        "doc_id",
        "lang",
        predict_lang(F.col("text")).alias("lang_pred"),
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 4).alias("punct_ratio"),
        F.round(stopword_ratio(F.col("text")), 4).alias("stopword_ratio"),
    )
    stats = final.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
    ).first()

    print(f"input docs:          {n_docs}")
    print(f"after exact dedup:   {n_exact}")
    print(f"after near-dup:      {n_final}")
    print(
        f"kept corpus:         {stats['docs']} docs, {stats['tokens']} tokens, "
        f"avg stopword ratio {stats['avg_stopword_ratio']}"
    )
    final.orderBy("doc_id").show(5, truncate=60)

    # 6. semantic tier: surface-form dedup (stages 1-4) can't see paraphrases;
    #    SemDeDup-style cluster-scoped cosine keep-first over the embedding
    #    corpus covers that axis. Clusters come from the fixture label here;
    #    production uses build_ivf_index's k-means cells — same operator,
    #    same Σ|cluster|² bound either way.
    from savio_training_dask_2019_spark.operators import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    n_sem = semantic_dedup(emb, "embedding", "vec_id", "label", min_cosine=0.30).count()
    print(f"semantic tier:       {n_emb} vectors -> {n_sem} kept (cos >= 0.30 within cluster)")

    # 7. training-data product from the SAME embedding corpus: DPR-style
    #    hard negatives per anchor (broadcast anchor batch, one corpus scan,
    #    one per-anchor top-k shuffle) — what the contrastive-training run
    #    downstream of this pipeline consumes
    from savio_training_dask_2019_spark.operators import hard_negative_mining

    negs = hard_negative_mining(
        emb.filter(F.col("vec_id") < 4), emb, "embedding", "vec_id", "label", k=2
    )
    print("hard negatives (anchor -> negatives):")
    for r in negs.collect():
        print(f"  {r['query_id']} -> {r['corpus_id']} (cos {r['cosine']:.3f}, label {r['neg_label']})")


if __name__ == "__main__":
    main(*sys.argv[1:2])
