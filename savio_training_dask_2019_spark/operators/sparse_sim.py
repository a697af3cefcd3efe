"""Sparse all-pairs cosine similarity with lossless prefix filtering —
the Bayardo, Ma & Srikant WWW'07 ("Scaling Up All Pairs Similarity
Search") mechanism, DataFrame-native: the sparse-vector member of the
similarity family (embedding cosine covers dense vectors; MinHash/
SimHash cover sets; THIS covers weighted term vectors — TF-IDF docs,
user-item interactions, sparsified embeddings).

Why it scales: the naive inverted-index pair join materializes
Σ_t df(t)² partial products — one hot term (a stopword, a popular
item) makes that quadratic. Prefix filtering bounds it losslessly:
order every vector's terms by a GLOBAL rarity order (ascending document
frequency — rarest first), and keep as the "prefix" the shortest head
whose complement carries squared mass < t² of the vector. If two unit
vectors x, y satisfy cos(x, y) >= t, then not all common terms can lie
in x's suffix — else dot <= ||x_suffix||·||y|| < t by Cauchy–Schwarz
(sign-agnostic, so negative weights are fine). Hence every qualifying
pair is found by joining FULL vectors against PREFIX entries only —
the index shrinks to the rare head of each vector and hot terms fall
out of the candidate join entirely (a hot term is by construction at
the suffix end of the rarity order).

Exactness discipline: the float unit-normalization is used ONLY to pick
prefixes (over-inclusion is harmless; a 1e-9 slack guards the boundary
against under-inclusion). The returned aggregates — dot, the two
squared norms — are sums in the INPUT weight dtype, so integer weights
give exact BIGINT dot/norms and the caller can threshold in pure
integer arithmetic (den·dot² >= num·na·nb — the catalog query's form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PREFIX_SLACK = 1e-9  # float-boundary guard: may only ADD candidates


def cosine_candidate_pairs(
    vectors: DataFrame,
    id_col: str,
    term_col: str,
    weight_col: str,
    threshold: float,
) -> DataFrame:
    """All candidate pairs for cosine >= ``threshold`` over sparse
    vectors given as (id, term, weight) rows — LOSSLESS: every pair at
    or above the threshold appears (plus false positives the caller
    filters). Duplicate (id, term) rows are summed first.

    Returns ``(id_a < id_b, dot, norm_sq_a, norm_sq_b)`` where the
    three aggregates are exact sums in the input weight dtype; cosine
    = dot / sqrt(norm_sq_a · norm_sq_b). The threshold drives pruning
    only — the caller applies the real filter (float, or exact integer
    when the weights are integers).

    Plan: term-df groupBy (vocabulary-sized), one id-partitioned window
    for the suffix-mass walk, ONE full⋈prefix equi-join on the term,
    pair dedup, then the verify join restricted to candidates. Every
    shuffle is keyed; nothing is FORCED broadcast — the term-df table is
    vocabulary-sized (a 100 TB token/item vocabulary can exceed broadcast
    capacity), so Catalyst/AQE picks its join strategy from measured
    sizes: broadcast when the vocabulary is small, shuffle join when it
    is not. The candidate full⋈prefix join is fact×fact and must stay a
    shuffle join (plan-pinned in tests/test_plans.py).
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    v = (
        vectors.groupBy(
            F.col(id_col).alias("id"), F.col(term_col).alias("term")
        )
        .agg(F.sum(weight_col).alias("w"))
        .where(F.col("w").isNotNull())
        .localCheckpoint(eager=True)  # df branch, prefix walk, verify ×2
    )
    nsq = v.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("nsq"))
    dfreq = v.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    wo = Window.partitionBy("id").orderBy("df", "term")
    ordered = (
        v.join(dfreq, "term")  # AQE sizes this: broadcast iff vocab is small
        .join(nsq, "id")
        .withColumn(
            "u2",
            (F.col("w") * F.col("w")).cast("double")
            / F.col("nsq").cast("double"),
        )
        .withColumn(
            "cum", F.sum("u2").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        # remaining squared mass BEFORE consuming this term
        .withColumn("before", 1.0 - (F.col("cum") - F.col("u2")))
    )
    prefix = ordered.where(
        F.col("before") >= threshold * threshold - _PREFIX_SLACK
    ).select("id", "term")
    cand = (
        v.select(F.col("id").alias("fid"), "term")
        .join(prefix.select(F.col("id").alias("pid"), "term"), "term")
        .where(F.col("fid") != F.col("pid"))
        .select(
            F.least("fid", "pid").alias("id_a"),
            F.greatest("fid", "pid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = v.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = v.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nsq.select(F.col("id").alias("id_a"), F.col("nsq").alias("norm_sq_a"))
    nb = nsq.select(F.col("id").alias("id_b"), F.col("nsq").alias("norm_sq_b"))
    return dots.join(na, "id_a").join(nb, "id_b")
