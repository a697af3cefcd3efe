"""Behavioral pins for the LLM-pipeline corpus-prep queries (llmpipe.py) —
the oracle-parity differential runs in test_oracle_parity.py; these pin the
semantics the SQL twin can't express (scale invariants, exclusions, bounds).
"""

from __future__ import annotations

from savio_training_dask_2019_spark.queries import llmpipe


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pack_sequences_block_size_invariant(spark, sf_dir, monkeypatch):
    """The cascade's block size is a physical-plan knob only: any block
    size must yield identical rows — for the text packing AND the
    multimodal cost variant riding the same operator."""
    base = _rows(llmpipe.q_pack_sequences(spark, sf_dir))
    base_mm = _rows(llmpipe.q_pack_multimodal(spark, sf_dir))
    monkeypatch.setattr(llmpipe, "_PACK_BLOCK", 7)
    assert _rows(llmpipe.q_pack_sequences(spark, sf_dir)) == base
    assert _rows(llmpipe.q_pack_multimodal(spark, sf_dir)) == base_mm
    monkeypatch.setattr(llmpipe, "_PACK_BLOCK", 10_000)  # single block: plain cumsum
    assert _rows(llmpipe.q_pack_sequences(spark, sf_dir)) == base


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Every document lands in exactly one bin: token mass is conserved and
    every bin except possibly the last starts below the budget boundary."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.sources import load_table

    bins = llmpipe.q_pack_sequences(spark, sf_dir).collect()
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(token_count("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["bin_tokens"] for r in bins) == total
    assert sum(r["n_docs"] for r in bins) == load_table(spark, sf_dir, "documents").count()
    assert sorted(r["bin"] for r in bins) == list(range(len(bins)))  # contiguous bins


def test_pack_block_adaptive_bounds():
    """Adaptive B keeps every cascade level bounded by max(2048, ~n^(1/3)):
    blocks/B and supers = n/B² never exceed ~B, so the driver-side prefix
    stays ~cube-root-sized at any corpus size (no quadratic creep the fixed
    B=2048 had beyond ~10¹¹ docs)."""
    from savio_training_dask_2019_spark.queries.llmpipe import _pack_block_for

    assert _pack_block_for(0) == 2048
    assert _pack_block_for(60_000) == 2048  # fixture scale: unchanged plan
    assert _pack_block_for(2048**3) == 2048  # boundary: cube exactly covers
    for n in (10**11, 10**13, 10**15):
        b = _pack_block_for(n)
        assert b * b * b >= n  # supers = n/B² <= B
        assert b <= int(n ** (1.0 / 3.0)) + 2  # ...and not meaningfully more


def test_pack_sequences_leaves_no_cached_frame(spark, sf_dir):
    """q_pack_sequences persists its block-sum table internally; the call
    must release that cache before returning (checkpointed offsets are RDD
    registry entries GC'd with the returned frame — a *Dataset* cache left
    behind would accumulate one n/B-row frame per invocation). Start from a
    clean cache manager so a cache legitimately held by an earlier test in
    the shared session can't masquerade as a pack leak."""
    spark.catalog.clearCache()
    jsm = spark._jsparkSession.sharedState().cacheManager()
    assert jsm.isEmpty()
    llmpipe.q_pack_sequences(spark, sf_dir).collect()
    assert jsm.isEmpty(), "q_pack_sequences leaked a Dataset-level cache"
    llmpipe.q_pack_multimodal(spark, sf_dir).collect()
    assert jsm.isEmpty(), "q_pack_multimodal leaked a Dataset-level cache"


def test_decontam_excludes_eval_and_bounds(spark, sf_dir):
    rows = llmpipe.q_decontam_check(spark, sf_dir).collect()
    assert rows, "fixture should contain at least one contaminated doc"
    for r in rows:
        assert r["doc_id"] % llmpipe._EVAL_MOD != 0  # eval docs never flagged
        assert 1 <= r["n_hits"] <= r["n_shingles"]
        assert 0.0 < r["contam_frac"] <= 1.0


def test_mixture_sample_bounds(spark, sf_dir):
    rows = {r["lang"]: r for r in llmpipe.q_mixture_sample(spark, sf_dir).collect()}
    assert set(rows) == {lang for lang, _ in llmpipe._MIX_RATES}
    for lang, pct in llmpipe._MIX_RATES:
        r = rows[lang]
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if pct == 100:
            assert r["n_sampled"] == r["n_total"]  # rate 100 keeps everything
        # deterministic hash ≈ uniform: realized rate within ±15pp of target
        assert abs(r["realized_rate"] - pct / 100) < 0.15


def test_gopher_quality_rates_consistent(spark, sf_dir):
    for r in llmpipe.q_gopher_quality(spark, sf_dir).collect():
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert abs(r["pass_rate"] - round(r["n_pass"] / r["n_docs"], 4)) < 1e-9


def test_pii_redact_detects_only_planted(spark, sf_dir):
    """The fixture corpus is PII-free, so every hit comes from the planted
    payloads: per-category totals must equal the planting-rule counts, and
    redaction must strictly shrink every planted doc."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    # raw text contains no PII at all
    raw_hits = d.select(
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit(llmpipe._PII_EMAIL), F.lit(0)))
            + F.size(F.regexp_extract_all("text", F.lit(llmpipe._PII_PHONE), F.lit(0)))
            + F.size(F.regexp_extract_all("text", F.lit(llmpipe._PII_IPV4), F.lit(0)))
        ).alias("h")
    ).collect()[0]["h"]
    assert raw_hits == 0

    rows = llmpipe.q_pii_redact(spark, sf_dir).collect()
    planted = {
        "n_emails": d.where(F.col("doc_id") % 7 == 0).count(),
        "n_phones": d.where(F.col("doc_id") % 11 == 0).count(),
        "n_ipv4": d.where(F.col("doc_id") % 13 == 0).count(),
    }
    for col, want in planted.items():
        assert sum(r[col] for r in rows) == want, col
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert 0 <= r["docs_with_pii"] <= r["n_docs"]
        assert r["chars_removed"] >= 0
    # every redacted char total is positive for sources that had hits
    assert all(r["chars_removed"] > 0 for r in rows if r["docs_with_pii"] > 0)


def test_passage_dedup_kept_equals_distinct(spark, sf_dir):
    """Keep-first invariant: chunks kept (n_chunks - dup_chunks) summed over
    sources equals the corpus-wide distinct chunk count."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import tokens
    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_passage_dedup(spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "documents")
        .select(tokens("text").alias("tk"))
        .where(F.size("tk") > 0)
    )
    w = llmpipe._CHUNK_W
    chunks = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size("tk") / F.lit(w)).cast("int") - 1),
                lambda i: F.array_join(F.slice(F.col("tk"), i * w + 1, w), " "),
            )
        ).alias("chunk")
    )
    n_total = chunks.count()
    n_distinct = chunks.distinct().count()
    assert sum(r["n_chunks"] for r in rows) == n_total
    assert sum(r["n_chunks"] - r["dup_chunks"] for r in rows) == n_distinct
    assert n_distinct < n_total, "fixture should contain duplicate chunks"
    for r in rows:
        assert 0.0 < r["retention"] <= 1.0


def test_shard_corpus_conserves_and_bounds(spark, sf_dir):
    """Shard assignment is a partition of the corpus: doc and char mass are
    conserved, shard ids stay in range, and assignment is deterministic."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = {r["shard"]: r for r in llmpipe.q_shard_corpus(spark, sf_dir).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == d.count()
    assert (
        sum(r["shard_chars"] for r in rows.values())
        == d.select(F.sum("n_chars")).collect()[0][0]
    )
    assert all(0 <= s < llmpipe._N_SHARDS for s in rows)
    # deterministic under re-execution (content hash, not round-robin/rand)
    again = {r["shard"]: tuple(r) for r in llmpipe.q_shard_corpus(spark, sf_dir).collect()}
    assert again == {s: tuple(r) for s, r in rows.items()}


def test_unigram_logprob_is_entropy_consistent(spark, sf_dir):
    """Per-doc NLL averages over corpus-fitted token -ln p: the doc-count
    weighted mean of per-doc NLL must equal the token-weighted corpus NLL
    only when doc lengths are equal — but the corpus-level token-weighted
    NLL (= unigram entropy) IS recoverable exactly, and every per-language
    min/max must bracket its average."""
    import math

    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import tokens
    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_unigram_logprob(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == d.where(
        F.size(tokens("text")) > 0
    ).count()
    for r in rows:
        assert r["min_nll"] <= r["avg_nll"] <= r["max_nll"]
        assert r["min_nll"] > 0  # -ln p > 0 unless a token is the whole corpus

    # independent corpus-entropy check: sum over tokens of -c/N * ln(c/N)
    tok = d.select(F.explode(tokens("text")).alias("t")).groupBy("t").count()
    counts = [r["count"] for r in tok.collect()]
    n = sum(counts)
    entropy = sum(-(c / n) * math.log(c / n) for c in counts)
    # token-weighted corpus NLL equals entropy; doc-avg NLL must sit inside
    # the global [min_doc, max_doc] band around it
    lo = min(r["min_nll"] for r in rows)
    hi = max(r["max_nll"] for r in rows)
    assert lo <= entropy <= hi


def test_length_buckets_partitions_corpus(spark, sf_dir):
    """Histogram invariants: doc and token mass conserved, bucket ids in
    range, per-bucket avg consistent with sum/count, and the bucket edges
    actually bucket (every doc's token count maps into its bucket)."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import token_count
    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_length_buckets(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    tc = d.select(token_count("text").alias("tc"))
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert sum(r["total_tokens"] for r in rows) == tc.agg(F.sum("tc")).collect()[0][0]
    w, cap = llmpipe._LEN_BUCKET_W, llmpipe._LEN_BUCKET_CAP
    for r in rows:
        assert 0 <= r["len_bucket"] <= cap
        # <=1e-4: Spark rounds half-up, Python round() half-even (12.53125
        # -> 12.5313 vs 12.5312), so compare to the unrounded ratio instead
        assert abs(r["avg_tokens"] - r["total_tokens"] / r["n_docs"]) <= 1e-4
        if r["len_bucket"] < cap:
            # non-tail bucket: every member's count is inside [b*w, (b+1)*w)
            b = r["len_bucket"]
            assert r["n_docs"] == tc.where(
                (F.col("tc") >= b * w) & (F.col("tc") < (b + 1) * w)
            ).count()


def test_dedup_incremental_partitions_batch(spark, sf_dir):
    """Every batch doc lands in exactly one of {known, intra-batch dup,
    ingested}; ingested docs equal the batch's novel distinct hashes; the
    planted shared hashes actually exercise the known path."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_dedup_incremental(spark, sf_dir).collect()
    for r in rows:
        assert r["n_known"] + r["n_batch_dup"] + r["n_ingested"] == r["n_batch"]

    did = F.col("doc_id")
    h = F.when(
        did % 29 == 0,
        F.md5(F.concat(F.lit("planted-"), (did % 5).cast("string"))),
    ).otherwise(F.md5("text"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", h.alias("h"))
    hist = d.where(did % llmpipe._BATCH_MOD != 0).select("h").distinct()
    batch = d.where(did % llmpipe._BATCH_MOD == 0)
    assert sum(r["n_batch"] for r in rows) == batch.count()
    # ingested == distinct batch hashes not present in the snapshot
    novel = batch.select("h").distinct().join(hist, "h", "left_anti").count()
    assert sum(r["n_ingested"] for r in rows) == novel
    assert sum(r["n_known"] for r in rows) > 0, "planted hashes must hit snapshot"


def test_vocab_coverage_is_monotone(spark, sf_dir):
    """Coverage is monotone non-decreasing in K, bounded by (0, 1], and
    types_used == min(K, |vocab|)."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import tokens
    from savio_training_dask_2019_spark.sources import load_table

    rows = sorted(llmpipe.q_vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == sorted(llmpipe._COVERAGE_KS)
    cov = [r["coverage"] for r in rows]
    assert all(0 < c <= 1 for c in cov)
    assert cov == sorted(cov), "coverage must grow with K"
    n_types = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("t"))
        .distinct()
        .count()
    )
    for r in rows:
        assert r["types_used"] == min(r["k"], n_types)
    # full-vocab K must cover everything
    if rows[-1]["k"] >= n_types:
        assert rows[-1]["coverage"] == 1.0


def test_split_leakage_split_is_deterministic_partition(spark, sf_dir):
    """The split covers the corpus, the val fraction is near the target,
    and leakage is symmetric (a leaked hash contributes docs on both
    sides)."""
    from savio_training_dask_2019_spark.sources import load_table

    rows = {r["split"]: r for r in llmpipe.q_split_leakage(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    assert set(rows) <= {"train", "val"}
    assert sum(r["n_docs"] for r in rows.values()) == d.count()
    val_frac = rows["val"]["n_docs"] / d.count()
    assert 0.03 < val_frac < 0.25  # hash split lands near the 10% target
    # leakage counts docs, and a leaked hash spans both sides: if any side
    # has leaked docs, the other must too
    leaks = [r["n_leaked"] for r in rows.values()]
    assert (min(leaks) > 0) == (max(leaks) > 0)
    # deterministic under re-execution
    again = {r["split"]: tuple(r) for r in llmpipe.q_split_leakage(spark, sf_dir).collect()}
    assert again == {s: tuple(r) for s, r in rows.items()}


def test_stratified_sample_hits_exact_quotas(spark, sf_dir):
    """Each stratum yields exactly min(quota, stratum size) rows, ranks are
    the dense prefix 1..k within each stratum, and re-execution reproduces
    the identical sample (deterministic hash order, not rand())."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    picked = llmpipe.q_stratified_sample(spark, sf_dir).collect()
    sizes = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in picked:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {lang for lang, n in sizes.items() if n > 0}
    for lang, rows in by_lang.items():
        assert len(rows) == min(llmpipe._STRATUM_QUOTA, sizes[lang])
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
    again = llmpipe.q_stratified_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, picked))


def test_bigram_logprob_bounds_and_conditional_consistency(spark, sf_dir):
    """Per-language NLL bands must be internally consistent (min <= avg <=
    max, all > 0: a conditional probability is < 1 unless a context is
    deterministic — then its -ln p is 0, so min >= 0), and every doc with
    >= 2 tokens scores (the left join + floor drops nothing)."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.functions.text import tokens
    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_bigram_logprob(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == d.where(
        F.size(tokens("text")) >= 2
    ).count()
    for r in rows:
        assert 0 <= r["min_nll"] <= r["avg_nll"] <= r["max_nll"]


def test_ccnet_bands_partition_each_language(spark, sf_dir):
    """Per language: exactly min(3, n_docs) bands, tercile sizes differing
    by at most one, and band NLL ranges ordered without overlap (band 1 =
    head/lowest NLL ... band 3 = tail/highest)."""
    rows = llmpipe.q_ccnet_bands(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    uni = {r["lang"]: r for r in llmpipe.q_unigram_logprob(spark, sf_dir).collect()}
    for lang, bands in by_lang.items():
        bands.sort(key=lambda r: r["band"])
        n = sum(r["n_docs"] for r in bands)
        assert n == uni[lang]["n_docs"]  # bands cover the scored docs
        assert [r["band"] for r in bands] == list(range(1, min(3, n) + 1))
        sizes = [r["n_docs"] for r in bands]
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        for lo_band, hi_band in zip(bands, bands[1:]):
            assert lo_band["band_hi"] <= hi_band["band_lo"]  # ordered ranges


def test_dedup_keep_best_prefers_longest_variant(spark, sf_dir):
    """Keep-best picks the maximum-length variant per normalized group
    (doc_id tie-break), reports the keep-first answer alongside, and
    policy_diverges flags exactly the groups where the two disagree. The
    planted whitespace-padded variants are longer than the Title-Case ones,
    so every mixed group must keep a padded (%37) doc over a %31 doc."""
    rows = llmpipe.q_dedup_keep_best(spark, sf_dir).collect()
    assert rows
    from savio_training_dask_2019_spark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_copies"] for r in rows) == n_docs  # total mass conserved
    for r in rows:
        assert r["keep_id"] >= r["first_id"]
        assert r["policy_diverges"] == (r["keep_id"] != r["first_id"])
        assert r["n_copies"] >= 1 and r["kept_chars"] >= 0
    # the planted groups: padded lowercase (' shared passage number k ', 28+
    # chars) must beat Title-Case ('Shared Passage, Number k!', 25 chars)
    planted = [
        r for r in rows
        if r["n_copies"] > 1 and r["keep_id"] % llmpipe._NORM_PLANT_B == 0
        and r["first_id"] % llmpipe._NORM_PLANT_A == 0
    ]
    assert planted, "expected at least one mixed planted group"
    assert all(r["policy_diverges"] for r in planted)


def test_domain_filter_decisions_consistent(spark, sf_dir):
    """Decision rows partition the source set: blocklist membership is
    exact, low_quality tracks the threshold against the unrounded signal,
    kept == neither rule fired, and doc mass is conserved."""
    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_domain_filter(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert len(rows) == d.select("source").distinct().count()
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert r["blocked"] == (r["source"] in llmpipe._DOMAIN_BLOCKLIST)
        assert r["kept"] == (not r["blocked"] and not r["low_quality"])
    # both drop paths and the keep path must actually fire on the fixture
    assert any(r["blocked"] for r in rows)
    assert any(r["low_quality"] and not r["blocked"] for r in rows)
    assert any(r["kept"] for r in rows)


def test_mixture_weights_temperature_flattens(spark, sf_dir):
    """α<1 smoothing: both share columns sum to 1, low-resource languages
    are up-weighted (implied_epochs > 1) and the largest language is
    down-weighted (< 1) — the XLM-R flattening property."""
    rows = llmpipe.q_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["share_raw"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["share_temp"] for r in rows) - 1.0) < 1e-2
    biggest = max(rows, key=lambda r: r["lang_tokens"])
    smallest = min(rows, key=lambda r: r["lang_tokens"])
    assert biggest["implied_epochs"] < 1.0 < smallest["implied_epochs"]
    for r in rows:
        # epochs = share_temp / share_raw on the unrounded values
        assert r["implied_epochs"] > 0


def test_substring_dup_stats_match_python_reference(spark, sf_dir):
    """Per-language stride-1 window dup stats == a pure-Python recount
    (collections.Counter over every window string, corpus-wide ≥2 rule) —
    pins both the window cut (stride 1, length _SPAN_W) and the
    duplicated-occurrence accounting, including intra-document repeats."""
    from collections import Counter, defaultdict

    from savio_training_dask_2019_spark.sources import load_table

    W = llmpipe._SPAN_W
    docs = [
        (r["doc_id"], r["lang"], r["text"].split())
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    occ: Counter[str] = Counter()
    per_doc: dict[tuple, list] = {}
    for did, lang, tk in docs:
        if len(tk) < W:
            continue
        wins = [" ".join(tk[i : i + W]) for i in range(len(tk) - W + 1)]
        per_doc[(lang, did)] = wins
        occ.update(wins)
    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])  # docs, dupdocs, nw, dw
    for (lang, _did), wins in per_doc.items():
        dw = sum(1 for s in wins if occ[s] >= 2)
        a = agg[lang]
        a[0] += 1
        a[1] += 1 if dw > 0 else 0
        a[2] += len(wins)
        a[3] += dw
    got = {
        r["lang"]: (
            r["n_docs"], r["docs_with_dup_span"], r["total_windows"],
            r["dup_windows"], r["dup_frac"],
        )
        for r in llmpipe.q_substring_dup_stats(spark, sf_dir).collect()
    }
    want = {
        lang: (a[0], a[1], a[2], a[3], round(a[3] / a[2], 4)) for lang, a in agg.items()
    }
    assert got == want
    # stride-1 must see at least the duplication the tumbling chunks see:
    # the fixture contains duplicate chunks, so dup windows must exist
    assert any(v[3] > 0 for v in got.values())


def test_substring_scrub_matches_python_reference(spark, sf_dir):
    """Removal accounting == a pure-Python reference: rank every window
    occurrence globally (content, then (doc_id, pos)), mark non-first
    occurrences' token ranges, merge overlaps per doc, count removed
    tokens. Pins the keep-first-occurrence rule AND the interval merge."""
    from collections import defaultdict

    from savio_training_dask_2019_spark.sources import load_table

    W = llmpipe._SPAN_W
    docs = [
        (r["doc_id"], r["lang"], r["text"].split())
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    first_seen: dict[str, tuple] = {}
    ranges: dict[int, list] = defaultdict(list)
    meta: dict[int, str] = {}
    totals: dict[str, list] = defaultdict(lambda: [0, 0])  # docs, tokens
    for did, lang, tk in sorted(docs):
        if len(tk) < W:
            continue
        meta[did] = lang
        t = totals[lang]
        t[0] += 1
        t[1] += len(tk)
        for i in range(len(tk) - W + 1):
            s = " ".join(tk[i : i + W])
            if s in first_seen:
                ranges[did].append((i + 1, i + W))
            else:
                first_seen[s] = (did, i)
    agg: dict[str, list] = defaultdict(lambda: [0, 0])  # touched, removed
    for did, rs in ranges.items():
        rs.sort()
        removed, cur_s, cur_e = 0, None, None
        for s, e in rs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    removed += cur_e - cur_s + 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        removed += cur_e - cur_s + 1
        a = agg[meta[did]]
        a[0] += 1
        a[1] += removed
    got = {
        r["lang"]: (
            r["n_docs"], r["docs_touched"], r["tokens_total"],
            r["tokens_removed"], r["removed_frac"],
        )
        for r in llmpipe.q_substring_scrub(spark, sf_dir).collect()
    }
    want = {
        lang: (t[0], agg[lang][0], t[1], agg[lang][1], round(agg[lang][1] / t[1], 4))
        for lang, t in totals.items()
    }
    assert got == want
    assert any(v[3] > 0 for v in got.values())  # fixture has duplicated spans
    # the remover can never remove more than the dup-stats query flags as
    # duplicated... plus first-window tokens never counted by stats — weaker
    # sanity: removed <= total
    for v in got.values():
        assert 0 <= v[3] <= v[2]


def test_dsir_weights_selection_properties(spark, sf_dir):
    """Importance selection invariants: only source docs are scored (the
    target slice never ranks itself), shares are consistent, and the
    fixture produces BOTH selected and rejected docs (the >0 cut is
    non-degenerate). Eval-convention parity with decontam: same
    _EVAL_MOD slice plays the target."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    rows = llmpipe.q_dsir_weights(spark, sf_dir).collect()
    assert rows
    d = load_table(spark, sf_dir, "documents")
    n_source = d.where(F.col("doc_id") % llmpipe._EVAL_MOD != 0).count()
    assert sum(r["n_docs"] for r in rows) == n_source
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_docs"]
        assert abs(r["sel_rate"] - round(r["n_selected"] / r["n_docs"], 4)) < 1e-9
        assert r["min_imp"] <= r["avg_imp"] <= r["max_imp"]
    assert any(r["n_selected"] > 0 for r in rows)
    assert any(r["n_selected"] < r["n_docs"] for r in rows)


# --- sliding-window chunking ---------------------------------------------------


def test_chunk_tokens_policy_corners(spark):
    """Every token lands in >= 1 chunk, the tail chunk is short rather than
    dropped, consecutive chunks overlap by size-stride, an empty doc keeps
    exactly one empty chunk, and bad params raise."""
    import pytest

    from savio_training_dask_2019_spark.operators.packing import chunk_tokens

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens: starts 1,5,9
        (2, "a b c"),                               # 3 tokens: one short chunk
        (3, "   "),                                 # whitespace-only: 1 empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_tokens(df, "text", "doc_id", size=6, stride=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c1] == [1, 5, 9]
    assert [r["n_tok_chunk"] for r in c1] == [6, 6, 2]  # tail short, kept
    # overlap: chunk k's last (size-stride) tokens == chunk k+1's first
    t0 = c1[0]["chunk_text"].split()
    t1 = c1[1]["chunk_text"].split()
    assert t0[-2:] == t1[:2]
    # coverage: union of chunk tokens in order == the document
    seen = t0 + t1[2:] + c1[2]["chunk_text"].split()[2:]
    assert seen == [f"t{i}" for i in range(10)]
    assert [(r["n_tok_chunk"], r["chunk_text"]) for r in by_doc[2]] == [(3, "a b c")]
    assert [(r["n_tok_chunk"], r["chunk_text"]) for r in by_doc[3]] == [(0, "")]

    with pytest.raises(ValueError, match="stride"):
        chunk_tokens(df, size=4, stride=6)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_tokens(df, size=0, stride=1)


def test_chunk_documents_narrow_plan(spark, sf_dir):
    """The catalog query is a pure narrow map: zero shuffles, zero joins,
    one scan."""
    from savio_training_dask_2019_spark import plans
    from savio_training_dask_2019_spark.queries import QUERIES

    df = QUERIES["chunk_documents"](spark, sf_dir)
    assert plans.shuffle_count(df) <= 1  # the toy-input spread only
    assert plans.broadcast_join_count(df) == 0
    assert plans.scan_count(df) == 1


def test_dedup_incremental_bloom_equals_exact_twin(spark, sf_dir):
    """The bloom-prefiltered ingest report is bit-identical to the exact
    twin (bloom admits false positives only; every candidate is re-checked
    by the hash join), and the bitset broadcast is physically built ONCE —
    the two union branches reuse the exchange at runtime."""
    from savio_training_dask_2019_spark.queries import QUERIES

    exact = sorted(
        map(tuple, QUERIES["dedup_incremental"](spark, sf_dir).collect())
    )
    df = QUERIES["dedup_incremental_bloom"](spark, sf_dir)
    assert sorted(map(tuple, df.collect())) == exact
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1, "bloom broadcast not reused"
    spark.catalog.clearCache()


def test_snapshot_diff_all_branches_fire_and_account(spark, sf_dir):
    """Every branch (added/removed/changed/unchanged) fires on the fixture,
    and the per-source counts account for the union exactly:
    n_removed + n_changed + n_unchanged = |old ∩ accounted| and
    added+changed+unchanged = |new| per source."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.queries import QUERIES
    from savio_training_dask_2019_spark.queries.llmpipe import (
        _SNAP_EDIT,
        _SNAP_MOD,
    )
    from savio_training_dask_2019_spark.sources import load_table

    rows = QUERIES["snapshot_diff"](spark, sf_dir).collect()
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    assert all(v > 0 for v in tot.values()), tot  # every branch exercised

    d = load_table(spark, sf_dir, "documents")
    n_new = d.where(F.col("doc_id") % _SNAP_MOD != 1).count()
    n_old = d.where(
        (F.col("doc_id") % _SNAP_MOD != 0) | (F.col("doc_id") % _SNAP_EDIT == 0)
    ).count()
    assert tot["n_added"] + tot["n_changed"] + tot["n_unchanged"] == n_new
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_old


def test_ngram_novelty_planted_ownership(spark, tmp_path):
    """doc1 (A) introduces both of its 3-grams; doc2 (B) inherits
    'a b c' and introduces 'b c e'; doc3 (B) re-uses doc1's shingles
    without changing ownership; a short doc contributes no shingles but
    still counts in n_docs."""
    import pandas as pd

    texts = ["a b c d", "a b c e", "a b c d", "x y"]
    srcs = ["A", "B", "B", "A"]
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": texts,
            "lang": "en",
            "source": srcs,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        r["source"]: (
            r["n_docs"], r["types_present"], r["types_owned"],
            r["novelty_share"],
        )
        for r in llmpipe.q_ngram_novelty(spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (2, 2, 2, 1.0),
        "B": (2, 3, 1, round(1 / 3, 4)),
    }


def _cdc_tok_hash(tok):
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % 2147483648
    return h


def _cdc_boundaries(toks, w=4, mask=64):
    th = [_cdc_tok_hash(t) for t in toks]
    out = []
    for i in range(len(th) - w + 1):
        h = 0
        for v in th[i: i + w]:
            h = (h * 1000003 + v) % 2147483648
        if h % mask == 0:
            out.append(i)
    return out


def test_cdc_chunks_matches_python_mirror(spark, tmp_path):
    """q_cdc_chunks vs a python mirror of the identical double fold over
    random small-alphabet docs (small alphabet makes boundary hits
    frequent enough to exercise every output column)."""
    import random

    import pandas as pd

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 40))),
         "en" if i % 2 == 0 else "de")
        for i in range(60)
    ]
    pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": "s",
            "n_chars": [len(d[1]) for d in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    from collections import defaultdict

    from savio_training_dask_2019_spark.queries.llmpipe import q_cdc_chunks

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, bounds, chunks
    for _i, text, lang in docs:
        toks = text.split()
        nb = len(_cdc_boundaries(toks))
        a = agg[lang]
        a[0] += 1
        a[1] += len(toks)
        a[2] += nb
        a[3] += 0 if not toks else nb + 1

    got = {
        r["lang"]: (r["docs"], r["tot_tokens"], r["tot_boundaries"],
                    r["tot_chunks"], r["avg_chunk_tokens"])
        for r in q_cdc_chunks(spark, str(tmp_path)).collect()
    }
    want = {
        lang: (d, t, b, c, round(t / c, 4)) for lang, (d, t, b, c) in agg.items()
    }
    assert got == want
    assert any(b > 0 for _, _, b, _, _ in got.values())  # boundaries fired


def test_cdc_boundaries_shift_resistant():
    """THE content-defined property (vs fixed-size blocks): prepending a
    token shifts every position by one but the boundary SET beyond the
    first window is the same boundaries shifted — downstream chunks
    re-align, which is exactly what makes CDC dedup insertion-proof."""
    import random

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(30)]
    toks = rng.choices(vocab, k=400)
    base = _cdc_boundaries(toks)
    shifted = _cdc_boundaries(["NEW"] + toks)
    # boundaries at i in the original reappear at i+1 after the insert,
    # except inside the first window where the new token participates
    assert {b + 1 for b in base if b >= 1}.issubset(set(shifted))
    assert len(base) > 3  # the property was exercised on real boundaries
