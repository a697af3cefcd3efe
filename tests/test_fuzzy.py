"""edit_distance_join (operators/fuzzy.py — PassJoin pigeonhole blocking)
and the three r10-late diagnostic/eval queries built on or alongside it:
fuzzy_join, skew_profile, retrieval_eval.

The load-bearing claim is LOSSLESSNESS: the segment blocking must produce a
candidate superset of every true pair (no false negatives), because the
catalog oracle is the definitional all-pairs form. The differential tests
below check exactly that against DuckDB's levenshtein over randomized
corpora, including adversarial shapes (shared prefixes, length spread,
unequal lengths, duplicate strings)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from savio_training_dask_2019_spark.operators.fuzzy import edit_distance_join


def _naive(rows: list[tuple[int, str]], k: int) -> list[tuple[int, int, int]]:
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "s"]))
    out = con.sql(
        f"""SELECT a.id, b.id, CAST(levenshtein(a.s, b.s) AS INT)
            FROM t a JOIN t b ON a.id < b.id
            WHERE length(a.s) > {k} AND length(b.s) > {k}
              AND levenshtein(a.s, b.s) <= {k}"""
    ).fetchall()
    con.close()
    return sorted(map(tuple, out))


def _run(spark, rows: list[tuple[int, str]], k: int) -> list[tuple[int, int, int]]:
    df = spark.createDataFrame(rows, ["id", "s"])
    return sorted(map(tuple, edit_distance_join(df, "id", "s", k=k).collect()))


@pytest.mark.parametrize("k", [1, 2])
def test_differential_random_small_alphabet(spark, k):
    # alphabet of 3 → dense near-neighborhoods, many true pairs
    import random

    rng = random.Random(1234 + k)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(k + 1, 9))))
        for i in range(250)
    ]
    assert _run(spark, rows, k) == _naive(rows, k)


def test_differential_shared_prefix_blocks(spark):
    # Customer#-style: long identical prefix, digits vary — the hot-block
    # shape the catalog query hits; also exercises shift matches
    rows = [(i, f"user#{i % 7}{(i * 13) % 10}{i % 10}x") for i in range(200)]
    k = 2
    assert _run(spark, rows, k) == _naive(rows, k)


def test_differential_unequal_lengths(spark):
    # insertions/deletions: pairs differ in length by up to k
    import random

    rng = random.Random(99)
    base = ["".join(rng.choice("xy") for _ in range(6)) for _ in range(60)]
    rows = []
    for i, b in enumerate(base):
        rows.append((3 * i, b))
        rows.append((3 * i + 1, b + rng.choice("xy")))          # +1 char
        rows.append((3 * i + 2, b[: rng.randint(3, 5)]))         # shorter
    k = 2
    assert _run(spark, rows, k) == _naive(rows, k)


def test_duplicate_strings_distance_zero(spark):
    rows = [(0, "abcdef"), (1, "abcdef"), (2, "abcdxx"), (3, "zzzzzz")]
    got = _run(spark, rows, 2)
    assert (0, 1, 0) in got
    assert (0, 2, 2) in got and (1, 2, 2) in got
    assert all(p[1] != 3 and p[0] != 3 for p in got)


def test_short_string_contract(spark):
    # strings with length <= k are dropped from both sides, per docstring
    rows = [(0, "ab"), (1, "ab"), (2, "abcd"), (3, "abce")]
    got = _run(spark, rows, 2)
    assert got == [(2, 3, 1)]


def test_plan_is_equi_join_no_nested_loop(spark):
    rows = [(i, f"name{i:04d}") for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "s"])
    plan = (
        edit_distance_join(df, "id", "s", k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejoin_by_id_same_pairs(spark):
    """The document-scale verify path (VERDICT r11 #3) is a pure physical
    rewrite: identical exact pair set on an adversarial shared-prefix +
    long-string fixture."""
    import random

    rng = random.Random(4242)
    rows = []
    for i in range(150):
        body = "lorem ipsum dolor sit amet " * 3 + "".join(
            rng.choice("abcd") for _ in range(6)
        )
        rows.append((i, body))
    df = spark.createDataFrame(rows, ["id", "s"])
    base = sorted(map(tuple, edit_distance_join(df, "id", "s", k=2).collect()))
    rej = sorted(
        map(
            tuple,
            edit_distance_join(df, "id", "s", k=2, rejoin_by_id=True).collect(),
        )
    )
    assert rej == base
    assert base == _naive(rows, 2)


def test_rejoin_by_id_candidate_shuffle_carries_no_strings(spark):
    """Width pin: the candidate-stage frame's schema is (id_a, id_b) ONLY —
    no full-string column crosses the candidate shuffle by construction —
    and the rejoin plan stays BNLJ-free."""
    from savio_training_dask_2019_spark.operators.fuzzy import (
        _candidate_ids,
        _prep,
        _segments,
        _substrings,
    )

    rows = [(i, f"document body {i:05d} with some shared prefix") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "s"])
    s = _prep(df, "id", "s", 2)
    cand = _candidate_ids(_segments(s, 2), _substrings(s, 2))
    assert [f.name for f in cand.schema.fields] == ["id_a", "id_b"]

    plan = (
        edit_distance_join(df, "id", "s", k=2, rejoin_by_id=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- edit_distance_lookup ----------------------------------------------------


def _naive_lookup(qrows, crows, k):
    con = duckdb.connect()
    con.register("q", pd.DataFrame(qrows, columns=["id", "s"]))
    con.register("c", pd.DataFrame(crows, columns=["id", "s"]))
    out = con.sql(
        f"""SELECT q.id, c.id, CAST(levenshtein(q.s, c.s) AS INT)
            FROM q JOIN c ON length(q.s) > {k} AND length(c.s) > {k}
            WHERE levenshtein(q.s, c.s) <= {k}"""
    ).fetchall()
    con.close()
    return sorted(map(tuple, out))


@pytest.mark.parametrize("k", [1, 2])
def test_lookup_differential_random(spark, k):
    """Asymmetric blocking must be lossless too: the two-table lookup
    equals the definitional cross join on random small-alphabet corpora
    with overlapping and disjoint id spaces."""
    import random

    from savio_training_dask_2019_spark.operators.fuzzy import edit_distance_lookup

    rng = random.Random(555 + k)
    qrows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(k + 1, 8))))
        for i in range(150)
    ]
    crows = [
        (1000 + i, "".join(rng.choice("abc") for _ in range(rng.randint(k + 1, 8))))
        for i in range(80)
    ]
    qdf = spark.createDataFrame(qrows, ["qid", "qs"])
    cdf = spark.createDataFrame(crows, ["cid", "cs"])
    got = sorted(
        map(
            tuple,
            edit_distance_lookup(qdf, "qid", "qs", cdf, "cid", "cs", k=k).collect(),
        )
    )
    assert got == _naive_lookup(qrows, crows, k)


def test_lookup_best_match_shape(spark):
    """The canonical-correction pattern: dirty variants resolve to their
    master entry via min(dist) per query."""
    from savio_training_dask_2019_spark.operators.fuzzy import edit_distance_lookup

    canon = spark.createDataFrame(
        [(1, "acme corporation"), (2, "globex industries")], ["cid", "cs"]
    )
    dirty = spark.createDataFrame(
        [(10, "acme corporatio"), (11, "globex industrees"), (12, "zzz unrelated")],
        ["qid", "qs"],
    )
    m = edit_distance_lookup(dirty, "qid", "qs", canon, "cid", "cs", k=2)
    best = {
        r["query_id"]: r["canon_id"]
        for r in m.groupBy("query_id")
        .agg(F.min_by("canon_id", F.struct("dist", "canon_id")).alias("canon_id"))
        .collect()
    }
    assert best == {10: 1, 11: 2}  # 12 matches nothing


# --- fuzzy_clusters ----------------------------------------------------------


def test_fuzzy_clusters_planted_families(spark, tmp_path):
    """Entity families planted as typo variants (distance <= 2 inside a
    family, far across families): one cluster per family, cluster_id = the
    family's min custkey, singleton strings absent (no edges)."""
    import pandas as pd

    from savio_training_dask_2019_spark.queries.relational import (
        _FUZZY_MOD,
        q_fuzzy_clusters,
    )

    # keys all ≡ 0 (mod _FUZZY_MOD) so every row passes the slice filter
    m = _FUZZY_MOD
    rows = [
        (0 * m, "alpha-entity-x"),
        (1 * m, "alpha-entity-xy"),   # +1 char
        (2 * m, "alpha-entity-z"),    # 1 sub
        (10 * m, "beta-something-q"),
        (11 * m, "beta-something-qq"),
        (20 * m, "GAMMA-UNIQUE-FAR"),  # singleton: no neighbors
    ]
    pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [r[1] for r in rows],
            "c_nationkey": 0,
            "c_acctbal": 0.0,
            "c_mktsegment": "X",
        }
    ).to_parquet(tmp_path / "customer.parquet")

    got = {
        r["c_custkey"]: r["cluster_id"]
        for r in q_fuzzy_clusters(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: 0,
        1 * m: 0,
        2 * m: 0,
        10 * m: 10 * m,
        11 * m: 10 * m,
    }


# --- skew_profile ----------------------------------------------------------


def test_skew_profile_hand_computed(spark, sf_dir):
    """entropy_bits / hot_share / max_cnt recomputed by hand (numpy) from
    the events fixture must match the single-fold Spark form."""
    from savio_training_dask_2019_spark.queries.relational import q_skew_profile

    row = {
        r["keyset"]: r
        for r in q_skew_profile(spark, sf_dir).collect()
    }["events.user_id"]
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    counts = pdf.groupby("user_id").size()
    n = counts.sum()
    p = counts / n
    ent = float(-(p * p.map(math.log2)).sum())
    assert row["n_keys"] == len(counts)
    assert row["n_rows"] == n
    assert row["max_cnt"] == counts.max()
    assert row["hot_share"] == round(counts.max() / n, 6)
    assert abs(row["entropy_bits"] - ent) < 1e-5
    # entropy is bounded by the uniform ceiling
    assert row["entropy_bits"] <= math.log2(row["n_keys"]) + 1e-9


def test_skew_profile_detects_planted_skew(spark, sf_dir):
    """A 90%-hot planted key must push hot_share up and entropy far below
    the uniform ceiling — the diagnostic actually diagnoses."""
    from savio_training_dask_2019_spark.queries.relational import _skew_one

    hot = spark.range(0, 900).select(F.lit(7).alias("user_id"))
    cold = spark.range(0, 100).select((F.col("id") + 100).alias("user_id"))
    df = hot.unionByName(cold)
    df.createOrReplaceTempView("_skewtmp")
    counts = df.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    out = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_cnt"),
        F.sum(F.col("c") * F.log2("c")).alias("_sclog"),
    ).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("hot_share"),
        F.round(F.log2("n_rows") - F.col("_sclog") / F.col("n_rows"), 6).alias(
            "entropy_bits"
        ),
    ).collect()[0]
    assert out["hot_share"] == 0.9
    assert out["entropy_bits"] < 0.2 * math.log2(out["n_keys"])
    assert _skew_one is not None  # imported shape is the one under test


# --- retrieval_eval --------------------------------------------------------


def test_retrieval_eval_metric_contract(spark, sf_dir):
    from savio_training_dask_2019_spark.queries.vectorops import (
        _REVAL_K,
        _REVAL_NQ,
        q_retrieval_eval,
    )

    rows = q_retrieval_eval(spark, sf_dir).collect()
    assert len(rows) == _REVAL_NQ
    for r in rows:
        assert 0.0 <= r["p_at_k"] <= 1.0
        assert 0.0 <= r["rr"] <= 1.0
        # rr > 0 iff at least one hit: p_at_k > 0 implies a first-hit rank
        assert (r["rr"] > 0) == (r["p_at_k"] > 0)
        if r["rr"] > 0:
            # rr must be exactly 1/rank for some rank in [1, k]
            rank = round(1.0 / r["rr"])
            assert 1 <= rank <= _REVAL_K
            assert abs(r["rr"] - round(1.0 / rank, 6)) < 1e-9
