"""BoundedCache: LRU bound + eviction hook (driver-side memo used by the
table catalog, query-vector memo, and the IVF index cache)."""

from __future__ import annotations

from savio_training_dask_2019_spark.cache import BoundedCache


def test_lru_evicts_oldest_and_bounds_size():
    evicted = []
    c: BoundedCache[int, str] = BoundedCache(capacity=2, on_evict=evicted.append)
    c.put(1, "a")
    c.put(2, "b")
    assert c.get(1) == "a"  # touch 1 → 2 is now LRU
    c.put(3, "c")
    assert len(c) == 2
    assert evicted == ["b"]
    assert c.get(2) is None
    assert c.get(1) == "a" and c.get(3) == "c"


def test_get_or_create_runs_factory_once():
    calls = []
    c: BoundedCache[str, int] = BoundedCache(capacity=4)

    def factory():
        calls.append(1)
        return 42

    assert c.get_or_create("k", factory) == 42
    assert c.get_or_create("k", factory) == 42
    assert len(calls) == 1


def test_clear_runs_evict_hook():
    evicted = []
    c: BoundedCache[int, int] = BoundedCache(capacity=4, on_evict=evicted.append)
    c.put(1, 10)
    c.put(2, 20)
    c.clear()
    assert len(c) == 0
    assert sorted(evicted) == [10, 20]


def test_invalidate_cached_indexes_empties_ivf_cache(spark, sf_dir):
    """The bench-loop contract: after a blanket clearCache, invalidating
    the index cache must drop every fitted index so the next probe
    rebuilds instead of scanning an unpersisted assignment forever."""
    from savio_training_dask_2019_spark.queries import vectorops

    vectorops.q_knn_ivf(spark, sf_dir).collect()
    assert len(vectorops._IVF_CACHE) == 1
    spark.catalog.clearCache()
    vectorops.invalidate_cached_indexes()
    assert len(vectorops._IVF_CACHE) == 0
    # and a fresh probe still works (rebuild path)
    assert vectorops.q_knn_ivf(spark, sf_dir).count() > 0
