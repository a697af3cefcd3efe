"""Tiny bounded LRU used for driver-side memoization (resolved table scans,
query vectors, fitted ANN indexes). These caches hold a handful of entries in
normal use; the bound exists so a long-running service that cycles through
many (sf_dir, id) keys can't grow driver memory without limit. Plain dict +
recency ordering — no locks (Spark driver code paths here are single-threaded
per session; a stale overwrite under races would be harmless anyway).
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Hashable
from typing import Generic, TypeVar

K = TypeVar("K", bound=Hashable)
V = TypeVar("V")


class BoundedCache(Generic[K, V]):
    """LRU-evicting mapping with a fixed capacity.

    ``on_evict`` (optional) runs for each evicted value — used to release
    resources tied to an entry (e.g. ``DataFrame.unpersist`` for a cached
    ANN index's assigned corpus).
    """

    def __init__(self, capacity: int = 8, on_evict: Callable[[V], None] | None = None):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self._capacity = capacity
        self._on_evict = on_evict
        self._data: OrderedDict[K, V] = OrderedDict()

    def get(self, key: K) -> V | None:
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        return None

    def put(self, key: K, value: V) -> None:
        if key in self._data:
            self._data.move_to_end(key)
        self._data[key] = value
        while len(self._data) > self._capacity:
            _, evicted = self._data.popitem(last=False)
            if self._on_evict is not None:
                self._on_evict(evicted)

    def get_or_create(self, key: K, factory: Callable[[], V]) -> V:
        found = self.get(key)
        if found is None:
            found = factory()
            self.put(key, found)
        return found

    def clear(self) -> None:
        if self._on_evict is not None:
            for v in self._data.values():
                self._on_evict(v)
        self._data.clear()

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: K) -> bool:
        return key in self._data
