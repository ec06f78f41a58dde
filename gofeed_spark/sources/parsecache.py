"""Driver-side parse cache for immutable table-format metadata files.

Iceberg manifests / manifest lists and Delta checkpoints are WRITE-ONCE
(uuid-tokened names, create-if-absent publication), but every read of a
table re-parses them in pure Python — the metadata-plane cost that grows
with file count (r16 verdict watch item: iceberg_head 3.05 s vs
delta_head 1.27 s at a 5-commit table, all of it manifest parsing).
Since the bytes at a given path can never change, a per-process LRU keyed
by path is sound; entries return as DEEP COPIES so downstream mutation
(``_seq`` stamping, ``_eq_cols`` resolution) can never poison the cache.

The capacity bound keeps the driver's footprint flat on long sessions
that touch many tables; eviction is recency-based (the catalog.py
relation-cache precedent, plus a bound)."""

from __future__ import annotations

import copy
from collections import OrderedDict
from threading import Lock


class ParseCache:
    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._d: OrderedDict = OrderedDict()
        self._lock = Lock()

    def get(self, key, sig=None):
        """``sig`` (when given) must equal the signature stored with the
        entry — callers pass the file's (size, mtime) stat so an
        out-of-band rewrite at the same path (which the write-once
        protocol never does, but a forged or repaired tree might)
        invalidates instead of serving the stale parse.  A stat is
        orders of magnitude cheaper than the parse it guards."""
        with self._lock:
            entry = self._d.get(key)
            if entry is None:
                return None
            if sig is not None and entry[0] != sig:
                del self._d[key]
                return None
            self._d.move_to_end(key)
            return copy.deepcopy(entry[1])

    def put(self, key, value, sig=None) -> None:
        with self._lock:
            self._d[key] = (sig, copy.deepcopy(value))
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()
