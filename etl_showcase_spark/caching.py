"""Bounded persist discipline for operator-internal caches.

Operators persist() frames that are consumed 2+ times inside a single
action (MinHash base shingles, ANN query postings, global-NTILE range
partitions): without the cache, AQE's broadcast-plan compilation and
multi-consumer joins recompute the subtree per consumer (measured
−26% to −66% on the near-dup family). Spark's CacheManager, however,
never evicts entries on its own — every registered query that chains
such operators would otherwise leave its caches in executor storage
for the SESSION's lifetime, and a 170-query driver run accumulates
hundreds of dead cached plans.

``tracked_persist`` is the repo-wide answer: persist + register in a
FIFO. Old entries are unpersisted once the FIFO exceeds its cap — far
above the persist count of any single query chain (max observed: 4),
far below a session-lifetime leak. Harnesses that know a query is
finished (bench.py between suite entries, the scale-stress lakes) call
``release_all()`` for an exact bound.

Unpersist is always non-blocking and correctness-neutral: evicting a
frame an in-flight plan still references only costs recompute.
"""

from __future__ import annotations

import threading
from collections import deque

from pyspark.sql import DataFrame

_TRACKED: deque[DataFrame] = deque()
_CAP = 32
# A streaming job and a batch build may call tracked_persist from
# different threads; the dedupe scan iterates the deque, so every
# mutation and scan happens under this lock (iterating a deque while
# another thread appends raises RuntimeError).
_LOCK = threading.Lock()


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist(df) with bounded-lifetime registration (see module doc).

    Rebuilding the same query produces a semantically identical frame
    whose persist() resolves to the SAME CacheManager entry — tracking
    it again would both inflate the FIFO and, on eviction, unpersist a
    cache that other live references still rely on. So re-registration
    is a dedupe no-op (sameSemantics scan over the ≤_CAP tracked
    frames)."""
    out = df.persist()
    evict: list[DataFrame] = []
    with _LOCK:
        for t in _TRACKED:
            try:
                if out.sameSemantics(t):
                    return out
            except Exception:  # plan not comparable — treat as distinct
                pass
        _TRACKED.append(out)
        while len(_TRACKED) > _CAP:
            evict.append(_TRACKED.popleft())
    for t in evict:  # unpersist outside the lock (JVM round-trip)
        try:
            t.unpersist(False)
        except Exception:  # session already stopped — nothing to release
            pass
    return out


def release_all() -> None:
    """Unpersist every tracked cache (harness boundary between queries)."""
    with _LOCK:
        evict = list(_TRACKED)
        _TRACKED.clear()
    for t in evict:
        try:
            t.unpersist(False)
        except Exception:
            pass
