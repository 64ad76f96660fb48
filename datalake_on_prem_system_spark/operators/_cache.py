"""Lifecycle for operator-INTERNAL persisted frames.

Some operators persist a mid-plan frame because several plan branches
consume it (the dedup shingle frames: Catalyst shares nothing across
branches, so without the cache the corpus is re-shingled per branch). The
returned DataFrame references the cached relation lazily, so the operator
itself has no safe point to unpersist — and relying on the sweep harness's
``clearCache()`` (or MEMORY_AND_DISK LRU) made long sessions accumulate
storage until eviction pressure (round-6 ADVICE).

``persist_bounded`` makes the lifecycle harness-independent: every
operator-internal persist registers here, and the registry keeps at most
``_MAX_LIVE`` frames alive — inserting beyond the cap unpersists the
oldest (FIFO ≈ least-recently-created). Unpersisting a frame a still-lazy
result references is safe by construction (Spark falls back to
recomputing the lineage), it only costs the cache benefit — and only for
a consumer that held a result across ≥ ``_MAX_LIVE`` subsequent queries.

``release_all()`` is the explicit boundary hook for harnesses/services
that want storage back NOW (end of request, between sweeps).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

# small: each tracked frame is corpus-shingle-sized; the cap bounds worst
# case storage at a handful of concurrently-useful frames
_MAX_LIVE = 4
_live: OrderedDict[str, DataFrame] = OrderedDict()


def persist_bounded(df: DataFrame, key: str) -> DataFrame:
    """persist() + register under ``key``; evicts (unpersists) the oldest
    tracked frame beyond the cap. Returns ``df`` for chaining.

    ``key`` must identify the LOGICAL PLAN (operator name + inputs, e.g.
    ``f"jaccard_shingles:{sf_dir}"``): Spark's CacheManager dedups cached
    data by plan, and ``unpersist()`` uncaches BY PLAN — so evicting an
    old same-plan frame would silently kill the cache entry a newer frame
    relies on. Re-registering a key therefore just replaces the registry
    entry (same plan ⇒ same shared cache entry; the fresh ``persist()`` is
    an idempotent no-op) and only *different*-key evictions unpersist."""
    df.persist()
    _live.pop(key, None)  # same plan: replace, never unpersist
    _live[key] = df
    while len(_live) > _MAX_LIVE:
        _, old = _live.popitem(last=False)
        try:
            old.unpersist(blocking=True)
        except Exception:  # session already stopped — nothing to release
            pass
    return df


def release(key: str) -> bool:
    """Unpersist and deregister ONE tracked frame by key. For callers whose
    input data changed in place (e.g. a regenerated fixture detected by an
    mtime-keyed index rebuild): the Spark cache is keyed by LOGICAL PLAN,
    which doesn't change when the file content does, so re-persisting the
    same plan silently serves stale rows — the old entry must be dropped
    first. Returns whether the key was live."""
    old = _live.pop(key, None)
    if old is None:
        return False
    try:
        old.unpersist(blocking=True)
    except Exception:
        pass
    return True


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _live:
        _, old = _live.popitem(last=False)
        try:
            old.unpersist(blocking=True)
        except Exception:
            pass
        n += 1
    return n
