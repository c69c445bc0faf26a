"""Scoped caching for intermediate frames that are consumed both inside
an operator (e.g. domain discovery) and by the caller's later action.

``cache_scoped(df, key)`` caches ``df`` under a slot identified by
(session, operator-family ``key``, semantic plan fingerprint). Repeat
runs of the SAME plan (bench min-of-2, repeated driver checks) reuse the
warm cache; DIFFERENT plans of the same family (two dedup corpora
interleaved in one session) each keep their own cache up to a small
per-family LRU capacity, instead of thrashing a single slot. Evicted or
superseded frames are unpersisted — always correctness-safe in Spark: a
still-referenced DataFrame silently recomputes from lineage if its cache
is dropped. Entries whose SparkSession has been stopped are purged on
the next call, so no JVM-side state is pinned across test sessions.

Threading contract: the pool assumes a SINGLE-THREADED driver (the
sequential driver/bench loop). Concurrent cache_scoped calls from
multiple Python threads could unpersist a frame another thread just
pooled — harmless for correctness (lineage recompute) but a perf cliff;
add locking before sharing a session across threads.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

# max cached plans per (session, family) slot — bounds memory while
# letting a few interleaved pipelines of one family stay warm
FAMILY_CAPACITY = 4

_POOL: dict[tuple[str, str], OrderedDict[object, DataFrame]] = {}


def _session_key(session: SparkSession) -> str:
    try:
        return str(session._jsparkSession.sessionUUID())
    except Exception:
        return str(id(session))


def _session_stopped(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc is None
    except Exception:
        return True


def _fingerprint(df: DataFrame) -> object:
    """Semantic hash of the analyzed plan: equal for plans that
    ``sameResult`` each other, cheap to compute, no plan-tree walk from
    Python."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return id(df)


def _still_cached(df: DataFrame) -> bool:
    """A pooled frame can lose its JVM cache registration out-of-band
    (spark.catalog.clearCache(), an external unpersist of an equivalent
    plan). Serving such a hit is correctness-safe but silently recomputes
    on EVERY use — detect and re-cache instead."""
    try:
        sl = df.storageLevel
        return bool(sl.useMemory or sl.useDisk or sl.useOffHeap)
    except Exception:
        return False


def _unpersist(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session of the frame may already be stopped


def _purge_stopped() -> None:
    dead = [
        slot_key
        for slot_key, plans in _POOL.items()
        if any(_session_stopped(df) for df in plans.values())
    ]
    for slot_key in dead:
        _POOL.pop(slot_key, None)


def cache_scoped(df: DataFrame, key: str) -> DataFrame:
    _purge_stopped()
    slot_key = (_session_key(df.sparkSession), key)
    plans = _POOL.setdefault(slot_key, OrderedDict())
    fp = _fingerprint(df)
    hit = plans.get(fp)
    if hit is not None:
        if _still_cached(hit):
            plans.move_to_end(fp)
            return hit
        plans.pop(fp, None)  # stale (cache cleared externally): re-cache
    while len(plans) >= FAMILY_CAPACITY:
        _, evicted = plans.popitem(last=False)
        _unpersist(evicted)
    df = df.cache()
    plans[fp] = df
    return df


def release(key: str) -> None:
    """Drop every pooled plan of ONE family (across sessions) — the
    targeted alternative to ``spark.catalog.clearCache()`` for callers
    (e.g. plan-shape tests) that must see an uncached plan without
    wiping every other family's warm pool session-wide."""
    for slot_key in [sk for sk in _POOL if sk[1] == key]:
        for df in _POOL[slot_key].values():
            _unpersist(df)
        _POOL.pop(slot_key, None)


def release_all() -> None:
    """Drop every pooled cache (e.g. at the end of a bench run)."""
    for plans in _POOL.values():
        for df in plans.values():
            _unpersist(df)
    _POOL.clear()
