"""Scoped lifecycle for operator-internal caches.

Several operators cache an intermediate that feeds multiple plan branches
(minhash signatures, simhash signatures, shingles, LSH signatures). The
operator returns a LAZY DataFrame, so it cannot unpersist in a
try/finally — the cache must survive until the caller's action. Before
round 3 those handles were simply dropped: a long-lived session running
many operators accumulated executor storage until someone called
``spark.catalog.clearCache()`` (which also evicts caches the USER created
— too blunt for a shared session).

Operators now register their internal caches here; callers release exactly
those after the consuming action::

    pairs = lsh_candidate_pairs(docs)
    rows = pairs.collect()          # action — cache did its job
    caching.release_all()           # drop ONLY operator-internal caches

``release_all`` is idempotent and never touches user-created caches — but
it IS thread-global: it drops the internal caches of EVERY not-yet-
consumed operator this thread registered, so it fits the sequential
build-consume-release pattern (bench.py, the driver) only. When several
operators are constructed before any is consumed, scope each one
instead::

    with caching.scope():           # releases only caches registered inside
        pairs = lsh_candidate_pairs(docs)
        rows = pairs.collect()
    other.count()                   # its cache was registered outside: alive
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Per-thread registry: a multithreaded driver (concurrent job submission
# is a normal Spark pattern) must not let one thread's scope() exit or
# release_all() unpersist a cache another thread registered between its
# mark and its release — register/consume/release is a per-thread
# protocol, so the list is thread-local. Corollary: release must happen
# on the thread that ran the operator (true of every current caller).
#
# Escape hatch for the protocol's failure mode: a worker thread that
# errors out (or is killed) before releasing takes its thread-local list
# with it, and before round 3 those handles became permanently
# unreleasable-and-invisible. Every register() therefore ALSO records
# (owner-thread, handle) in a process-wide list; ``release_orphans``
# sweeps handles whose owner thread is no longer alive, and
# ``live_count(all_threads=True)`` makes the leak observable without
# reintroducing the cross-thread release race (live threads' caches are
# never touched).
_TLS = threading.local()
_LOCK = threading.Lock()
_ALL: list[tuple[threading.Thread, DataFrame]] = []


def _live() -> list[DataFrame]:
    lst = getattr(_TLS, "live", None)
    if lst is None:
        lst = _TLS.live = []
    return lst


def register(df: DataFrame) -> DataFrame:
    """Cache ``df`` and track the handle for later ``release_all``."""
    df.cache()
    _live().append(df)
    with _LOCK:
        _ALL.append((threading.current_thread(), df))
    return df


def live_count(all_threads: bool = False) -> int:
    if all_threads:
        with _LOCK:
            return len(_ALL)
    return len(_live())


def release_orphans() -> int:
    """Unpersist every cache whose registering thread has exited without
    releasing it (errored worker, killed thread). Never touches a live
    thread's caches — those still follow the per-thread protocol.
    Returns how many were released."""
    with _LOCK:
        dead = [(t, df) for (t, df) in _ALL if not t.is_alive()]
        for entry in dead:
            _ALL.remove(entry)
    n = 0
    for _, df in dead:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session gone: nothing to evict, just drop the handle
    return n


def release_all() -> int:
    """Unpersist every operator-internal cache THIS THREAD registered
    since its last release (see module docstring for the interleaved-
    operators caveat and ``scope``). Returns how many were released. Safe
    to call with a stopped session (handles are dropped regardless)."""
    return _release_from(0)


@contextmanager
def scope():
    """Release, on exit, only the operator caches registered INSIDE this
    block on this thread — construction-time scoping, so operators built
    outside the block (or on other threads) keep their caches. Nested
    scopes release their own suffix."""
    mark = len(_live())
    try:
        yield
    finally:
        _release_from(mark)


def _release_from(mark: int) -> int:
    live = _live()
    n = 0
    while len(live) > mark:
        df = live.pop()
        with _LOCK:
            for i, (_, h) in enumerate(_ALL):
                if h is df:
                    del _ALL[i]
                    break
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session gone: nothing to evict, just drop the handle
    return n
