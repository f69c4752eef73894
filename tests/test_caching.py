"""Operator-internal cache lifecycle: every operator that caches an
intermediate registers it with sparkocr.pipeline.caching, and
release_all() after the consuming action leaves the session's cache
manager empty — without evicting caches the user created."""

import pytest

from sparkocr.pipeline import caching


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"some document text payload number {i} with shared words") for i in range(30)],
        "doc_id long, text string",
    )


@pytest.fixture()
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_each_caching_operator_releases_clean(spark, docs, emb):
    from sparkocr.pipeline.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        simhash_near_dups,
    )
    from sparkocr.pipeline.similarity import embedding_near_dups

    cm = _cache_manager(spark)
    caching.release_all()  # start clean regardless of other tests
    spark.catalog.clearCache()
    assert cm.isEmpty()

    ops = [
        lambda: jaccard_pairs(docs, threshold=0.0),
        lambda: lsh_candidate_pairs(docs, n_perm=4, band_rows=2),
        lambda: simhash_near_dups(docs),
        lambda: embedding_near_dups(emb, threshold=0.0),
    ]
    for op in ops:
        op().count()  # consuming action — the internal cache was used
        assert not cm.isEmpty()  # it IS cached until released
        assert caching.release_all() >= 1
        assert cm.isEmpty()  # and fully evicted after


def test_release_all_spares_user_caches(spark, docs):
    from pyspark.sql import functions as F

    from sparkocr.pipeline.dedup import lsh_candidate_pairs

    cm = _cache_manager(spark)
    caching.release_all()
    spark.catalog.clearCache()

    mine = docs.select("doc_id", F.length("text").alias("n")).cache()
    try:
        mine.count()
        lsh_candidate_pairs(docs, n_perm=4, band_rows=2).count()
        caching.release_all()
        # the operator's cache is gone but the user's survives
        assert not cm.isEmpty()
        assert cm.lookupCachedData(mine._jdf).isDefined()
    finally:
        mine.unpersist()
    assert cm.isEmpty()


def test_release_all_idempotent(spark):
    caching.release_all()
    assert caching.release_all() == 0
    assert caching.live_count() == 0


def test_scope_releases_only_inner_caches(spark, docs):
    """Interleaved operators: a scope must release only caches registered
    inside it, leaving an operator constructed outside with its cache
    intact for its later action (code-review finding: release_all is
    process-global)."""
    from sparkocr.pipeline.dedup import lsh_candidate_pairs, simhash_near_dups

    cm = _cache_manager(spark)
    caching.release_all()
    spark.catalog.clearCache()

    outer = simhash_near_dups(docs)  # registers its signature cache NOW
    n_before = caching.live_count()
    with caching.scope():
        inner = lsh_candidate_pairs(docs, n_perm=4, band_rows=2)
        inner.count()
    # the scope released lsh's caches, but simhash's survives for its action
    assert caching.live_count() == n_before
    outer.count()
    assert not cm.isEmpty()
    caching.release_all()
    assert cm.isEmpty()


def test_registry_is_thread_local(spark, docs):
    """Concurrent driver threads (a normal Spark pattern) must not release
    each other's caches: thread B registers between thread A's scope mark
    and exit, and A's exit must leave B's cache alive (code-review finding:
    the registry was one process-global list)."""
    import threading

    from sparkocr.pipeline.dedup import simhash_near_dups

    cm = _cache_manager(spark)
    caching.release_all()
    spark.catalog.clearCache()

    registered = threading.Event()
    proceed = threading.Event()
    state = {}

    def worker():
        # registers simhash's signature cache on THIS thread, then waits
        # while the main thread's scope exits
        df = simhash_near_dups(docs)
        state["live"] = caching.live_count()
        registered.set()
        proceed.wait(timeout=30)
        df.count()  # cache must still be alive here
        state["released"] = caching.release_all()

    t = threading.Thread(target=worker)
    with caching.scope():
        t.start()
        assert registered.wait(timeout=30)
        # worker's caches are invisible to this thread's registry
        assert caching.live_count() == 0
    proceed.set()
    t.join(timeout=60)
    assert state["live"] > 0  # worker saw its own registrations
    assert state["released"] == state["live"]  # and released them itself
    assert cm.isEmpty()


@pytest.mark.filterwarnings(
    # the crashing worker's RuntimeError is THE fixture under test (a
    # thread dying before its release), not an accident to warn about
    "ignore::pytest.PytestUnhandledThreadExceptionWarning"
)
def test_release_orphans_sweeps_dead_threads(spark, docs):
    """A worker thread that errors (or exits) before releasing must not
    leak its caches forever: the thread-local list dies with the thread,
    but the process-wide registry keeps the handle observable
    (live_count(all_threads=True)) and release_orphans() sweeps it —
    while a LIVE thread's caches are never touched (no cross-thread
    release race)."""
    import threading

    from sparkocr.pipeline.dedup import simhash_near_dups

    cm = _cache_manager(spark)
    caching.release_all()
    caching.release_orphans()
    spark.catalog.clearCache()

    def crashing_worker():
        simhash_near_dups(docs).count()  # registers, consumes...
        raise RuntimeError("dies before caching.release_all()")

    t = threading.Thread(target=crashing_worker)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive()
    # the dead thread's cache is leaked but OBSERVABLE...
    leaked = caching.live_count(all_threads=True)
    assert leaked > 0
    assert caching.live_count() == 0  # ...and not on this thread's list
    assert not cm.isEmpty()

    # a live thread's cache must survive the sweep
    registered = threading.Event()
    proceed = threading.Event()
    state = {}

    def live_worker():
        df = simhash_near_dups(docs)
        registered.set()
        proceed.wait(timeout=60)
        df.count()  # still cached: release_orphans must not have touched it
        state["released"] = caching.release_all()

    lt = threading.Thread(target=live_worker)
    lt.start()
    assert registered.wait(timeout=60)

    swept = caching.release_orphans()
    assert swept == leaked  # exactly the dead thread's handles
    assert caching.release_orphans() == 0  # idempotent

    proceed.set()
    lt.join(timeout=120)
    assert state["released"] > 0
    assert caching.live_count(all_threads=True) == 0
    assert cm.isEmpty()


def test_cap_metrics_with_disabled_cap_rejected(spark, docs):
    from pyspark.sql import Observation

    from sparkocr.pipeline.dedup import (
        cap_metrics_get,
        jaccard_pairs,
        lsh_candidate_pairs,
        simhash_near_dups,
    )

    with pytest.raises(ValueError, match="cap is disabled"):
        jaccard_pairs(docs, df_max=None, cap_metrics=Observation())
    with pytest.raises(ValueError, match="cap is disabled"):
        lsh_candidate_pairs(docs, n_perm=4, band_rows=2,
                            bucket_max=None, cap_metrics=Observation())
    with pytest.raises(ValueError, match="cap is disabled"):
        simhash_near_dups(docs, bucket_max=None, cap_metrics=Observation())
    # reading a never-attached Observation: clear error, not AttributeError
    with pytest.raises(ValueError, match="never attached"):
        cap_metrics_get(Observation())
