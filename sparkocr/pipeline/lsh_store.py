"""Incremental MinHash-LSH dedup over a persisted signature store.

``dedup.lsh_candidate_pairs`` re-mines the WHOLE corpus per run: shingle
explode over every document's text, a 12-way min aggregation, and a
banded self-join. Correct, but at 10^12 documents a daily increment of
0.1% new rows cannot pay a full re-mine. This module persists the two
small derived tables once and lets an increment query join against them
with no corpus-sized shuffle:

  {store}_sigs    (doc_id, mh_0..mh_{n_perm-1}, append_id)  bucketed by doc_id
  {store}_bands   (doc_id, bkey, append_id)                 bucketed by bkey
  {store}_commits one row per committed append: (append_id, attempt,
                  rows) — the base build commits as append_id='base';
                  ``attempt`` is the per-invocation token stamped onto
                  that append's rows
  {store}_meta    single row: n_perm, band_rows, k, n_buckets
                  (written LAST — a missing meta marks a half-built
                  store, mirroring ann_index's completeness discipline)

Appends follow ann_index.append_to_index's exactly-once discipline:
every appended row is stamped with its ``append_id``, the commit row
lands LAST, and readers see only rows whose append_id is committed — a
death between the sigs and bands appends (or mid-append) leaves
invisible orphan rows, never a half-visible increment, and a blind
retry of a committed id is a no-op instead of a silent duplication.
``check_lsh_store`` still audits the committed view and additionally
counts orphan rows so crashed attempts stay observable until a rebuild
purges them.

Both tables are Spark native bucketed tables (``storage.py`` pattern —
the Parquet stand-in for Iceberg ``bucket(...)``): hash-partitioned on
their join keys at write time, so the increment-side joins below read
them with NO Exchange on the store side. Per-increment cost is one
columnar scan of each store table (two thin string columns, not the
corpus text) plus shuffles of increment-sized data only — versus the
full re-mine's shingle explode over the corpus text (~100x the bytes)
and two corpus-sized shuffles.

``incremental_lsh_pairs(new_docs, ...)`` emits every candidate pair
touching at least one new document (new-new and new-old), with the same
``est_jaccard`` definition as ``lsh_candidate_pairs`` — the two agree
exactly on shared pairs (differential-tested). Run it BEFORE or AFTER
appending the increment: store rows whose doc_id appears in ``new_docs``
are excluded from the "old" side either way.

Signatures use ``dedup.minhash_signatures`` (this module calls it) with
the build's ``hash_kind`` — ``"md5"`` (engine-portable default) or
``"rolling"`` (the Arrow fast path, ``minhash_fast``) — recorded in
meta and replayed by every recompute path; the meta row also records
the signature algorithm version (``sig_v`` = ``dedup.MH_SIG_V``), and
the recompute paths (append, incremental pairs) refuse a store whose
stored version differs from the running engine's — mixed-algorithm
signatures would silently never collide, eating every cross-increment
candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from sparkocr.pipeline import caching
from sparkocr.pipeline.dedup import (
    BAND_ROWS,
    MH_MAX_CHARS,
    MH_SIG_V,
    N_PERM,
    SHINGLE,
    _require_cap,
    cap_hot_buckets,
    check_band_divisibility,
    est_jaccard_col,
    min_band_matches,
    minhash_signatures,
)


def _meta_max_chars(m: dict) -> int | None:
    """The stored signatured-prefix cap: 0 encodes None (uncapped) in the
    all-int meta row. Increments MUST replay the build's cap — a mixed-cap
    store would give long docs different signatures per append."""
    return m.get("max_chars", 0) or None


def _meta_hash_kind(m: dict) -> str:
    """The stored shingle→integer construction, int-encoded in the
    all-int meta row (0 = "md5", 1 = "rolling"; stores from before the
    column default to md5, which is what they were built with).
    Increments MUST replay the build's kind — the two constructions'
    signatures never collide, so a mixed store would silently drop every
    cross-append candidate pair."""
    return "rolling" if m.get("hash_kind", 0) == 1 else "md5"


_HASH_KIND_CODE = {"md5": 0, "rolling": 1}


def _require_sig_v(m: dict, store: str) -> None:
    """Refuse to recompute signatures against a store built with a
    different signature algorithm (meta ``sig_v`` vs the running
    engine's ``dedup.MH_SIG_V``): mixed-algorithm signatures never
    collide, so the join would silently drop every cross-increment
    candidate pair instead of failing. Stores from before the version
    column default to 1."""
    stored = m.get("sig_v", 1)
    if stored != MH_SIG_V:
        raise ValueError(
            f"LSH store {store!r} was built with signature algorithm "
            f"v{stored}, but this engine computes v{MH_SIG_V} — rebuild "
            "with build_lsh_store before appending or mining increments"
        )


def _sigs_table(store: str) -> str:
    return f"{store}_sigs"


def _bands_table(store: str) -> str:
    return f"{store}_bands"


def _meta_table(store: str) -> str:
    return f"{store}_meta"


def _commits_table(store: str) -> str:
    return f"{store}_commits"


def _committed_ids(spark: SparkSession, store: str) -> list[str] | None:
    """Committed ATTEMPT tokens (the values stamped onto rows), or None
    for a legacy store (built before the commit discipline: no commits
    table, rows unstamped) — readers then take every row, exactly as the
    old code did. Rows are stamped per-ATTEMPT rather than per-append_id
    so a retry of a crashed append cannot accidentally commit the dead
    attempt's rows along with its own.

    Only a MISSING commits table means "legacy": the existence check is
    explicit, so a transient read failure (metastore hiccup, permission,
    concurrent DDL) propagates instead of being misdiagnosed as a
    half-migrated store — the old blanket ``except`` turned a retryable
    error into a 'rebuild the store' instruction (and made
    ``_orphan_rows`` count every committed row as an orphan)."""
    if not spark.catalog.tableExists(_commits_table(store)):
        return None
    return [r.attempt for r in spark.table(_commits_table(store)).collect()]


def _committed_rows(spark: SparkSession, store: str, table: str) -> DataFrame:
    """The COMMITTED view of a store table: rows whose append_id has a
    commit row, with the stamp column dropped so downstream plans are
    unchanged. The isin filter sits on the scan (no Exchange added;
    bucketing survives a Filter), and the committed-id list is one tiny
    driver-side read — bounded by the number of appends ever run."""
    df = spark.table(table)
    if "append_id" not in df.columns:
        return df  # legacy store: everything visible
    ids = _committed_ids(spark, store)
    if ids is None:
        # stamped rows but no commits table: half-migrated store —
        # refuse, a guess either way silently changes the pair set
        raise ValueError(
            f"LSH store {store!r} has stamped rows but no commits table — "
            "rebuild with build_lsh_store"
        )
    return df.filter(F.col("append_id").isin(ids)).drop("append_id")


def _band_keys(sig: DataFrame, n_perm: int, band_rows: int) -> DataFrame:
    """(doc_id, bkey) rows, one per band: bkey = "<band_id>:<md5 of the
    band's minhash values>" — the single-column form of
    ``lsh_candidate_pairs``' (band_id, bh) join key, so one bucketed
    column carries the whole equi-join."""
    n_bands = n_perm // band_rows
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh_{b * band_rows + r}")
                                    for r in range(band_rows)
                                ],
                            )
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bkey"),
    )


def read_store_meta(spark: SparkSession, store: str) -> dict:
    """Store parameters, or a loud error for a half-built store (meta is
    written last, so a missing — or registered-but-EMPTY — meta table
    means a build died mid-way)."""
    try:
        row = spark.table(_meta_table(store)).first()
    except Exception as e:
        row = None
        err = e
    else:
        err = None
    if row is None:
        raise ValueError(
            f"no complete LSH store named {store!r}: its meta table is "
            "missing, unreadable, or empty — the build failed mid-way or "
            "the name is wrong; rebuild with build_lsh_store"
        ) from err
    return {k: int(v) for k, v in row.asDict().items()}


def build_lsh_store(
    docs: DataFrame,
    store: str,
    n_perm: int = N_PERM,
    band_rows: int = BAND_ROWS,
    k: int = SHINGLE,
    n_buckets: int = 64,
    max_chars: int | None = MH_MAX_CHARS,
    hash_kind: str = "md5",
    sigs: DataFrame | None = None,
) -> None:
    """Build (or rebuild) the store from scratch. The expensive part —
    shingle explode + min aggregation — runs ONCE: signatures are
    materialized to the sigs table first and the bands table derives
    from reading that table back (a 100x-smaller input than the text).

    Meta is dropped first and written last: a build that dies in between
    leaves a store every reader refuses, never a probeable half-store.
    Base rows commit as append_id='base' (a rebuild also resets the
    commits table, so markers from the previous store's appends never
    resurrect orphan rows).

    ``sigs``: optionally the docs' precomputed ``minhash_signatures``
    frame — a full corpus build that ALSO mines near-dup pairs over the
    same docs (``corpus_job.build_corpus(store=...)``) passes one shared
    frame so the corpus-sized signature pass runs once. MUST have been
    computed with exactly this call's (n_perm, k, max_chars, hash_kind):
    the store records those in meta and every future increment replays
    them — mismatched signatures would poison every later band join."""
    check_band_divisibility(n_perm, band_rows)
    if hash_kind not in _HASH_KIND_CODE:
        raise ValueError(f"unknown minhash hash_kind {hash_kind!r}")
    spark = docs.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {_meta_table(store)}")
    (
        (
            sigs
            if sigs is not None
            else minhash_signatures(docs, n_perm, k, max_chars, hash_kind)
        )
        .withColumn("append_id", F.lit("base"))
        .repartition(n_buckets, "doc_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(_sigs_table(store))
    )
    (
        _band_keys(
            spark.table(_sigs_table(store)).drop("append_id"),
            n_perm,
            band_rows,
        )
        .withColumn("append_id", F.lit("base"))
        .repartition(n_buckets, "bkey")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "bkey")
        .sortBy("bkey")
        .format("parquet")
        .saveAsTable(_bands_table(store))
    )
    n_base = spark.table(_sigs_table(store)).count()
    spark.createDataFrame(
        [("base", "base", n_base)], ["append_id", "attempt", "rows"]
    ).coalesce(1).write.mode("overwrite").saveAsTable(_commits_table(store))
    spark.createDataFrame(
        # meta is an all-int row (read_store_meta int-casts every field):
        # max_chars=None (uncapped) encodes as 0, hash_kind as its code
        [(n_perm, band_rows, k, n_buckets, MH_SIG_V, max_chars or 0,
          _HASH_KIND_CODE[hash_kind])],
        ["n_perm", "band_rows", "k", "n_buckets", "sig_v", "max_chars",
         "hash_kind"],
    ).coalesce(1).write.mode("overwrite").saveAsTable(_meta_table(store))


def store_signatures(docs: DataFrame, store: str) -> DataFrame:
    """The docs' minhash signatures computed with the STORE's parameters
    (never re-derived) — exactly the frame ``append_lsh_store`` and
    ``incremental_lsh_pairs`` each build internally. Compute it ONCE
    (and cache it) when calling both for the same increment and pass it
    via their ``sigs=`` parameter: the signature pass is the increment's
    dominant compute at corpus scale, and the default paths pay it
    twice."""
    spark = docs.sparkSession
    m = read_store_meta(spark, store)
    _require_sig_v(m, store)
    return minhash_signatures(
        docs, m["n_perm"], m["k"], _meta_max_chars(m), _meta_hash_kind(m)
    )


def append_lsh_store(
    new_docs: DataFrame,
    store: str,
    append_id: str,
    sigs: DataFrame | None = None,
    skip_existing: bool = True,
) -> dict:
    """Append an increment's signatures and band keys to the store, with
    the STORED parameters (never re-derived). Exactly-once per
    ``append_id`` (ann_index.append_to_index's discipline): appended rows
    are stamped with the id, the commit row lands LAST, and readers see
    only committed ids — so a death between the two appends (or
    mid-append) leaves invisible orphan rows rather than docs with
    signatures but no bands, a retry of the crashed id appends fresh
    rows and commits them (the orphans stay invisible; ``check_lsh_store``
    counts them, a rebuild purges them), and a blind retry of a
    COMMITTED id is a skipped no-op instead of a silent duplication.

    Rows are stamped with a per-ATTEMPT token (``append_id-<nonce>``),
    not the bare append_id, and the commit row records which attempt
    completed — otherwise a retry's commit would resurrect the crashed
    attempt's orphan rows (same stamp) and every increment doc would
    surface twice.

    ``sigs``: optionally the increment's ``store_signatures`` output,
    computed once by a caller that also runs ``incremental_lsh_pairs``
    (the caller owns its caching). Must be built against THIS store —
    signatures under different parameters would poison the band join.

    ``skip_existing`` (default True): docs whose doc_id already has a
    COMMITTED sig row are excluded from the append. The per-append_id
    discipline alone cannot stop a re-delivery under a DIFFERENT id —
    e.g. a crashed increment whose retry recomposes into new batch
    fingerprints — from committing the same docs twice, permanently
    duplicating store rows (``check_lsh_store``'s dup_sig diagnosis).
    The guard is one anti-join, Exchange-free on the store side (sigs
    table bucketed by doc_id). Caveat: if a re-delivered doc_id carries
    CHANGED text, the stored signatures stay as first committed —
    rebuild to refresh. Pass False only when the caller has its own
    doc-id-level dedup guarantee.

    Returns ``{"append_id", "rows", "skipped", "n_existing"}`` —
    ``rows`` counts what was actually appended, ``n_existing`` what the
    guard excluded."""
    import uuid

    from sparkocr.pipeline.ann_index import _APPEND_ID_RE

    if not _APPEND_ID_RE.match(append_id or "") or append_id == "base":
        raise ValueError(
            f"append_id {append_id!r} must match {_APPEND_ID_RE.pattern} "
            "and not be the reserved 'base'"
        )
    spark = new_docs.sparkSession
    m = read_store_meta(spark, store)
    _require_sig_v(m, store)
    if "append_id" not in spark.table(_sigs_table(store)).columns:
        raise ValueError(
            f"LSH store {store!r} predates the append-commit discipline "
            "(rows are unstamped) — rebuild with build_lsh_store before "
            "appending"
        )
    if not spark.catalog.tableExists(_commits_table(store)):
        # same half-migrated state every reader path refuses: stamped
        # rows (checked above) but the commits table is gone — a raw
        # TABLE_OR_VIEW_NOT_FOUND here would name neither the store nor
        # the remedy
        raise ValueError(
            f"LSH store {store!r} has stamped rows but no commits table "
            "— rebuild with build_lsh_store before appending"
        )
    for r in spark.table(_commits_table(store)).collect():
        if r.append_id == append_id:
            return {"append_id": append_id, "rows": int(r.rows), "skipped": True}
    attempt = f"{append_id}-{uuid.uuid4().hex[:12]}"
    # every consuming action happens inside this function, so the
    # signature cache is scoped here instead of leaking to the caller's
    # release (a daily driver looping appends would otherwise accumulate
    # one materialized cache per day)
    with caching.scope():
        sig = (
            sigs
            if sigs is not None
            else caching.register(
                minhash_signatures(
                    new_docs, m["n_perm"], m["k"], _meta_max_chars(m),
                    _meta_hash_kind(m),
                )
            )
        )
        n_existing = 0
        if skip_existing:
            existing = _committed_rows(
                spark, store, _sigs_table(store)
            ).select("doc_id")
            n_before = sig.count()
            sig = caching.register(sig.join(existing, "doc_id", "left_anti"))
            n_existing = n_before - sig.count()
        (
            sig.withColumn("append_id", F.lit(attempt))
            .repartition(m["n_buckets"], "doc_id")
            .write.mode("append")
            .bucketBy(m["n_buckets"], "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(_sigs_table(store))
        )
        (
            _band_keys(sig, m["n_perm"], m["band_rows"])
            .withColumn("append_id", F.lit(attempt))
            .repartition(m["n_buckets"], "bkey")
            .write.mode("append")
            .bucketBy(m["n_buckets"], "bkey")
            .sortBy("bkey")
            .format("parquet")
            .saveAsTable(_bands_table(store))
        )
        rows = sig.count()
    # the COMMIT: one tiny row, written only after both appends landed
    spark.createDataFrame(
        [(append_id, attempt, rows)], ["append_id", "attempt", "rows"]
    ).coalesce(1).write.mode("append").saveAsTable(_commits_table(store))
    return {
        "append_id": append_id, "rows": rows, "skipped": False,
        "n_existing": n_existing,
    }


def check_lsh_store(spark: SparkSession, store: str) -> dict:
    """Consistency audit of the COMMITTED view (one aggregate pass per
    table): every doc must have exactly one sigs row and exactly n_bands
    band rows. Returns ``{"docs", "dup_sig_docs", "missing_sig_docs",
    "band_mismatch_docs", "orphan_rows"}``; all but ``docs`` are 0 for a
    healthy store. Diagnosis:

    - ``dup_sig_docs`` (n_sig > 1): the same doc committed in two
      appends (a caller re-sent a doc under a NEW append_id — the
      commit discipline can only dedupe retries of the SAME id);
    - ``missing_sig_docs`` (n_sig == 0 but band rows exist): committed
      bands without a signature — cannot arise from a crash under the
      commit discipline (both appends commit together), so it points at
      manual table surgery;
    - ``band_mismatch_docs`` (n_band != n_sig·n_bands): ditto;
    - ``orphan_rows``: UNcommitted rows across both tables — debris of
      crashed append attempts. Invisible to every reader; a rebuild
      purges them. Nonzero orphans with a clean committed view is the
      expected aftermath of a crash + successful retry."""
    m = read_store_meta(spark, store)
    n_bands = m["n_perm"] // m["band_rows"]
    sigs = _committed_rows(spark, store, _sigs_table(store))
    bands = _committed_rows(spark, store, _bands_table(store))
    sig_counts = sigs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sig"))
    band_counts = bands.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_band"))
    joined = sig_counts.join(band_counts, "doc_id", "full_outer").select(
        F.coalesce("n_sig", F.lit(0)).alias("n_sig"),
        F.coalesce("n_band", F.lit(0)).alias("n_band"),
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("n_sig") > 1, 1).otherwise(0)).alias("dup_sig_docs"),
        F.sum(F.when(F.col("n_sig") == 0, 1).otherwise(0)).alias(
            "missing_sig_docs"
        ),
        F.sum(
            F.when(F.col("n_band") != F.col("n_sig") * n_bands, 1).otherwise(0)
        ).alias("band_mismatch_docs"),
    ).first()
    out = {k: int(v) for k, v in row.asDict().items()}
    out["orphan_rows"] = _orphan_rows(spark, store)
    return out


def _orphan_rows(spark: SparkSession, store: str) -> int:
    """Total UNcommitted rows across both store tables (0 for a legacy
    unstamped store, where the concept does not exist). A store with
    only ONE stamped table (manual surgery / half migration) still has
    its stamped side audited — the old mid-loop early return threw away
    the sigs count whenever just the bands table was unstamped. The
    committed-id list is collected once for both tables."""
    dfs = [spark.table(t) for t in (_sigs_table(store), _bands_table(store))]
    stamped = [df for df in dfs if "append_id" in df.columns]
    if not stamped:
        return 0
    ids = _committed_ids(spark, store) or []
    return sum(
        df.filter(~F.col("append_id").isin(ids)).count() for df in stamped
    )


def incremental_lsh_pairs(
    new_docs: DataFrame,
    store: str,
    bucket_max: int | None = 10_000,
    cap_metrics: Observation | None = None,
    min_est: float | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs touching at least one NEW document:
    new-new (self-join of the increment's band keys — increment-sized)
    and new-old (increment band keys joined against the store's bands
    table — Exchange-free on the store side, the bands table is bucketed
    by bkey). Output ``(id1, id2, est_jaccard)`` with id1 < id2, the
    same estimate definition as ``lsh_candidate_pairs``
    (``dedup.est_jaccard_col`` — one shared construction).

    Store rows whose doc_id appears in the increment are excluded from
    the old side (broadcast anti-join on the increment's ids), so the
    operator is correct whether it runs before or after
    ``append_lsh_store`` for the same increment.

    ``bucket_max`` caps a band bucket's COMBINED membership (store + the
    increment itself) before either join, and the capped bucket is
    dropped from BOTH sides — the same total-membership semantics as
    ``lsh_candidate_pairs`` over old∪new, so the two operators agree
    under equal caps, and a boilerplate cluster arriving INSIDE one
    increment (a crawler re-fetching a template 10^5 times in a day)
    cannot make the new-new self-join quadratic either. The store-side
    counts aggregate is Exchange-free on the bucketed table; the
    combined totals are increment-sized (every relevant bucket is one
    the increment touches). Capped drops are observable via
    ``cap_metrics`` (``dedup.cap_metrics_get``).

    Scale shape: per increment, two columnar scans of the bands table
    (the counts aggregate and the join probe — two plan branches, both
    Exchange-free) and one of the sigs table; every shuffle moves
    increment-sized or pair-sized data. The increment is assumed
    broadcastable (its id set and band keys ride broadcast hints —
    roughly ≤10^8 docs); for a corpus-scale backfill, chunk the
    increment into broadcastable slices or rebuild the store.

    ``min_est``: the same thresholded-prune contract as
    ``lsh_candidate_pairs(min_est=...)`` — only pairs with
    ``est_jaccard >= min_est`` return, and the band-match pigeonhole
    prune runs inside the pair-dedup aggregates so a near-dup FAMILY's
    single-band collisions never reach the signature verify. Capped
    buckets hide collisions here too; the bound adds the NEW doc's
    capped-bucket count (a hidden match always needs the new side's
    dropped row — for new-new pairs the min of the two new docs').
    Computing the capped-bucket set reuses the combined-totals branch
    (one more thin Exchange-free store-counts scan, only when
    ``min_est`` AND ``bucket_max`` are both set).

    ``sigs``: optionally the increment's ``store_signatures`` output —
    compute once, cache, and share with ``append_lsh_store`` (the
    caller owns its caching; it must be built against THIS store).

    Differential-tested
    ≡ the full operator's min_est output restricted to new-touching
    pairs."""
    spark = new_docs.sparkSession
    m = read_store_meta(spark, store)
    _require_sig_v(m, store)
    _require_cap(bucket_max, cap_metrics)
    n_perm = m["n_perm"]
    # signature columns ride along with the band keys (the increment is
    # small): new-new pairs then carry BOTH signatures out of the join,
    # and new-old pairs need only one store-sigs join for the old side.
    # A caller that also appends this increment passes sigs= (its own
    # cached store_signatures frame) so the signature pass runs once.
    sig_new = (
        sigs
        if sigs is not None
        else caching.register(
            minhash_signatures(
                new_docs, n_perm, m["k"], _meta_max_chars(m),
                _meta_hash_kind(m),
            )
        )
    )
    bands_new = _band_keys(sig_new, n_perm, m["band_rows"]).join(sig_new, "doc_id")

    new_ids = sig_new.select("doc_id")
    store_bands = _committed_rows(spark, store, _bands_table(store)).join(
        F.broadcast(new_ids), "doc_id", "left_anti"
    )
    carry_capped = min_est is not None and bucket_max is not None
    if bucket_max is not None:
        # combined bucket heat: store members (Exchange-free agg over the
        # bucketed table) + increment members, summed per touched bucket.
        # Only buckets the increment touches can produce pairs, so the
        # totals frame is increment-sized and rides broadcast semi-joins
        # onto both inputs.
        counts_new = bands_new.groupBy("bkey").agg(
            F.count(F.lit(1)).alias("bn_new")
        )
        counts_store = store_bands.groupBy("bkey").agg(
            F.count(F.lit(1)).alias("bn_store")
        )
        totals = counts_new.join(counts_store, "bkey", "left").select(
            "bkey",
            (F.col("bn_new") + F.coalesce("bn_store", F.lit(0))).alias("bn"),
        )
        if carry_capped:
            # the prune's cap correction (see docstring): per new doc,
            # how many of its band rows sit in capped buckets — hidden
            # matches need the new side's dropped row, so this bounds
            # them (same construction as lsh_candidate_pairs')
            hot = totals.filter(F.col("bn") > bucket_max).select("bkey")
            capped_docs = (
                bands_new.join(F.broadcast(hot), "bkey", "left_semi")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_capped"))
            )
        # capping the INCREMENT side alone caps both joins: every pair
        # needs a new-side band row in the kept set, so no store-side
        # filter (a second consumer would also duplicate the observe
        # node and lose the metrics)
        bands_new = cap_hot_buckets(
            bands_new, ["bkey"], bucket_max, cap_metrics,
            counts=totals, broadcast_small=True,
        )
        if carry_capped:
            bands_new = bands_new.join(
                F.broadcast(capped_docs), "doc_id", "left"
            ).withColumn("n_capped", F.coalesce("n_capped", F.lit(0)))
    elif min_est is not None:
        bands_new = bands_new.withColumn("n_capped", F.lit(0))

    xs = [F.col(f"mh_{i}").alias(f"x_{i}") for i in range(n_perm)]
    ys = [F.col(f"mh_{i}").alias(f"y_{i}") for i in range(n_perm)]
    est = est_jaccard_col(n_perm)
    m_min = (
        min_band_matches(n_perm, m["band_rows"], min_est)
        if min_est is not None
        else None
    )
    nc = [F.col("n_capped")] if min_est is not None else []

    a = bands_new.select("doc_id", "bkey", *xs, *nc).alias("a")
    b = bands_new.select("doc_id", "bkey", *ys, *nc).alias("b")
    nn_cols = [
        F.col("a.doc_id").alias("id1"),
        F.col("b.doc_id").alias("id2"),
        *[F.col(f"a.x_{i}") for i in range(n_perm)],
        *[F.col(f"b.y_{i}") for i in range(n_perm)],
    ]
    if min_est is not None:
        nn_cols += [
            F.col("a.n_capped").alias("_nc1"), F.col("b.n_capped").alias("_nc2")
        ]
    new_new = a.join(
        b,
        (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(*nn_cols)
    if min_est is None:
        new_new = new_new.dropDuplicates(["id1", "id2"]).select("id1", "id2", est)
    else:
        sig_cols = [f"x_{i}" for i in range(n_perm)] + [f"y_{i}" for i in range(n_perm)]
        new_new = (
            new_new.groupBy("id1", "id2")
            .agg(
                F.count(F.lit(1)).alias("_m"),
                *[F.first(c).alias(c) for c in sig_cols + ["_nc1", "_nc2"]],
            )
            .filter(F.col("_m") + F.least("_nc1", "_nc2") >= m_min)
            .select("id1", "id2", est)
        )

    old_sigs = _committed_rows(spark, store, _sigs_table(store)).select(
        "doc_id", *ys
    )
    no_pre = bands_new.select(F.col("doc_id").alias("new_id"), "bkey", *xs, *nc).join(
        store_bands.select(F.col("doc_id").alias("old_id"), "bkey"), "bkey"
    )
    if min_est is None:
        no_dedup = no_pre.dropDuplicates(["new_id", "old_id"])
    else:
        x_cols = [f"x_{i}" for i in range(n_perm)]
        no_dedup = (
            no_pre.groupBy("new_id", "old_id")
            .agg(
                F.count(F.lit(1)).alias("_m"),
                *[F.first(c).alias(c) for c in x_cols + ["n_capped"]],
            )
            .filter(F.col("_m") + F.col("n_capped") >= m_min)
        )
    new_old = (
        no_dedup
        # one store join for the old signature, on the sigs table's own
        # bucket key — Exchange-free on the store side
        .join(old_sigs.withColumnRenamed("doc_id", "old_id"), "old_id")
        .select(
            F.least("new_id", "old_id").alias("id1"),
            F.greatest("new_id", "old_id").alias("id2"),
            est,
        )
    )
    out = new_new.unionByName(new_old)
    if min_est is not None:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out
