"""Incremental MinHash-LSH dedup over a persisted signature store.

``dedup.lsh_candidate_pairs`` re-mines the WHOLE corpus per run: shingle
explode over every document's text, a 12-way min aggregation, and a
banded self-join. Correct, but at 10^12 documents a daily increment of
0.1% new rows cannot pay a full re-mine. This module persists the two
small derived tables once and lets an increment query join against them
with no corpus-sized shuffle:

  {store}_sigs   (doc_id, mh_0..mh_{n_perm-1})   bucketed by doc_id
  {store}_bands  (doc_id, bkey)                   bucketed by bkey
  {store}_meta   single row: n_perm, band_rows, k, n_buckets
                 (written LAST — a missing meta marks a half-built
                 store, mirroring ann_index's completeness discipline)

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

Signatures use the same engine-portable md5 construction as
``dedup.minhash_signatures`` (this module calls it), so a store built by
any engine release replays identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from sparkocr.pipeline import caching
from sparkocr.pipeline.dedup import (
    BAND_ROWS,
    N_PERM,
    SHINGLE,
    _require_cap,
    cap_hot_buckets,
    check_band_divisibility,
    est_jaccard_col,
    minhash_signatures,
)


def _sigs_table(store: str) -> str:
    return f"{store}_sigs"


def _bands_table(store: str) -> str:
    return f"{store}_bands"


def _meta_table(store: str) -> str:
    return f"{store}_meta"


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
) -> None:
    """Build (or rebuild) the store from scratch. The expensive part —
    shingle explode + min aggregation — runs ONCE: signatures are
    materialized to the sigs table first and the bands table derives
    from reading that table back (a 100x-smaller input than the text).

    Meta is dropped first and written last: a build that dies in between
    leaves a store every reader refuses, never a probeable half-store."""
    check_band_divisibility(n_perm, band_rows)
    spark = docs.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {_meta_table(store)}")
    (
        minhash_signatures(docs, n_perm, k)
        .repartition(n_buckets, "doc_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(_sigs_table(store))
    )
    (
        _band_keys(spark.table(_sigs_table(store)), n_perm, band_rows)
        .repartition(n_buckets, "bkey")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "bkey")
        .sortBy("bkey")
        .format("parquet")
        .saveAsTable(_bands_table(store))
    )
    spark.createDataFrame(
        [(n_perm, band_rows, k, n_buckets)],
        ["n_perm", "band_rows", "k", "n_buckets"],
    ).coalesce(1).write.mode("overwrite").saveAsTable(_meta_table(store))


def append_lsh_store(new_docs: DataFrame, store: str) -> dict:
    """Append an increment's signatures and band keys to the store, with
    the STORED parameters (never re-derived). NOT crash-atomic across
    the two appends: a death between them leaves docs with signatures
    but no bands (they stop surfacing as candidates), and a blind retry
    duplicates sigs rows (duplicate pairs downstream). After any crashed
    or uncertain append, run ``check_lsh_store`` — it detects both
    states — and rebuild, or re-append exactly the missing docs.

    Returns ``{"rows": n_docs_appended}``."""
    m = read_store_meta(new_docs.sparkSession, store)
    # every consuming action happens inside this function, so the
    # signature cache is scoped here instead of leaking to the caller's
    # release (a daily driver looping appends would otherwise accumulate
    # one materialized cache per day)
    with caching.scope():
        sig = caching.register(
            minhash_signatures(new_docs, m["n_perm"], m["k"])
        )
        (
            sig.repartition(m["n_buckets"], "doc_id")
            .write.mode("append")
            .bucketBy(m["n_buckets"], "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(_sigs_table(store))
        )
        (
            _band_keys(sig, m["n_perm"], m["band_rows"])
            .repartition(m["n_buckets"], "bkey")
            .write.mode("append")
            .bucketBy(m["n_buckets"], "bkey")
            .sortBy("bkey")
            .format("parquet")
            .saveAsTable(_bands_table(store))
        )
        return {"rows": sig.count()}


def check_lsh_store(spark: SparkSession, store: str) -> dict:
    """Consistency audit (one aggregate pass per table): every doc must
    have exactly one sigs row and exactly n_bands band rows. Returns
    ``{"docs", "dup_sig_docs", "band_mismatch_docs"}``; both counts are 0
    for a healthy store. Diagnosis: a crashed append (sigs written,
    bands not) is band_mismatch alone; a fully duplicated retry (both
    appends re-ran) is dup_sig with band counts still proportional
    (n_band == n_sig·n_bands, so NO band_mismatch); a retry where only
    the sigs append re-ran shows BOTH."""
    m = read_store_meta(spark, store)
    n_bands = m["n_perm"] // m["band_rows"]
    sig_counts = (
        spark.table(_sigs_table(store))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sig"))
    )
    band_counts = (
        spark.table(_bands_table(store))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_band"))
    )
    joined = sig_counts.join(band_counts, "doc_id", "full_outer").select(
        F.coalesce("n_sig", F.lit(0)).alias("n_sig"),
        F.coalesce("n_band", F.lit(0)).alias("n_band"),
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("n_sig") != 1, 1).otherwise(0)).alias("dup_sig_docs"),
        F.sum(
            F.when(F.col("n_band") != F.col("n_sig") * n_bands, 1).otherwise(0)
        ).alias("band_mismatch_docs"),
    ).first()
    return {k: int(v) for k, v in row.asDict().items()}


def incremental_lsh_pairs(
    new_docs: DataFrame,
    store: str,
    bucket_max: int | None = 10_000,
    cap_metrics: Observation | None = None,
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
    increment into broadcastable slices or rebuild the store."""
    spark = new_docs.sparkSession
    m = read_store_meta(spark, store)
    _require_cap(bucket_max, cap_metrics)
    n_perm = m["n_perm"]
    # signature columns ride along with the band keys (the increment is
    # small): new-new pairs then carry BOTH signatures out of the join,
    # and new-old pairs need only one store-sigs join for the old side
    sig_new = caching.register(minhash_signatures(new_docs, n_perm, m["k"]))
    bands_new = _band_keys(sig_new, n_perm, m["band_rows"]).join(sig_new, "doc_id")

    new_ids = sig_new.select("doc_id")
    store_bands = spark.table(_bands_table(store)).join(
        F.broadcast(new_ids), "doc_id", "left_anti"
    )
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
        # capping the INCREMENT side alone caps both joins: every pair
        # needs a new-side band row in the kept set, so no store-side
        # filter (a second consumer would also duplicate the observe
        # node and lose the metrics)
        bands_new = cap_hot_buckets(
            bands_new, ["bkey"], bucket_max, cap_metrics,
            counts=totals, broadcast_small=True,
        )

    xs = [F.col(f"mh_{i}").alias(f"x_{i}") for i in range(n_perm)]
    ys = [F.col(f"mh_{i}").alias(f"y_{i}") for i in range(n_perm)]
    est = est_jaccard_col(n_perm)

    a = bands_new.select("doc_id", "bkey", *xs).alias("a")
    b = bands_new.select("doc_id", "bkey", *ys).alias("b")
    new_new = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            *[F.col(f"a.x_{i}") for i in range(n_perm)],
            *[F.col(f"b.y_{i}") for i in range(n_perm)],
        )
        .dropDuplicates(["id1", "id2"])
        .select("id1", "id2", est)
    )

    old_sigs = spark.table(_sigs_table(store)).select("doc_id", *ys)
    new_old = (
        bands_new.select(F.col("doc_id").alias("new_id"), "bkey", *xs)
        .join(store_bands.select(F.col("doc_id").alias("old_id"), "bkey"), "bkey")
        .dropDuplicates(["new_id", "old_id"])
        # one store join for the old signature, on the sigs table's own
        # bucket key — Exchange-free on the store side
        .join(old_sigs.withColumnRenamed("doc_id", "old_id"), "old_id")
        .select(
            F.least("new_id", "old_id").alias("id1"),
            F.greatest("new_id", "old_id").alias("id2"),
            est,
        )
    )
    return new_new.unionByName(new_old)
