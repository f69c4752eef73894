"""Per-bucket lineage manifests + idempotent resume.

The north rule requires the job to checkpoint per partition with lineage
(input fingerprint, rows in/out, extractor version) so a killed run resumes
without recomputing completed partitions. Spark batch jobs have no built-in
partial resume, so we emulate the Iceberg-style snapshot/manifest surface on
plain Parquet (SURVEY.md §7, "Iceberg absence" risk):

- the output table is partitioned by ``bucket = pmod(xxhash64(conv_id), N)``
  (the Parquet stand-in for Iceberg ``bucket(conv_id, N)``);
- one JSON manifest per bucket records the input fingerprint — (row count,
  bit_xor of xxhash64(conv_id, turn_idx, text)) computed in a single cheap
  aggregate pass — plus rows in/out and the extractor version;
- on start, buckets whose manifest matches the current fingerprint and
  version are skipped; only pending buckets are filtered, extracted, and
  (dynamically) overwritten.

All fingerprinting is JVM expressions; no data leaves the executors except
the per-bucket aggregate rows. Manifest IO goes through the Hadoop
FileSystem API (not python ``open``), so ``out_dir`` may be any filesystem
the cluster can reach — hdfs://, s3a://, or a plain local path — exactly
like the data writes beside it. A crash between delete and rename of a
manifest leaves it missing, which the resume logic already treats as
pending: never wrong, at worst one recomputed bucket.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkocr.extract.dispatch import EXTRACTOR_VERSION, extract_turns


def _fs(spark: SparkSession, path_str: str):
    """(jvm, FileSystem, Path) for ``path_str`` under the session's Hadoop
    conf. On the local filesystem the cached instance is a checksummed
    wrapper that shadows every file with a .crc sidecar; we use its RAW
    inner filesystem for manifest IO instead of flipping checksum flags on
    the SHARED cached instance (which would silently disable corruption
    detection for every other reader in the session, Spark's own parquet
    scans included). Remote filesystems (hdfs/s3a) have no such wrapper
    and are used as-is."""
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    try:
        fs = fs.getRawFileSystem()  # only ChecksumFileSystem has it
    except Exception:
        pass
    return jvm, fs, jpath


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("manifest IO needs an active SparkSession")
    return s


@dataclass
class BucketManifest:
    bucket: int
    input_rows: int
    input_hash: int
    rows_out: int
    extractor_version: str
    status: str = "complete"


_MANIFEST_NAME_RE = re.compile(r"^bucket=(\d+)\.json(\.tmp)?$")


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"bucket={bucket}.json")


def read_json_fs(jvm, fs, path_str: str) -> dict:
    """Read and parse one small JSON file through an already-resolved
    FileSystem. LOUD: missing file / IO error / bad JSON all raise —
    callers that want swallow-to-None semantics (manifest resume) wrap it.
    Shared by the manifest reader here and the ANN index's commit/pending
    markers (one copy of the bulk-copy stream discipline to maintain)."""
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    stream = fs.open(p)
    try:
        bos = jvm.java.io.ByteArrayOutputStream()
        # one bulk copy instead of a py4j round trip per line
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 65536, False)
    finally:
        stream.close()
    return json.loads(bytes(bos.toByteArray()).decode("utf-8"))


def publish_json_atomic(spark: SparkSession, path_str: str, payload: dict) -> None:
    """Write a small JSON file with the manifest publish discipline:
    write to ``.tmp`` then delete+rename. HDFS/S3 rename refuses an
    existing destination; a crash in the gap leaves the file missing,
    which every caller treats as "not committed" (safe). Hadoop reports
    most failures via a false RETURN, not an exception — a silent failed
    publish would wedge the caller's resume logic forever, so raise
    loudly instead."""
    jvm, fs, final = _fs(spark, path_str)
    fs.mkdirs(final.getParent())
    tmp = jvm.org.apache.hadoop.fs.Path(path_str + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"json publish failed: rename {path_str}.tmp")


def _read_manifest_fs(jvm, fs, path_str: str) -> BucketManifest | None:
    """Read one manifest through an already-resolved FileSystem. Only the
    read/parse is error-swallowed (unreadable manifest → pending bucket);
    infrastructure failures around FS resolution stay loud in callers."""
    try:
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(path_str)):
            return None
        return BucketManifest(**read_json_fs(jvm, fs, path_str))
    except Exception:
        return None  # unreadable manifest → treat bucket as pending


def read_manifest(
    out_dir: str, bucket: int, spark: SparkSession | None = None
) -> BucketManifest | None:
    spark = _active_spark(spark)  # outside any catch: misconfiguration is loud
    jvm, fs, _ = _fs(spark, out_dir)
    return _read_manifest_fs(jvm, fs, _manifest_path(out_dir, bucket))


def write_manifest(
    out_dir: str, m: BucketManifest, spark: SparkSession | None = None
) -> None:
    spark = _active_spark(spark)
    publish_json_atomic(spark, _manifest_path(out_dir, m.bucket), asdict(m))


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


def input_fingerprints(df: DataFrame, n_buckets: int) -> dict[int, tuple[int, int]]:
    """One aggregate pass: bucket → (row_count, SUM of row hashes).

    The hash covers EVERY column the extractor consumes — ``tool`` selects
    the extraction mode and ``role`` is carried through — so a row whose
    mode changes (same text) still invalidates its bucket.

    SUM (order-insensitive, multiplicity-sensitive), not bit_xor: xor is
    blind to even-multiplicity changes — a row ingested twice then
    corrected twice contributes x^x = 0 before AND y^y = 0 after, so the
    changed bucket would be skipped forever with stale output. The sum is
    carried in decimal(38,0) (input hashes cast to decimal(28,0), Spark
    widens the sum by 10 digits): |hash| < 2^63 ≈ 9.3e18, so even 10^12
    rows stay under 1e31 — no overflow, and ANSI mode cannot abort it."""
    rows = (
        with_bucket(df, n_buckets)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("conv_id", "turn_idx", "role", "text", "tool").cast(
                    "decimal(28,0)"
                )
            ).alias("h"),
        )
        .collect()
    )
    return {r["bucket"]: (r["n"], int(r["h"])) for r in rows}


def run_extract_job(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    n_buckets: int = 32,
    force: bool = False,
) -> dict:
    """Resumable extraction: transcripts parquet → turns_out parquet
    partitioned by bucket, one lineage manifest per bucket.

    Returns {"processed": [...], "skipped": [...], "rows_out": int}.
    """
    df = spark.read.parquet(input_path)
    fps = input_fingerprints(df, n_buckets)

    # ONE manifest-directory listing (a per-bucket exists() probe is ~2
    # remote calls each on object stores — thousands of sequential HEADs
    # at n_buckets=1024 before any work starts); .json.tmp leftovers from
    # a crash inside a publish window are swept here too
    jvm, fs, _ = _fs(spark, out_dir)
    glob_path = jvm.org.apache.hadoop.fs.Path(
        os.path.join(_manifest_dir(out_dir), "bucket=*.json*")
    )
    existing: set[int] = set()
    live = set(fps)
    statuses = [
        (st, _MANIFEST_NAME_RE.match(st.getPath().getName()))
        for st in fs.globStatus(glob_path) or []
    ]
    # blast-radius guard: an EMPTY input (transient producer bug, empty
    # snapshot, typo'd path resolving to a _SUCCESS-only dir) makes every
    # bucket look "vanished" — without this check the loop below would
    # delete every manifest and every data partition of a completed table
    # before returning {"processed": [], "skipped": []}. Deleting the
    # whole output is only valid as an EXPLICIT decision (force=True).
    # only PUBLISHED manifests (not orphaned .json.tmp from a crashed
    # publish window) count as completed output worth protecting
    if not fps and not force and any(
        m is not None and not m.group(2) for _, m in statuses
    ):
        raise ValueError(
            f"input {input_path} resolves to zero rows but completed "
            f"buckets exist at {out_dir} — refusing to delete them; pass "
            "force=True if the table is intentionally now empty"
        )
    for st, nm in statuses:
        # strict name check: the glob also matches strays like
        # bucket=3.json.bak or editor backups — skip them instead of
        # aborting the whole job on int()
        if nm is None:
            continue
        b = int(nm.group(1))
        if nm.group(2):  # .tmp suffix
            if b not in live:
                fs.delete(st.getPath(), False)  # orphaned publish attempt
            continue
        if b not in live:
            # bucket VANISHED from the input (all rows deleted): drop its
            # stale manifest + data — neither pending nor skipped, and
            # dynamic overwrite would never touch its partition
            fs.delete(st.getPath(), False)
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    os.path.join(out_dir, "data", f"bucket={b}")
                ),
                True,
            )
        else:
            existing.add(b)

    pending: list[int] = []
    skipped: list[int] = []
    for bucket, (n, h) in sorted(fps.items()):
        m = (
            _read_manifest_fs(jvm, fs, _manifest_path(out_dir, bucket))
            if bucket in existing
            else None
        )
        if (
            not force
            and m is not None
            and m.status == "complete"
            and (m.input_rows, m.input_hash) == (n, h)
            and m.extractor_version == EXTRACTOR_VERSION
        ):
            skipped.append(bucket)
        else:
            pending.append(bucket)

    rows_out_total = 0
    if pending:
        src = with_bucket(df, n_buckets).filter(F.col("bucket").isin(pending))
        turns = extract_turns(src.select("conv_id", "turn_idx", "role", "text", "tool"))
        turns = with_bucket(turns, n_buckets)
        # dynamic partition overwrite as a WRITE-SCOPED option, not a
        # session conf: a set/restore around the job would race a second
        # run_extract_job on the same session (thread B's still-pending
        # write flips back to STATIC when thread A's finally fires —
        # static overwrite then deletes every bucket not in B's pending
        # set), and would silently retarget the caller's own concurrent
        # overwrite+partitionBy writes
        turns.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(os.path.join(out_dir, "data"))
        counts = {
            r["bucket"]: r["n"]
            for r in spark.read.parquet(os.path.join(out_dir, "data"))
            .filter(F.col("bucket").isin(pending))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for b in pending:
            n, h = fps[b]
            rows_out = int(counts.get(b, 0))
            rows_out_total += rows_out
            write_manifest(
                out_dir,
                BucketManifest(
                    bucket=b,
                    input_rows=n,
                    input_hash=h,
                    rows_out=rows_out,
                    extractor_version=EXTRACTOR_VERSION,
                ),
                spark,
            )
    return {"processed": pending, "skipped": skipped, "rows_out": rows_out_total}
