"""Checkpoint/lineage resume: a rerun recomputes only invalidated buckets
and yields the identical output table (north_rule resumability)."""

from __future__ import annotations

import json
import os

import pytest

from sparkocr.checkpoint import (
    _manifest_path,
    read_manifest,
    run_extract_job,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def first_run(spark, tiny_transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt") / "out")
    result = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    return out, result


def _table(spark, out):
    df = spark.read.parquet(os.path.join(out, "data"))
    return sorted(
        (r["conv_id"], r["turn_idx"], r["clean_text"], r["is_truncated"])
        for r in df.collect()
    )


def test_first_run_processes_all(first_run):
    out, result = first_run
    assert result["skipped"] == []
    assert len(result["processed"]) >= 1
    for b in result["processed"]:
        m = read_manifest(out, b)
        assert m is not None and m.status == "complete"
        assert m.rows_out > 0 or m.input_rows >= 0


def test_noop_rerun_skips_everything(spark, tiny_transcripts, first_run):
    out, r1 = first_run
    r2 = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert r2["processed"] == []
    assert sorted(r2["skipped"]) == sorted(r1["processed"])


def test_resume_recomputes_only_invalidated(spark, tiny_transcripts, first_run):
    out, r1 = first_run
    before = _table(spark, out)
    # simulate a kill after some buckets: drop two manifests
    victims = sorted(r1["processed"])[:2]
    for b in victims:
        os.remove(_manifest_path(out, b))
    r2 = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert sorted(r2["processed"]) == victims
    assert set(r2["skipped"]) == set(r1["processed"]) - set(victims)
    assert _table(spark, out) == before  # idempotent output


def test_version_bump_invalidates(spark, tiny_transcripts, first_run):
    out, r1 = first_run
    b = sorted(r1["processed"])[0]
    p = _manifest_path(out, b)
    m = json.load(open(p))
    m["extractor_version"] = "0-stale"
    json.dump(m, open(p, "w"))
    r2 = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert r2["processed"] == [b]


def test_input_change_invalidates(spark, tmp_path, first_run):
    # same conv ids, one text changed → exactly that conv's bucket recomputes
    out, r1 = first_run
    import pyarrow.parquet as pq
    import pyarrow as pa

    from sparkocr.datagen import generate_rows, SCHEMA

    rows = generate_rows("tiny")
    rows[0]["text"] = (rows[0]["text"] or "") + " MUTATED"
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    mutated = str(tmp_path / "mutated.parquet")
    pq.write_table(pa.Table.from_pydict(cols, schema=SCHEMA), mutated)
    r2 = run_extract_job(spark.getActiveSession() or spark, mutated, out, n_buckets=N_BUCKETS)
    assert len(r2["processed"]) >= 1
    assert len(r2["processed"]) < len(r1["processed"])  # most buckets untouched


def test_orphaned_tmp_manifests_swept(spark, tiny_transcripts, first_run):
    # a crash inside the publish window leaves bucket=N.json.tmp; for a
    # bucket no longer in the input it must be swept, not accumulate
    out, _ = first_run
    orphan = os.path.join(out, "_manifests", "bucket=9999.json.tmp")
    with open(orphan, "w") as f:
        f.write("{}")
    run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert not os.path.exists(orphan)


def test_stray_manifest_names_are_skipped(spark, tiny_transcripts, first_run):
    # the manifest-directory glob (bucket=*.json*) also matches editor
    # backups / partial-upload suffixes; they must be skipped, not abort
    # the job with ValueError on int()
    out, r1 = first_run
    mdir = os.path.join(out, "_manifests")
    strays = ["bucket=3.json.bak", "bucket=x.json", "bucket=2.json.tmp.old"]
    for name in strays:
        with open(os.path.join(mdir, name), "w") as f:
            f.write("junk")
    try:
        r2 = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
        assert r2["processed"] == []
        assert sorted(r2["skipped"]) == sorted(r1["processed"])
        for name in strays:  # left alone, neither parsed nor deleted
            assert os.path.exists(os.path.join(mdir, name))
    finally:
        for name in strays:
            p = os.path.join(mdir, name)
            if os.path.exists(p):
                os.remove(p)


def test_overwrite_mode_restored_after_job(spark, tiny_transcripts, first_run):
    # the job needs dynamic partition overwrite internally but must not
    # leave it set on the shared session (the caller's own later
    # overwrite+partitionBy writes would silently keep stale partitions)
    out, _ = first_run
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert spark.conf.get(key) == before
    assert before.lower() != "dynamic"


def test_manifest_io_leaves_no_crc_sidecars(first_run):
    # manifest IO must use the RAW local filesystem, not the checksummed
    # wrapper (which would both litter .crc files and, if checksums were
    # instead globally disabled, kill corruption detection session-wide)
    out, _ = first_run
    mdir = os.path.join(out, "_manifests")
    assert not [f for f in os.listdir(mdir) if f.endswith(".crc")]


def test_fingerprint_detects_even_multiplicity_change(spark):
    """bit_xor was blind to even-multiplicity edits: a row ingested twice
    then corrected twice contributes x^x = 0 before AND y^y = 0 after, so
    the changed bucket was skipped forever with stale output. The sum-of-
    hashes fingerprint must differ."""
    from sparkocr.checkpoint import input_fingerprints

    schema = "conv_id string, turn_idx int, role string, text string, tool string"
    before = spark.createDataFrame(
        [("c0", 0, "user", "old text", "plain")] * 2, schema
    )
    after = spark.createDataFrame(
        [("c0", 0, "user", "NEW text", "plain")] * 2, schema
    )
    fa, fb = input_fingerprints(before, 1), input_fingerprints(after, 1)
    assert fa[0][0] == fb[0][0] == 2  # same row count
    assert fa[0][1] != fb[0][1]  # ...but the hash must move


def test_empty_input_refuses_to_wipe_completed_output(spark, tiny_transcripts, tmp_path):
    """All buckets 'vanishing' at once (empty snapshot, typo'd input path)
    must NOT silently delete every manifest and data partition of a
    completed table — that is a force=True decision."""
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    from sparkocr import datagen
    from sparkocr.checkpoint import run_extract_job

    out = str(tmp_path / "out")
    run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(datagen.SCHEMA.empty_table(), empty)

    with _pytest.raises(ValueError, match="refusing to delete"):
        run_extract_job(spark, empty, out, n_buckets=N_BUCKETS)

    # orphaned publish attempts are NOT completed output: an out dir whose
    # only manifest is a .json.tmp must not trigger the refusal
    out2 = str(tmp_path / "out_tmp_only")
    os.makedirs(os.path.join(out2, "_manifests"))
    with open(os.path.join(out2, "_manifests", "bucket=0.json.tmp"), "w") as f:
        f.write("{}")
    r0 = run_extract_job(spark, empty, out2, n_buckets=N_BUCKETS)
    assert not r0["processed"] and not r0["skipped"]
    # nothing was touched: a rerun with the real input skips every bucket
    r = run_extract_job(spark, tiny_transcripts, out, n_buckets=N_BUCKETS)
    assert not r["processed"] and len(r["skipped"]) > 0

    # the explicit decision works and empties the table
    r2 = run_extract_job(spark, empty, out, n_buckets=N_BUCKETS, force=True)
    assert r2["rows_out"] == 0
    assert not os.path.exists(os.path.join(out, "data")) or not [
        p for p in os.listdir(os.path.join(out, "data")) if p.startswith("bucket=")
    ]
