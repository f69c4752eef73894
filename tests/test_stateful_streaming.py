"""Custom stateful streaming operator (applyInPandasWithState): state
persists across micro-batches and whole-file replay is idempotent."""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkocr.datagen import SCHEMA


def _write(path, rows):
    cols = {
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": ["user"] * len(rows),
        "text": [r[2] for r in rows],
        "tool": ["plain"] * len(rows),
        "ts": [dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)] * len(rows),
    }
    pq.write_table(pa.Table.from_pydict(cols, schema=SCHEMA), path)


def test_state_accumulates_and_replay_is_idempotent(spark, tmp_path):
    from sparkocr.streaming.stateful_assembly import streaming_conversation_progress

    d = str(tmp_path / "in")
    os.makedirs(d)
    # micro-batch 1: A turns 0-4, B turns 0-2
    _write(
        os.path.join(d, "f0.parquet"),
        [("A", t, "x" * 10) for t in range(5)] + [("B", t, "y" * 4) for t in range(3)],
    )
    time.sleep(1.1)  # distinct mtime -> deterministic file order
    # micro-batch 2: A turns 0-4 REPLAYED + 5-7 new, B turn 3
    _write(
        os.path.join(d, "f1.parquet"),
        [("A", t, "x" * 10) for t in range(8)] + [("B", 3, "y" * 4)],
    )

    q = (
        streaming_conversation_progress(spark, d, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM conv_progress").collect()

    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    a = sorted(by_conv["A"], key=lambda r: r.n_turns)
    b = sorted(by_conv["B"], key=lambda r: r.n_turns)

    # two emissions per conversation (one per micro-batch)
    assert len(a) == 2 and len(b) == 2
    # batch 1: 5 fresh turns; batch 2: 8 rows seen but only 3 fresh
    assert (a[0].n_turns, a[0].batch_rows) == (5, 5)
    assert (a[1].n_turns, a[1].batch_rows) == (8, 8)
    assert a[1].n_chars == 8 * 10  # replayed turns counted once
    assert a[1].max_turn == 7
    assert (b[0].n_turns, b[1].n_turns) == (3, 4)
    assert b[1].n_chars == 4 * 4


def test_out_of_order_first_delivery_counts_every_turn(spark, tmp_path):
    """The datagen layout scatters a conversation's turns across files by
    t mod n_files, so a later file legitimately delivers LOWER turn_idx
    values than an earlier one. Interval-set dedup must count them as new
    (a max-turn watermark would silently drop them as replays)."""
    from sparkocr.streaming.stateful_assembly import streaming_conversation_progress

    d = str(tmp_path / "in")
    os.makedirs(d)
    # file 0: even turns 0,2,4,6 — file 1: odd turns 1,3,5,7 (all BELOW
    # the max_turn=6 a watermark would have set) + a replay of 0
    _write(os.path.join(d, "f0.parquet"), [("A", t, "x" * 3) for t in (0, 2, 4, 6)])
    time.sleep(1.1)
    _write(
        os.path.join(d, "f1.parquet"),
        [("A", t, "x" * 3) for t in (1, 3, 5, 7)] + [("A", 0, "x" * 3)],
    )

    q = (
        streaming_conversation_progress(spark, d, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("conv_progress_ooo")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.sql("SELECT * FROM conv_progress_ooo").collect(),
        key=lambda r: r.n_turns,
    )
    assert len(rows) == 2
    assert (rows[0].n_turns, rows[0].n_ranges) == (4, 4)  # 0,2,4,6 disjoint
    # all four odd turns counted; replay of 0 skipped; ranges merged to one
    assert (rows[1].n_turns, rows[1].batch_rows) == (8, 5)
    assert rows[1].n_chars == 8 * 3
    assert (rows[1].max_turn, rows[1].n_ranges, rows[1].n_gap_absorbed) == (7, 1, 0)


def test_interval_state_stays_bounded(spark, tmp_path):
    """More disjoint runs than MAX_RANGES: the state absorbs smallest gaps,
    stays under the cap, and reports the absorbed indices."""
    from sparkocr.streaming.stateful_assembly import MAX_RANGES, streaming_conversation_progress

    d = str(tmp_path / "in")
    os.makedirs(d)
    # every third index: MAX_RANGES + 40 singleton ranges with gap-2 holes
    n = MAX_RANGES + 40
    _write(os.path.join(d, "f0.parquet"), [("A", 3 * i, "z") for i in range(n)])

    q = (
        streaming_conversation_progress(spark, d, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("conv_progress_bounded")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    (row,) = spark.sql("SELECT * FROM conv_progress_bounded").collect()
    assert row.n_turns == n  # every delivered turn counted
    assert row.n_ranges <= MAX_RANGES
    # each absorbed gap surrenders exactly 2 indices (3i+1, 3i+2)
    assert row.n_gap_absorbed == 2 * (n - row.n_ranges)
