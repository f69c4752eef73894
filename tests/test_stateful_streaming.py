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
