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


def test_null_conv_dropped_observably_and_null_idx_counted(spark, tmp_path):
    """Two producers omitting conv_id must NOT merge into one null-keyed
    state (groupBy treats NULL as a single key — the second conversation
    would read as a replay of the first); the rows are dropped with a
    per-batch metric. Null turn_idx rows in a tracked conversation are
    skipped but COUNTED in cumulative state (n_null_idx), closing the
    one undercount path that used to be silent."""
    from sparkocr.streaming.stateful_assembly import (
        streaming_conversation_progress,
    )

    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        os.path.join(d, "f0.parquet"),
        [(None, t, "nnn") for t in range(10)]
        + [(None, t, "mmm") for t in range(10)]
        + [("A", 0, "xx"), ("A", 1, "xx"), ("A", None, "xx"), ("A", None, "xx")],
    )
    q = (
        streaming_conversation_progress(spark, d)
        .writeStream.format("memory")
        .queryName("conv_progress_nulls")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM conv_progress_nulls").collect()
    assert all(r.conv_id is not None for r in rows), rows
    (a,) = [r for r in rows if r.conv_id == "A"]
    assert a.n_turns == 2 and a.n_null_idx == 2 and a.batch_rows == 4
    obs = [
        p.observedMetrics["progress_feed_quality"]
        for p in q.recentProgress
        if "progress_feed_quality" in p.observedMetrics
    ]
    assert any(m["n_rows"] == 24 and m["n_null_conv"] == 20 for m in obs), obs


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


def test_interval_state_model_fuzz():
    """Pure-Python model fuzz of track_conversations (no Spark): across
    random shuffled deliveries with replays, split into random
    micro-batches and iterator chunks, the state must (a) count exactly
    the unique turns when no gap was absorbed, (b) never overcount,
    (c) keep any undercount bounded by the OBSERVABLE n_gap_absorbed
    counter, (d) hold n_ranges <= MAX_RANGES, and (e) report the true
    max_turn. A 4000-trial offline run of this model found no failures;
    CI keeps 300 trials."""
    import random

    import pandas as pd

    from sparkocr.streaming import stateful_assembly as sa

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    for trial in range(300):
        rng = random.Random(trial)
        style = trial % 3
        if style == 0:
            universe = list(range(rng.randint(1, 300)))
        elif style == 1:
            universe = rng.sample(range(10**6), rng.randint(1, 200))
        else:  # isolated singletons force MAX_RANGES absorption
            universe = [
                i * 1000 + rng.randrange(3)
                for i in range(rng.randint(150, 250))
            ]
        deliveries = universe + [
            rng.choice(universe) for _ in range(rng.randint(0, 150))
        ]
        rng.shuffle(deliveries)
        state = FakeState()
        last = None
        i = 0
        while i < len(deliveries):
            n = rng.randint(1, 40)
            batch = deliveries[i : i + n]
            i += n
            k = rng.randint(1, 3)
            pdfs = [
                pd.DataFrame({"turn_idx": batch[j::k], "text": ["x"] * len(batch[j::k])})
                for j in range(k)
            ]
            pdfs = [p for p in pdfs if len(p)]
            last = list(sa.track_conversations(("c",), iter(pdfs), state))[-1].iloc[0]
        uniq = len(set(universe))
        n_turns, n_abs = int(last.n_turns), int(last.n_gap_absorbed)
        assert int(last.n_ranges) <= sa.MAX_RANGES, trial
        assert n_turns <= uniq, trial
        if n_abs == 0:
            assert n_turns == uniq, trial
        assert uniq - n_turns <= n_abs, trial
        assert int(last.max_turn) == max(universe), trial
