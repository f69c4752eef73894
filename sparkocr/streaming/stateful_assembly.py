"""Custom stateful streaming operator: per-conversation progress tracking.

``applyInPandasWithState`` over ``conv_id``: state carries (turns seen,
chars out, seen turn_idx ranges) across micro-batches, so a turn replayed
by an at-least-once upstream (the common failure mode of a 10^12-turn
feed) is counted once, and each micro-batch emits the conversation's
updated progress row. This is the streaming counterpart of the batch
job's per-bucket manifests: batch resume dedups at file/bucket
granularity, the stateful operator dedups at (conv_id, turn_idx)
granularity inside the stream.

Dedup state is an INTERVAL SET of seen turn_idx ranges, not a single
max-turn watermark: files may deliver a conversation's turns in any order
(the bench datagen itself scatters turns across files by ``t mod
n_files``), and a watermark would misclassify every out-of-order NEW turn
as a replay. The interval set stays tiny when arrival is near-ordered
(contiguous runs merge to one range) and is hard-bounded at
``MAX_RANGES``: beyond that the smallest inter-range gap is absorbed
(marked seen), and ``n_gap_absorbed`` counts the turn indices given up
that way so any resulting undercount is observable downstream, never
silent.

Not expressible as SQL over a static table (the semantics depend on
arrival order and state persistence across triggers), so the driver's
correctness record for it is rows-only; the pytest suite instead proves
the state invariants directly: accumulation across micro-batches, replay
idempotence, and out-of-order first delivery.

STATE SCHEMA CHANGE: the interval-set layout replaces the round-1
max-turn watermark. Spark's state-store schema check fails loudly on a
checkpoint written by the old operator — intended: a watermark state
cannot be losslessly migrated to interval sets inside
``applyInPandasWithState``, so restart such a stream from a fresh
checkpoint directory (counts rebuild from the replayed files).
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator
from typing import Any

import pandas as pd

STATE_SCHEMA = (
    "n_turns long, n_chars long, starts array<int>, ends array<int>, "
    "n_gap_absorbed long"
)
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, n_chars long, max_turn int, "
    "batch_rows int, n_ranges int, n_gap_absorbed long"
)

# Hard bound on interval-set size: 128 ranges x 2 ints is a few KB per
# conversation; a 10^12-turn stream with 10^8 conversations stays in
# manageable state-store territory.
MAX_RANGES = 128


def _seen(starts: list[int], ends: list[int], t: int) -> bool:
    i = bisect.bisect_right(starts, t) - 1
    return i >= 0 and t <= ends[i]


def _insert(starts: list[int], ends: list[int], t: int) -> None:
    """Insert t into the disjoint, sorted interval set, merging adjacent
    ranges (caller guarantees t is not already covered)."""
    i = bisect.bisect_right(starts, t)
    left = i > 0 and ends[i - 1] == t - 1
    right = i < len(starts) and starts[i] == t + 1
    if left and right:
        ends[i - 1] = ends[i]
        del starts[i], ends[i]
    elif left:
        ends[i - 1] = t
    elif right:
        starts[i] = t
    else:
        starts.insert(i, t)
        ends.insert(i, t)


def track_conversations(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Grouped-map-with-state fn for ``applyInPandasWithState``."""
    (conv_id,) = key
    if state.exists:
        n_turns, n_chars, starts, ends, n_gap_absorbed = state.get
        starts, ends = list(starts), list(ends)
    else:
        n_turns, n_chars, starts, ends, n_gap_absorbed = 0, 0, [], [], 0

    batch_rows = 0
    for pdf in pdfs:
        for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
            batch_rows += 1
            # file sources force-nullable the declared schema: a null
            # turn_idx arrives as NaN and int(NaN) would crash the
            # micro-batch, which the checkpoint then replays forever —
            # skip the malformed row instead of crash-looping the stream
            if turn_idx is None or turn_idx != turn_idx:
                continue
            t = int(turn_idx)
            if _seen(starts, ends, t):
                continue  # replayed (or gap-absorbed) turn
            _insert(starts, ends, t)
            n_turns += 1
            n_chars += len(text or "")

    # bound the state: absorb the smallest inter-range gap until under the
    # cap, counting the indices surrendered so undercount is observable
    while len(starts) > MAX_RANGES:
        gap, j = min(
            (starts[i + 1] - ends[i], i) for i in range(len(starts) - 1)
        )
        n_gap_absorbed += gap - 1
        ends[j] = ends[j + 1]
        del starts[j + 1], ends[j + 1]

    max_turn = ends[-1] if ends else -1
    state.update((n_turns, n_chars, starts, ends, n_gap_absorbed))
    yield pd.DataFrame(
        [
            (
                conv_id, n_turns, n_chars, max_turn, batch_rows,
                len(starts), n_gap_absorbed,
            )
        ],
        columns=[
            "conv_id", "n_turns", "n_chars", "max_turn", "batch_rows",
            "n_ranges", "n_gap_absorbed",
        ],
    )


def streaming_conversation_progress(spark, input_dir: str, max_files_per_trigger: int = 1):
    """readStream → stateful per-conversation progress stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sparkocr import schema

    src = (
        spark.readStream.schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        src.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            track_conversations,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
