"""Sequence packing: assign documents to fixed-token-budget packs.

The standard pre-training batching operator — training sequences are
filled with whole documents up to a context budget, so short documents
don't waste context and long ones get their own pack. At 10^12 documents
exact global greedy packing is inherently sequential (each pack depends
on everything before it), so this is the scale-correct two-level shape:

1. documents are hash-assigned to ``n_groups`` independent streams
   (``pmod(xxhash64(doc_id), n_groups)`` — deterministic, partition-
   layout-independent, same trick as ``dedup.hash_split``);
2. streams are shuffled to their owning partition and sorted there
   (``repartition(group_id)`` + ``sortWithinPartitions``), then a
   ``mapInPandas`` pass STREAMS the sorted Arrow batches through
   per-group running counters — true O(1) state per group, never a
   whole group materialized in one pandas frame (a group is ~corpus /
   n_groups rows; loading it would OOM an executor at the stated
   scale).

Determinism: pack assignment is a pure function of the (doc_id,
n_tokens) multiset, budget, and n_groups — independent of partitioning
and Arrow batching, so local[8] and a 1000-executor run produce
identical packs (the property every operator in this repo pins). The
in-stream order is (doc_id, n_tokens), so even duplicate doc_ids cannot
make downstream assignments depend on physical row order. A document
larger than the budget gets a pack of its own (callers split oversized
payloads FIRST — ``textproc.chunking.chunk_turns`` is the bounded-
segment splitter for that). ``doc_id`` is the documents schema's long
key; hash or cast string keys before calling.

Output: one row per document, ``(doc_id, n_tokens, group_id, pack_id,
pack_pos)`` — ``pack_id`` is globally unique (``group_id * 2^40 +
local pack index``), ``pack_pos`` the doc's position inside its pack.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_PACK_STRIDE = 1 << 40  # group_id * stride + local index: globally unique


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_groups: int = 64,
    size_col: str | None = None,
    id_offset: int = 0,
) -> DataFrame:
    """Pack ``docs`` (``doc_id``, ``text`` — or a precomputed
    ``size_col``) into packs of at most ``budget`` tokens per pack.

    ``size_col``: name of an existing per-doc size column; the default
    derives whitespace-token counts from ``text`` with the SAME
    expression as ``textstats.token_counts`` (one shared definition).
    Null sizes (null text, or a null/uncastable size_col value) count 0
    and negatives are clamped to 0 — a poison row must degrade, not
    kill the stage or corrupt the running total.

    ``id_offset``: added to every pack_id — the NAMESPACE hook for
    callers that pack several partitions of a corpus independently
    (e.g. per train/val/test split) and need globally unique ids.
    Pack ids then lie in ``[id_offset, id_offset + (n_groups+1) *
    2^40)``; space successive offsets at least that far apart (the
    ``corpus_job`` uses ``i << 60``, which holds for any
    ``n_groups < 2^20``, checked here). A stream needing 2^40 packs
    would break intra-group uniqueness regardless of offsets and raises
    loudly instead of wrapping.

    Scale shape: one shuffle (the group repartition), per-partition sort,
    and a streaming map whose state is one counter per in-flight group.
    Raising ``n_groups`` bounds any stream's length; greedy next-fit
    loses at most one document's tokens per pack boundary regardless of
    stream count."""
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(
            f"pack_sequences: n_groups must be positive, got {n_groups} "
            "(pmod by zero would null every group id)"
        )
    if id_offset < 0:
        raise ValueError(f"pack_sequences: id_offset must be >= 0, got {id_offset}")
    if id_offset and n_groups * _PACK_STRIDE >= id_offset:
        raise ValueError(
            f"pack_sequences: id_offset {id_offset} is inside the id range "
            f"of the {n_groups}-group layout (< {n_groups * _PACK_STRIDE}) "
            "— namespaces would overlap; use a larger offset or fewer groups"
        )
    if size_col is None:
        from sparkocr.pipeline.textstats import ws_token_count_col

        size_expr = ws_token_count_col()
    else:
        size_expr = F.col(size_col).cast("long")
    sized = docs.select(
        "doc_id",
        F.greatest(F.lit(0), F.coalesce(size_expr, F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
    )
    grouped = (
        sized.withColumn(
            "group_id",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_groups)).cast("int"),
        )
        .repartition(n_groups, "group_id")
        .sortWithinPartitions("group_id", "doc_id", "n_tokens")
    )

    out_schema = (
        "doc_id long, n_tokens long, group_id int, pack_id long, pack_pos int"
    )

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # running state survives ACROSS Arrow batches of the sorted
        # partition; groups are contiguous after the sort, so one open
        # counter set per group suffices
        gid = None
        local = used = pos = 0
        for pdf in batches:
            pack_ids, positions = [], []
            for g, n in zip(pdf["group_id"], pdf["n_tokens"]):
                g, n = int(g), int(n)
                if g != gid:
                    gid, local, used, pos = g, 0, 0, 0
                elif used > 0 and used + n > budget:
                    local += 1
                    used, pos = 0, 0
                    if local >= _PACK_STRIDE:
                        raise ValueError(
                            "pack_sequences: a single stream exceeded "
                            f"{_PACK_STRIDE} packs — pack ids would wrap; "
                            "raise n_groups"
                        )
                pack_ids.append(id_offset + gid * _PACK_STRIDE + local)
                positions.append(pos)
                used += n
                pos += 1
            out = pdf[["doc_id", "n_tokens", "group_id"]].copy()
            out["pack_id"] = pd.Series(pack_ids, dtype="int64")
            out["pack_pos"] = pd.Series(positions, dtype="int32")
            yield out

    return grouped.mapInPandas(_pack, out_schema)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row per pack: docs, tokens, fill ratio — the packing-quality
    summary a pipeline monitors (mean fill is the context-waste metric)."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill",
            F.round(F.least(F.col("n_tokens") / F.lit(float(budget)), F.lit(1.0)), 6),
        )
    )
