"""Sequence packing: assign documents to fixed-token-budget packs.

The standard pre-training batching operator — training sequences are
filled with whole documents up to a context budget, so short documents
don't waste context and long ones get their own pack. At 10^12 documents
exact global greedy packing is inherently sequential (each pack depends
on everything before it), so this is the scale-correct two-level shape:

1. documents are hash-assigned to ``n_groups`` independent streams
   (``pmod(xxhash64(doc_id), n_groups)`` — deterministic, partition-
   layout-independent, same trick as ``dedup.hash_split``);
2. within each stream, docs are packed greedily in ``doc_id`` order
   (running total; open a new pack when the next doc would overflow the
   budget) inside one ``applyInPandas`` group — bounded state (one
   running counter), one shuffle on the group key.

Determinism: pack assignment is a pure function of (doc_id set, sizes,
budget, n_groups) — independent of partitioning and Arrow batching, so
local[8] and a 1000-executor run produce identical packs (the property
every operator in this repo pins). A document larger than the budget
gets a pack of its own (callers chunk oversized docs FIRST —
``chunking.payload_chunks`` exists for exactly that).

Output: one row per document, ``(doc_id, n_tokens, group_id, pack_id,
pack_pos)`` — ``pack_id`` is globally unique (``group_id * 2^40 +
local pack index``), ``pack_pos`` the doc's position inside its pack.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_PACK_STRIDE = 1 << 40  # group_id * stride + local index: globally unique


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_groups: int = 64,
    size_col: str | None = None,
) -> DataFrame:
    """Pack ``docs`` (``doc_id``, ``text`` — or a precomputed
    ``size_col``) into packs of at most ``budget`` tokens per pack.

    ``size_col``: name of an existing per-doc size column; default
    derives whitespace-token counts from ``text`` the same way
    ``textstats.token_counts`` does (JVM-side split, no UDF).

    At 1000-executor scale the only shuffle is the group-key
    ``applyInPandas``; each group's state is one running counter over
    its ~1/n_groups slice, and raising ``n_groups`` bounds any group's
    row count. Packing quality loses nothing material from grouping:
    greedy next-fit wastes at most one document's tokens per pack
    boundary regardless of stream count."""
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    if size_col is None:
        sized = docs.select(
            "doc_id",
            F.when(
                F.trim(F.col("text")).isNotNull() & (F.trim(F.col("text")) != ""),
                F.size(F.split(F.trim(F.col("text")), r"\s+")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )
    else:
        sized = docs.select(
            "doc_id", F.col(size_col).cast("long").alias("n_tokens")
        )
    grouped = sized.withColumn(
        "group_id", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_groups)).cast("int")
    )

    out_schema = (
        "doc_id long, n_tokens long, group_id int, pack_id long, pack_pos int"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        gid = int(pdf["group_id"].iloc[0])
        base = gid * _PACK_STRIDE
        pack_ids, positions = [], []
        local, used, pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                local += 1
                used, pos = 0, 0
            pack_ids.append(base + local)
            positions.append(pos)
            used += n
            pos += 1
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_pos"] = pd.Series(positions, dtype="int32")
        return pdf[["doc_id", "n_tokens", "group_id", "pack_id", "pack_pos"]]

    return grouped.groupBy("group_id").applyInPandas(_pack, out_schema)


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
