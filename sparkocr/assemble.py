"""Per-conversation ordered document assembly — pure JVM, skew-resistant.

Reproduces the reference's page assembly:

- CLI style: ``content + '\\n' + '\\n<--- Page Split --->' + '\\n'`` after
  EVERY page including the last (page_num carries its own leading newline:
  run_dpsk_ocr_pdf.py:302-304,323), optionally dropping truncated pages
  first (SKIP_REPEAT, run_dpsk_ocr_pdf.py:295-299).
- App style: ``'\\n\\n--- 📄 第 {N} 页 ---\\n\\n' + content`` concatenated with
  no trailing separator (app/processors.py:616-642), N numbered over the
  *surviving* pages in order.

Everything is built-in expressions (collect_list → array_sort → transform →
aggregate/array_join): no Python on this path, one shuffle on the cleaned
text only. For skewed conversations (one conv with ~10^5 turns among small
ones) the two-phase variant first concatenates fixed-size turn ranges
(conv_id, turn_idx // chunk) — a salted partial aggregation — then merges
the ordered chunks, bounding any single group's state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# canonical definition lives with the other reference string constants in
# the (Spark-free) grounding module; one source of truth for the separator
from sparkocr.textproc.grounding import PAGE_SPLIT as PAGE_SPLIT_SUFFIX


def _ordered_concat(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    text_col: str,
    out_col: str,
    extra_agg=None,
):
    """groupBy(key).agg: concat(text ordered by order_col) — JVM only.
    ``extra_agg`` rides in the same aggregation (default: row count as
    ``_n``) so callers never need a second pass over the upstream DAG."""
    pair = F.struct(F.col(order_col).alias("k"), F.col(text_col).alias("v"))
    if extra_agg is None:
        extra_agg = F.count(F.lit(1)).alias("_n")
    agg = df.groupBy(*key_cols).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["v"]), ""
        ).alias(out_col),
        extra_agg,
    )
    return agg


def _assemble_ordered(piece: DataFrame, two_phase: bool, chunk: int) -> DataFrame:
    """(conv_id, turn_idx, piece) → (conv_id, n_turns, doc_text), pieces
    concatenated in turn order. Shared by the CLI-clean and det variants."""
    if not two_phase:
        agg = _ordered_concat(piece, ["conv_id"], "turn_idx", "piece", "doc_text")
        return agg.select(
            "conv_id", F.col("_n").cast("int").alias("n_turns"), "doc_text"
        )
    # Phase 1: bounded partial concat per (conv_id, turn range) — caps group
    # state at `chunk` turns so one huge conversation cannot blow a task.
    p1 = _ordered_concat(
        piece.withColumn("chunk_id", (F.col("turn_idx") / F.lit(chunk)).cast("int")),
        ["conv_id", "chunk_id"],
        "turn_idx",
        "piece",
        "chunk_text",
    )
    # Phase 2: merge ordered chunks per conversation; n_turns rides in the
    # same aggregation (a separate count branch would recompute the whole
    # extraction DAG upstream).
    p2 = _ordered_concat(
        p1, ["conv_id"], "chunk_id", "chunk_text", "doc_text",
        extra_agg=F.sum("_n").cast("int").alias("n_turns"),
    )
    return p2.select("conv_id", "n_turns", "doc_text")


def assemble_docs_cli(
    turns: DataFrame,
    skip_truncated: bool = True,
    two_phase: bool = True,
    chunk: int = 4096,
) -> DataFrame:
    """CLI-style doc assembly → (conv_id, n_turns, doc_text)."""
    t = turns
    if skip_truncated and "is_truncated" in t.columns:
        t = t.filter(~F.col("is_truncated"))
    piece = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.concat(F.coalesce(F.col("clean_text"), F.lit("")), F.lit(PAGE_SPLIT_SUFFIX)).alias(
            "piece"
        ),
    )
    return _assemble_ordered(piece, two_phase, chunk)


def assemble_docs_det(
    transcripts: DataFrame,
    skip_truncated: bool = True,
    two_phase: bool = True,
    chunk: int = 4096,
) -> DataFrame:
    """``_det.mmd`` variant (run_dpsk_ocr_pdf.py:297-304): the UNCLEANED
    per-page output — grounding markers intact, only EOS stripped — joined
    with the same page-split suffix as the clean CLI file. Pages without
    EOS are skipped under SKIP_REPEAT exactly like the clean path (the
    reference `continue`s before either file sees the page).

    Operates on the raw transcripts table (pure JVM expressions): the det
    file needs no extraction, so it branches off the source scan rather
    than the MapInPandas output."""
    from sparkocr.textproc.grounding import EOS

    t = transcripts
    if skip_truncated:
        t = t.filter(F.contains(F.col("text"), F.lit(EOS)))
    piece = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.concat(
            F.replace(F.coalesce(F.col("text"), F.lit("")), F.lit(EOS), F.lit("")),
            F.lit(PAGE_SPLIT_SUFFIX),
        ).alias("piece"),
    )
    return _assemble_ordered(piece, two_phase, chunk)


def assemble_docs_app(
    turns: DataFrame, page_start: int = 1, text_col: str = "clean_text"
) -> DataFrame:
    """App-style labeled assembly (app/processors.py:616-642): page label
    ``\\n\\n--- 📄 第 {page_start + jdx} 页 ---\\n\\n`` prefixes each page in
    turn order. Unlike the CLI path there is deliberately NO truncated-page
    drop: the app strips EOS but never skips a page (SKIP_REPEAT is
    CLI-only, app/processors.py:613-614), so every input turn is labeled.

    One shuffle, no Window: page numbers come from the sorted-array index
    inside the same aggregate that concatenates (``transform`` exposes the
    element index) — the earlier row_number Window funnelled every turn of
    a conversation (full payload) through a per-conv single-task sort AND
    then shuffled again for the concat. Sorting struct(k, v) tie-breaks
    duplicate (conv_id, turn_idx) rows on the text like the CLI path, so
    at-least-once replays still number deterministically."""
    pair = F.struct(
        F.col("turn_idx").alias("k"),
        F.coalesce(F.col(text_col), F.lit("")).alias("v"),
    )
    doc = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(pair)),
            lambda x, i: F.concat(
                F.lit("\n\n--- \U0001f4c4 第 "),
                (i + F.lit(page_start)).cast("string"),
                F.lit(" 页 ---\n\n"),
                x["v"],
            ),
        ),
        "",
    )
    return turns.groupBy("conv_id").agg(
        doc.alias("doc_text"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    ).select("conv_id", "n_turns", "doc_text")
