"""Bounded payload chunking — the dynamic_preprocess analog (T3).

The reference splits an oversized image into row-major tiles of a fixed
size, capped by MIN/MAX_CROPS (process/image_process.py:45-83), so no
single unit of work exceeds the model's budget. The text analog: split an
oversized payload into fixed-width character segments in order, so no
single Arrow row blows a batch's memory and downstream per-chunk operators
(fingerprints, dedup, token counts) see bounded units.

Pure JVM (`transform(sequence(...))` + `posexplode`): no Python, no
shuffle — chunking is a projection, exactly like the reference's
per-record tiling. The tile-grid *arithmetic* itself (count_tiles /
aspect-ratio selection) lives in sparkocr.textproc.tiles (T1/T2/T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_turns(
    df: DataFrame,
    text_col: str = "text",
    max_chars: int = 4096,
    keep_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One row per (input row, chunk): ``keep_cols + (chunk_idx,
    chunk_text, n_chunks)``. Chunks are ``max_chars`` wide except the last;
    order is recoverable from ``chunk_idx`` (row-major, like tile order)."""
    n = F.coalesce(F.length(text_col), F.lit(0))
    n_chunks = F.greatest(F.ceil(n / F.lit(max_chars)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.substring(
            F.col(text_col), i * F.lit(max_chars) + F.lit(1), max_chars
        ),
    )
    return df.select(
        *keep_cols,
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        n_chunks.alias("n_chunks"),
    )
