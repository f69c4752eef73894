"""Multimodal columns: opaque binary payloads + typed metadata.

At training-data scale, images/audio/video ride through Spark as opaque
``binary`` columns with typed metadata structs; all heavy decode work is
Arrow-batched Python at the edges. This container ships no image/audio
libraries (no PIL/cv2/ffmpeg — verified), so the codec step itself is
STUBBED two ways, clearly marked:

- ``decode_image_real`` raises NotImplementedError — the seam where
  PIL/torchvision would plug in on a real cluster;
- the shipped operators use a DETERMINISTIC FAKE codec (payload bytes →
  seeded per-pixel stats) so the Spark-side plumbing — schema, Arrow batch
  shape, mapInPandas signatures, partitioning — is real and fully tested.

Operators mirror the reference's image pre-processing slots (SURVEY.md
§2.2): decode+stats (T4 ImageTransform analog), resize arithmetic
(dynamic_preprocess resize, process/image_process.py:59-61), tile/frame
sampling (dynamic_preprocess crop loop, :62-84 / video frame-sample
analog), EXIF-style normalization flag (load_image, run_dpsk_ocr_image.py
:40-54).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),  # 1 for stills
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

DECODED_SCHEMA = (
    "media_id long, n_bytes int, mean_byte double, width int, height int, "
    "aspect_ratio double, checksum long"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_checksum long, n_bytes int"
)


def decode_image_real(payload: bytes, meta: dict):  # pragma: no cover
    """The real-codec seam. On a cluster with PIL/torchvision installed this
    returns a decoded ndarray; this container has no image libraries."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use the deterministic fake path (decode_stats_batches)"
    )


def _fake_decode_stats(payload: bytes) -> tuple[int, float, int]:
    """Deterministic fake decode: byte stats + a 60-bit md5-prefix
    checksum. Stands in for per-pixel statistics a real decoder would
    produce; stable across runs and processes (no hash seed dependence),
    engine-portable (any SQL engine with md5 replays it — DuckDB has no
    crc32), and C-speed — an earlier per-byte python rolling hash cost
    ~1 s of executor CPU per 10 MB payload on the hot mapInPandas path."""
    if not payload:
        return 0, 0.0, 0
    import hashlib

    import numpy as np

    n = len(payload)
    total = int(np.frombuffer(payload, dtype=np.uint8).sum(dtype=np.int64))
    csum = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return n, total / n, csum


def decode_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: media rows → DECODED_SCHEMA rows (fake codec)."""
    for pdf in batches:
        if not len(pdf):
            continue
        rows = []
        for media_id, payload, meta in zip(
            pdf["media_id"], pdf["payload"], pdf["meta"]
        ):
            n, mean_b, csum = _fake_decode_stats(payload)
            w = int(meta["width"]) if meta and meta["width"] is not None else 0
            h = int(meta["height"]) if meta and meta["height"] is not None else 0
            # no python round() here: callers round JVM-side (HALF_UP), so
            # oracle SQL round() semantics match exactly
            rows.append(
                (media_id, n, mean_b, w, h, w / h if h else None, csum)
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "n_bytes", "mean_byte", "width", "height",
                "aspect_ratio", "checksum",
            ],
        )


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: one MapInPandas, Arrow-batched."""
    return media.mapInPandas(decode_stats_batches, DECODED_SCHEMA)


def resize_exprs(w, h, target: int):
    """(scale, out_w, out_h) columns for a long-side-to-``target`` resize —
    THE single definition of the arithmetic (resize_plan and the catalog
    entry share it; two hand-maintained copies drifted once already).

    Zero/negative dims → null columns, not a job abort: plain `/` under
    Spark's default ANSI mode throws DIVIDE_BY_ZERO and kills the stage on
    a single degenerate row.

    Output dims use EXACT integer arithmetic floor(d * target / long_side):
    floor(d * scale) on the float scale loses the binding dimension by one
    pixel for many sizes (640/1077 * 1077 = 639.99… → 639) — the contract
    is that the long side comes out exactly ``target``. The double
    division below is exact at these magnitudes: the numerator is an
    integer ≪ 2^53 and any nonzero fractional part of the true quotient is
    ≥ 1/long_side ≫ one ulp, so floor cannot be off by one."""
    valid = (w > 0) & (h > 0)
    scale = F.when(valid, F.least(F.lit(target) / w, F.lit(target) / h))
    big = F.greatest(w, h)
    out_w = F.when(valid, F.floor((w.cast("bigint") * target) / big)).cast("int")
    out_h = F.when(valid, F.floor((h.cast("bigint") * target) / big)).cast("int")
    return scale, out_w, out_h


def resize_plan(media: DataFrame, target: int = 640) -> DataFrame:
    """Resize arithmetic (pure JVM — no pixels needed): the reference's
    resize step computes the target grid from (w, h) alone
    (process/image_process.py:59-61); emitting the plan keeps the expensive
    pixel work on the real-codec seam."""
    w = F.col("meta.width")
    h = F.col("meta.height")
    scale, out_w, out_h = resize_exprs(w, h, target)
    return media.select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 6).alias("scale"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
    )


def sample_frames_batches(n_sample: int):
    """mapInPandas factory: evenly sample ``n_sample`` frames per video
    payload (frame = equal byte slice under the fake codec), mirroring the
    reference's tile crop loop shape (one output row per tile/frame)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                nf = int(meta["n_frames"]) if meta and meta["n_frames"] else 1
                payload = payload or b""
                take = min(n_sample, nf)
                if take <= 0 or not len(payload):
                    continue
                # even-split byte bounds: frame i = payload[bounds[i]:
                # bounds[i+1]] — every byte belongs to exactly one frame
                # (fixed-width slicing both dropped the modulo tail and
                # sliced past the end for nf > len, emitting phantom
                # zero-byte frames)
                npay = len(payload)
                bounds = [i * npay // nf for i in range(nf + 1)]
                for j in range(take):
                    # evenly spaced frame indices over [0, nf)
                    fi = (j * nf) // take
                    chunk = payload[bounds[fi] : bounds[fi + 1]]
                    _, _, csum = _fake_decode_stats(chunk)
                    rows.append((media_id, fi, csum, len(chunk)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_checksum", "n_bytes"],
            )

    return gen


def sample_frames(media: DataFrame, n_sample: int = 4) -> DataFrame:
    return media.mapInPandas(sample_frames_batches(n_sample), FRAME_SCHEMA)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents table (no external
    data): payload = utf-8 text bytes (opaque to the operators), metadata
    derived from doc_id. Every 3rd row is a 'video' with n_frames > 1."""
    is_video = F.col("doc_id") % 3 == 0
    meta = F.struct(
        F.when(is_video, F.lit("video")).otherwise(F.lit("image")).alias("media_type"),
        (F.lit(320) + (F.col("doc_id") % 1280)).cast("int").alias("width"),
        (F.lit(240) + ((F.col("doc_id") * 3) % 960)).cast("int").alias("height"),
        F.when(is_video, (F.col("doc_id") % 7 + 2)).otherwise(F.lit(1))
        .cast("int")
        .alias("n_frames"),
        F.when(is_video, F.lit("fake-v1")).otherwise(F.lit("fake-i1")).alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )
