"""Multimodal binary-column plumbing: schema, Arrow batch shape, fake-codec
determinism, frame sampling, resize arithmetic, and the real-codec seam."""

import pytest

from sparkocr.pipeline.multimodal import (
    _fake_decode_stats,
    decode_image_real,
    decode_stats,
    resize_plan,
    sample_frames,
    synth_media,
)


def test_real_codec_seam_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x00", {})


def test_fake_decode_deterministic():
    a = _fake_decode_stats(b"hello world")
    assert a == _fake_decode_stats(b"hello world")
    assert a[0] == 11
    assert _fake_decode_stats(b"") == (0, 0.0, 0)
    assert _fake_decode_stats(None) == (0, 0.0, 0)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (10 + i)) for i in range(12)], "doc_id long, text string"
    )
    return synth_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta_names = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_names == ["media_type", "width", "height", "n_frames", "codec"]


def test_decode_stats(media, spark):
    out = {r.media_id: r for r in decode_stats(media).collect()}
    assert len(out) == 12
    r0 = out[0]
    assert r0.n_bytes == 10  # "x"*10
    assert r0.mean_byte == float(ord("x"))
    assert r0.width == 320 and r0.height == 240
    # checksum stable across two runs (separate spark jobs)
    again = {r.media_id: r.checksum for r in decode_stats(media).collect()}
    assert all(out[k].checksum == again[k] for k in out)


def test_resize_plan(media):
    rows = {r.media_id: r for r in resize_plan(media, target=640).collect()}
    for r in rows.values():
        # the long side comes out EXACTLY target (float floor(d*scale)
        # produced target-1 for sizes like 1077 — 640/1077*1077 = 639.99…)
        assert max(r.out_w, r.out_h) == 640
        big = max(r.width, r.height)
        assert r.out_w == r.width * 640 // big
        assert r.out_h == r.height * 640 // big


def test_sample_frames(media):
    rows = [r for r in sample_frames(media, n_sample=4).collect()]
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    # videos are media_id % 3 == 0 with n_frames = id % 7 + 2; stills get 1
    for mid, frames in by_media.items():
        expected = min(4, mid % 7 + 2) if mid % 3 == 0 else 1
        assert len(frames) == expected, (mid, len(frames))
        idxs = [f.frame_idx for f in frames]
        assert idxs == sorted(set(idxs)), "even sampling must not repeat frames"
    # frame checksums deterministic
    again = {(r.media_id, r.frame_idx): r.frame_checksum
             for r in sample_frames(media, n_sample=4).collect()}
    for r in rows:
        assert again[(r.media_id, r.frame_idx)] == r.frame_checksum


# ---------------------------------------------------------------------------
# real-codec branch (stdlib BMP/PPM; checked-in fixtures)
# ---------------------------------------------------------------------------

def _fixture(name):
    import os

    return open(
        os.path.join(os.path.dirname(__file__), "fixtures", name), "rb"
    ).read()


def test_real_decode_checked_in_bmp():
    """The checked-in 8x5 24-bit BMP decodes with the stdlib parser —
    exact dims and the gradient's known mean pixel value (98.5),
    computed over channel bytes with row padding EXCLUDED."""
    from sparkocr.pipeline.multimodal import decode_image_real

    w, h, mean = decode_image_real(_fixture("gradient_8x5.bmp"))
    assert (w, h) == (8, 5)
    assert mean == pytest.approx(98.5)


def test_real_decode_checked_in_ppm():
    from sparkocr.pipeline.multimodal import decode_image_real

    w, h, mean = decode_image_real(_fixture("gradient_6x4.ppm"))
    assert (w, h) == (6, 4)
    assert mean == pytest.approx(106.5)


def test_real_decode_roundtrip_random():
    """Encode arbitrary pixels to BMP in-test (independent encoder),
    decode with the operator's parser: dims and mean must match numpy's
    own, including non-multiple-of-4 row strides (padding bytes)."""
    import struct

    import numpy as np

    from sparkocr.pipeline.multimodal import decode_image_real

    rng = np.random.default_rng(7)
    for (h, w) in [(3, 3), (1, 7), (5, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        stride = ((w * 3 + 3) // 4) * 4
        rows = []
        for r in range(h - 1, -1, -1):
            bgr = px[r][:, ::-1].tobytes()
            rows.append(bgr + b"\x00" * (stride - len(bgr)))
        data = b"".join(rows)
        offset = 54
        payload = (
            struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
            )
            + data
        )
        dw, dh, mean = decode_image_real(payload)
        assert (dw, dh) == (w, h)
        assert mean == pytest.approx(float(px.mean()))


def test_compressed_codecs_remain_the_seam():
    """JPEG/PNG magic still raises — the explicit cluster-side seam."""
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0" + b"\x00" * 64)


def test_magic_dispatch_is_strict():
    """Text that merely STARTS with a magic ('BM...', 'P6...') must not
    alias into the real branch: size validation rejects it and the fake
    codec (meta dims, byte mean) applies unchanged."""
    from sparkocr.pipeline.multimodal import try_decode_real

    assert try_decode_real(b"BMW dealers met on P6 highway " * 4) is None
    assert try_decode_real(b"P6 is a motorway\n255\n") is None
    assert try_decode_real(b"") is None
    assert try_decode_real(None) is None


def test_decode_stats_dispatches_real_rows(spark):
    """End-to-end: a media frame mixing one real BMP payload with fake
    text payloads — the BMP row reports DECODED dims/mean (ignoring its
    meta dims), the text rows keep the fake-codec stats."""
    from pyspark.sql import functions as F

    from sparkocr.pipeline.multimodal import synth_media

    bmp = _fixture("gradient_8x5.bmp")
    docs = spark.createDataFrame(
        [(1, "plain text payload"), (2, "another doc")],
        "doc_id long, text string",
    )
    media = synth_media(docs).unionByName(
        spark.createDataFrame(
            [(99, bytearray(bmp))], "media_id long, payload binary"
        ).select(
            "media_id",
            "payload",
            F.struct(
                F.lit("image").alias("media_type"),
                F.lit(9999).alias("width"),  # wrong on purpose: decoded wins
                F.lit(9999).alias("height"),
                F.lit(1).alias("n_frames"),
                F.lit("bmp").alias("codec"),
            ).alias("meta"),
        )
    )
    out = {r.media_id: r for r in decode_stats(media).collect()}
    real = out[99]
    assert (real.width, real.height) == (8, 5)
    assert real.mean_byte == pytest.approx(98.5)
    assert real.n_bytes == len(bmp)
    fake = out[1]
    assert fake.width == 321 and fake.mean_byte is not None


def test_ppm_parser_terminates_on_truncated_headers():
    """A 'P6'-prefixed payload whose header scan runs off the end must
    return None, not spin forever (the scans are bounded; past-the-end
    slices yield b'' whose isspace() is False)."""
    import signal

    from sparkocr.pipeline.multimodal import try_decode_real

    def _alarm(*_):
        raise TimeoutError("parser hung")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(5)
    try:
        for payload in (
            b"P6", b"P6 ", b"P6abc", b"P6\n# comment with no newline",
            b"P6\n12", b"P6\n12 34", b"P6\n12 34 255",
        ):
            assert try_decode_real(payload) is None, payload
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
