"""Rolling-hash chunk fingerprints: the vectorized numpy implementation
must equal an independent pure-python big-int implementation of the
documented polynomial (base 257, mod 2^31-1) — the property that makes the
fingerprints reproducible by any other service implementing the spec."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkocr.pipeline.textstats import (
    _BASE,
    _CHUNK_MASK,
    _MOD,
    _WINDOW,
    _rolling_chunk_fps_impl,
)


def _reference_fps(text: str) -> list[str]:
    """Big-int model: no numpy, no fixed-width arithmetic."""
    b = text.encode("utf-8")
    if len(b) < _WINDOW:
        return [hashlib.md5(b).hexdigest()[:12]] if b else []
    cuts = []
    for i in range(len(b) - _WINDOW + 1):
        h = 0
        for byte in b[i : i + _WINDOW]:
            h = (h * _BASE + byte) % _MOD
        if (h & _CHUNK_MASK) == _CHUNK_MASK:
            cuts.append(i + _WINDOW)
    bounds = [0, *cuts, len(b)]
    return [
        hashlib.md5(b[a:c]).hexdigest()[:12]
        for a, c in zip(bounds, bounds[1:])
        if c > a
    ]


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400))
def test_numpy_matches_bigint_model(text):
    import pandas as pd

    got = _rolling_chunk_fps_impl(pd.Series([text]))[0]
    assert list(got) == _reference_fps(text)


def test_identical_chunks_share_fingerprints():
    import pandas as pd

    a = "x" * 50 + "SHARED CONTENT BLOCK " * 20 + "y" * 50
    b = "p" * 80 + "SHARED CONTENT BLOCK " * 20 + "q" * 30
    fa = set(_rolling_chunk_fps_impl(pd.Series([a]))[0])
    fb = set(_rolling_chunk_fps_impl(pd.Series([b]))[0])
    # content-defined chunking: the shared middle yields shared chunk
    # fingerprints despite different surroundings
    assert fa & fb
