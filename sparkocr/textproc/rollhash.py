"""Shared O(n) rolling polynomial window hash (numpy, mod 2^64).

One construction serves two hot paths: the Arrow rolling-hash MinHash
(``pipeline.minhash_fast``, byte windows) and the windowed repeat
detector (``textproc.repeats``, token-hash windows). Lives here —
pyspark-free — so extraction workers importing ``repeats`` never pull
the pipeline layer.
"""

from __future__ import annotations

import numpy as np

#: FNV-1a 64-bit prime: odd, hence invertible mod 2^64 (required by the
#: prefix trick), and well-mixed low bits under repeated multiplication
ROLL_B = 0x100000001B3


def rolling_window_hashes(vals: "np.ndarray", k: int) -> "np.ndarray":
    """uint64 degree-``k`` polynomial hash of every k-wide window of
    ``vals`` (a uint64 array), via the invertible-base prefix trick:
    with ``B`` odd, ``P[i] = B^i · Σ_{j≤i} c[j]·B^{-j}``, so every
    window hash is two cumulative scans plus elementwise ops — O(n)
    total, no O(n·k) inner loop. numpy uint64 overflow wraps, which IS
    arithmetic mod 2^64 (intended). Empty result when fewer than ``k``
    values."""
    n = vals.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    b = np.uint64(ROLL_B)
    binv = np.uint64(pow(ROLL_B, -1, 2**64))
    # errstate silences the overflow RuntimeWarning some builds emit
    with np.errstate(over="ignore"):
        powsinv = np.empty(n, dtype=np.uint64)
        powsinv[0] = 1
        np.cumprod(np.full(n - 1, binv, dtype=np.uint64), out=powsinv[1:])
        s = np.cumsum(vals * powsinv, dtype=np.uint64)
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = 1
        np.cumprod(np.full(n - 1, b, dtype=np.uint64), out=pows[1:])
        # window [i, i+k): H_i = B^{i+k-1} · (s[i+k-1] - s[i-1]), s[-1]=0
        hi = s[k - 1 :].copy()
        hi[1:] -= s[: n - k]
        return pows[k - 1 :] * hi
