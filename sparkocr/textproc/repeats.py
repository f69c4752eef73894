"""Windowed n-gram repeat detector — QC analog of the reference's
NoRepeatNGramLogitsProcessor (process/ngram_norepeat.py:7-40).

The reference *bans* a token that would complete an n-gram already present
in the trailing ``window_size`` tokens, whitelisting table-cell tags
``<td>``/``</td>`` (run_dpsk_ocr_pdf.py:52). As a post-hoc QC operator we
*flag* text in which some n-gram occurs twice within a window — exactly the
condition the logits processor prevents — skipping n-grams that contain a
whitelisted token.

Per-entry-point parameters (SURVEY.md §2.3 N6): image n=30/w=90,
pdf n=20/w=50, batch n=40/w=90.
"""

from __future__ import annotations

import re

import numpy as np

from sparkocr.textproc.rollhash import rolling_window_hashes

WHITELIST = frozenset({"<td>", "</td>"})
_TOKEN_RE = re.compile(r"<td>|</td>|\w+|[^\w\s]", re.UNICODE)

PARAMS = {  # (ngram_size, window_size)
    "image": (30, 90),
    "pdf": (20, 50),
    "batch": (40, 90),
}


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


_HASH_BASE = 1000003
_HASH_MOD = (1 << 61) - 1

#: Token count at which the numpy formulation overtakes the rolling
#: interpreter loop (measured crossover ~250 on this box: per-call array
#: overhead vs ~0.7 µs/gram loop cost). Typical OCR turns sit well under
#: it; the numpy path halves the worst case on long pages.
_NUMPY_MIN_TOKENS = 256


def find_repeat(text: str, ngram_size: int = 20, window_size: int = 50):
    """Return the START token index of the second (repeating) n-gram
    occurrence (NOT the index where the repeat completes — callers slicing
    at this position get the beginning of the repeated run), or
    None. An n-gram repeats if an identical n-gram starts within
    ``window_size`` tokens back (matching the processor's trailing-window
    scan, ngram_norepeat.py:22-31). N-grams containing a whitelisted token
    never count (whitelist semantics, ngram_norepeat.py:33).

    Implementation: rolling polynomial hash over per-token ``hash()``
    values — O(1) per position instead of building and hashing an
    n-token tuple. ``map(hash, toks)`` is one C loop (CPython caches a
    str's hash in the object, so re-hashing repeated tokens is a field
    read); the process hash salt makes the polynomial non-adversarial,
    and the OUTPUT stays salt-independent because a hash hit is verified
    by actual token-slice comparison before returning — a collision can
    never produce a false positive (it could only hide a later repeat,
    p ≈ 2^-61 per pair). Two formulations, differentially verified
    identical, dispatched on token count (``_NUMPY_MIN_TOKENS``): short
    texts take the interpreter loop, long texts the numpy prefix-trick
    sweep (``textproc.rollhash`` — two cumulative scans; a stable
    argsort groups equal gram hashes so each gram's chain-predecessor,
    the loop's ``last[h]``, is simply the previous group member, and
    in-window candidates verify in ascending order = the loop's
    first-verified-hit). The whitelist prefix array is built only when
    the raw text can contain a whitelisted token at all (substring
    probe — one C scan vs a per-token Python loop)."""
    toks = tokenize(text)
    n = ngram_size
    # two occurrences of an n-gram can OVERLAP (a run of n+1 identical
    # tokens repeats its n-gram at distance 1), so the minimum length for
    # any repeat is n+1 tokens, not 2n
    if len(toks) < n + 1:
        return None
    # Window condition derived from the processor: at generation index
    # p (= i + n - 1 here), it scans prior n-grams starting at
    # max(0, p - window)..p - n, i.e. start distance i - j may be up to
    # window_size - n + 1 (ngram_norepeat.py:25-27).
    limit = window_size - n + 1
    if len(toks) >= _NUMPY_MIN_TOKENS:
        return _find_repeat_numpy(toks, text, n, limit)
    return _find_repeat_loop(toks, text, n, limit)


def _whitelist_prefix(toks: list, text: str):
    """Prefix count of whitelisted tokens (list), or None when the raw
    text cannot contain one at all — a whitelisted token can only arise
    from its literal substring (the tokenizer matches them verbatim).
    Derived from WHITELIST so a future whitelist edit cannot silently
    detune the probe."""
    if not any(w in text for w in WHITELIST):
        return None
    pw = [0] * (len(toks) + 1)
    acc = 0
    for k, t in enumerate(toks):
        if t in WHITELIST:
            acc += 1
        pw[k + 1] = acc
    return pw


def _find_repeat_loop(toks: list, text: str, n: int, limit: int):
    """The short-text formulation: one rolling hash + a last-seen dict."""
    tid = list(map(hash, toks))
    pw = _whitelist_prefix(toks, text)
    B, MOD = _HASH_BASE, _HASH_MOD
    pow_n = pow(B, n - 1, MOD)
    h = 0
    for k in range(n):
        h = (h * B + tid[k]) % MOD
    last: dict[int, int] = {}
    for i in range(len(toks) - n + 1):
        if i:
            h = ((h - tid[i - 1] * pow_n) * B + tid[i + n - 1]) % MOD
        if pw is None or pw[i + n] == pw[i]:  # no whitelisted token in gram
            j = last.get(h)
            if (
                j is not None
                and i - j <= limit
                and toks[j : j + n] == toks[i : i + n]
            ):
                return i
            last[h] = i
    return None


def _find_repeat_numpy(toks: list, text: str, n: int, limit: int):
    """The long-text formulation: vectorized window hashes + stable-sort
    predecessor chaining (see find_repeat docstring for the equivalence
    argument)."""
    # int64 hash values wrap to uint64 verbatim
    tid = np.fromiter(map(hash, toks), dtype=np.int64, count=len(toks))
    hs = rolling_window_hashes(tid.astype(np.uint64), n)
    starts = None
    pw = _whitelist_prefix(toks, text)
    if pw is not None:
        cw = np.asarray(pw)
        allowed = cw[n:] == cw[: hs.size]  # no whitelisted token in gram
        starts = np.flatnonzero(allowed)
        hs = hs[starts]
    if hs.size < 2:
        return None
    order = np.argsort(hs, kind="stable")  # equal hashes keep gram order
    sh = hs[order]
    si = order if starts is None else starts[order]
    same = sh[1:] == sh[:-1]
    prev_i = si[:-1][same]
    cur_i = si[1:][same]
    near = (cur_i - prev_i) <= limit
    if not near.any():
        return None
    # candidates are rare (collisions astronomically so): verify slices
    # in ascending repeat position, first confirmed hit wins
    cand = sorted(
        zip(prev_i[near].tolist(), cur_i[near].tolist()),
        key=lambda t: t[1],
    )
    for j, i in cand:
        if toks[j : j + n] == toks[i : i + n]:
            return int(i)
    return None


def has_repeat(text: str, mode: str = "pdf") -> bool:
    n, w = PARAMS[mode]
    return find_repeat(text, n, w) is not None
