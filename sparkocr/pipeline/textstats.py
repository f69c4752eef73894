"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, language ID, fingerprinting.

All hot-path logic is JVM built-ins (regexp/length/replace) so Catalyst
keeps it inside whole-stage codegen; each operator has an exact ANSI-SQL
mirror for the DuckDB oracle. The rolling-hash fingerprint (content-defined
chunking) is the one Arrow-batched numpy step (no SQL analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

WORD_RE = "[A-Za-z0-9]+"

# occurrence counter identical in Spark SQL and DuckDB:
#   (length(t) - length(replace(t, s, ''))) / length(s)
_EN_STOPS = [" the ", " and ", " of ", " to ", " a "]
_DE_STOPS = [" der ", " die ", " und ", " das ", " ein "]
_FR_STOPS = [" le ", " la ", " et ", " les ", " des "]
_ES_STOPS = [" el ", " la ", " y ", " los ", " que "]

LANGS = {"en": _EN_STOPS, "de": _DE_STOPS, "fr": _FR_STOPS, "es": _ES_STOPS}


def _occurrences(col, s: str):
    return (F.length(col) - F.length(F.replace(col, F.lit(s), F.lit("")))) / F.lit(len(s))


def _occurrences_sql(col: str, s: str) -> str:
    esc = s.replace("'", "''")
    return f"(length({col}) - length(replace({col}, '{esc}', ''))) / {len(s)}"


def _lang_score(col, lang: str):
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    score = None
    for s in LANGS[lang]:
        o = _occurrences(padded, s)
        score = o if score is None else score + o
    return score * F.lit(1000.0) / (F.length(col) + F.lit(1))


def lang_score_sql(col: str, lang: str) -> str:
    padded = f"(' ' || lower({col}) || ' ')"
    parts = " + ".join(_occurrences_sql(padded, s) for s in LANGS[lang])
    return f"(({parts}) * 1000.0 / (length({col}) + 1))"


def ws_token_count_col(text_col: str = "text"):
    """THE whitespace-token count expression — shared by ``token_counts``
    and ``packing.pack_sequences`` so the two can never disagree. Counted
    as non-overlapping ``\\S+`` runs: value-identical to trimming full
    whitespace and splitting on ``\\s+`` (verified cell-for-cell on the
    bench corpus), but one regex scan with no per-row token-array
    allocation — the split-based form was 2x slower and dominated the
    corpus job's quality stage. Null text propagates null (callers that
    need a number coalesce)."""
    return F.regexp_count(F.col(text_col), F.lit(r"\S+"))


def word_token_count_col(text_col: str = "text"):
    """THE regex-token count expression (WORD_RE, the BPE-ish tokenizer
    stand-in) — shared by ``token_counts`` and ``corpus_job``'s
    ``--size-col`` packing hook so the two can never disagree. Null text
    propagates null (pack_sequences coalesces to 0)."""
    return F.regexp_count(F.col(text_col), F.lit(WORD_RE))


def token_counts(docs: DataFrame, fingerprint: bool = False) -> DataFrame:
    """Word + regex-token counts per document (JVM regexp, no UDF).

    Empty/whitespace-only text counts 0 whitespace tokens — the guard
    strips ALL whitespace classes (``trim()`` strips only spaces, so
    tab/newline-only text would otherwise count phantom tokens).
    ``fingerprint`` appends the md5 whole-document fingerprint column (the
    exact-dup key) in the same projection — one scan instead of a separate
    fingerprint pass."""
    ws = ws_token_count_col()
    cols = [
        F.col("doc_id"),
        ws.alias("n_ws_tokens"),
        word_token_count_col().alias("n_word_tokens"),
        F.length("text").alias("n_chars"),
    ]
    if fingerprint:
        from sparkocr.pipeline.dedup import _dedup_key

        # the SAME key definition dedup groups on (full md5, null-text
        # rows keyed by doc_id) — a truncated or null-collapsing variant
        # here would hand callers a subtly different dup relation
        cols.append(_dedup_key().alias("fp"))
    return docs.select(*cols)


def quality_scores(docs: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length, punctuation density,
    stopword ratio, mean word length — the boilerplate/garbage signals a
    corpus filter thresholds on."""
    n_words = F.size(F.regexp_extract_all("text", F.lit(WORD_RE), F.lit(0)))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    n_stop = _occurrences(F.concat(F.lit(" "), F.lower("text"), F.lit(" ")), " the ")
    word_chars = F.length(F.regexp_replace("text", r"[^A-Za-z0-9]", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_punct / (F.length("text") + 1), 6).alias("punct_ratio"),
        F.round(n_stop / (n_words + 1), 6).alias("stopword_ratio"),
        F.round(word_chars / (n_words + 1), 6).alias("mean_word_len"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-density language ID over {en,de,fr,es}: argmax of per-lang
    scores, 'und' when every score is 0. Pure JVM expressions."""
    # coalesce: a NULL text must score 0 and predict 'und' like empty
    # text does — raw NULL propagates through concat/length into a NULL
    # lang_pred (the when-chain falls through), a surprise third bucket
    scored = docs.select(
        "doc_id",
        *[
            F.round(_lang_score(F.coalesce(F.col("text"), F.lit("")), l), 6).alias(
                f"score_{l}"
            )
            for l in LANGS
        ],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for l in LANGS:  # first-match tie-break in fixed lang order
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select("doc_id", pred.alias("lang_pred"), *[f"score_{l}" for l in LANGS])


def md5_fingerprints(docs: DataFrame) -> DataFrame:
    """Whole-document fingerprint — THE exact-dup key, one definition
    shared with dedup (``dedup._dedup_key``): full 128-bit md5 (a 64-bit
    prefix is birthday-certain to collide past ~4e9 docs, i.e. well inside
    this module's claimed scale), null-text docs keyed by their own doc_id
    (md5(NULL) is NULL and grouping on it would collapse every null-text
    doc into one bogus duplicate group)."""
    from sparkocr.pipeline.dedup import _dedup_key

    return docs.select("doc_id", _dedup_key().alias("fp"))


# --------------------------------------------------------------------------
# Rolling-hash content-defined chunk fingerprints (Rabin-Karp style):
# Arrow-batched numpy, no per-row Python UDF; oracle replays it positionally
# --------------------------------------------------------------------------

_BASE = 257
# Mersenne prime 2^31-1: every term (byte * pow < 2^8 * 2^31) and the
# 16-term window sum (< 2^43) stay inside int64, so the vectorized
# arithmetic computes the TRUE polynomial hash mod _MOD. A 2^61-1 modulus
# would silently overflow int64 in the products, yielding a
# wrap-then-mod function no independent reimplementation of the
# documented hash could reproduce (pinned by the big-int differential
# test in tests/test_chunk_fps.py).
_MOD = (1 << 31) - 1
_WINDOW = 16
_CHUNK_MASK = (1 << 6) - 1  # ~64-byte expected chunk length


def _rolling_chunk_fps_impl(texts: pd.Series) -> pd.Series:
    """Per doc: rolling-hash boundaries → md5 of each chunk (first 12 hex).
    Used for near-dup detection at sub-document granularity."""
    import hashlib

    import numpy as np

    out = []
    for t in texts.fillna(""):
        b = t.encode("utf-8")
        if len(b) < _WINDOW:
            out.append([hashlib.md5(b).hexdigest()[:12]] if b else [])
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        n = len(arr)
        # rolling hash over a fixed window, vectorized via cumulative powers
        pows = np.empty(_WINDOW, dtype=np.int64)
        p = 1
        for i in range(_WINDOW):
            pows[_WINDOW - 1 - i] = p
            p = (p * _BASE) % _MOD
        # accumulate per window POSITION, not per window: the elementwise
        # (n-15, 16) product array costs ~128 bytes per input byte (a
        # 10 MB doc would materialize a ~1.3 GB temp inside the UDF);
        # summing 16 shifted O(n) slices keeps peak memory O(n). Terms
        # stay < 2^39 and the 16-term sum < 2^43 — inside int64, so the
        # math is bit-identical to the windowed form.
        m = n - _WINDOW + 1
        h = np.zeros(m, dtype=np.int64)
        for j in range(_WINDOW):
            h += arr[j : j + m] * pows[j]
        h %= _MOD
        cuts = np.flatnonzero((h & _CHUNK_MASK) == _CHUNK_MASK) + _WINDOW
        bounds = [0, *cuts.tolist(), n]
        fps = []
        for a, bnd in zip(bounds, bounds[1:]):
            if bnd > a:
                fps.append(hashlib.md5(b[a:bnd]).hexdigest()[:12])
        out.append(fps)
    return pd.Series(out)


def rolling_chunk_fps():
    """Arrow-batched UDF handle (created lazily: pandas_udf needs an active
    session to parse its return type)."""
    return pandas_udf(_rolling_chunk_fps_impl, "array<string>")


def chunk_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", rolling_chunk_fps()("text").alias("chunk_fps"))
