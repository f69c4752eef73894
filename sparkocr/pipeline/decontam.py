"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set.

The standard training-data hygiene step — a document sharing a long
token n-gram (default 13, the published GPT-3/PaLM convention) with a
benchmark item is contamination: training on it inflates eval scores.
At 10^12 documents the shape that works is asymmetric:

- the BENCHMARK side is tiny (eval suites are thousands of items):
  its distinct n-gram hashes build once and ride a broadcast;
- the CORPUS side explodes its n-grams map-side and probes the
  broadcast set — the exploded table (corpus x tokens rows) is never
  shuffled; only the matched rows (contaminated n-gram occurrences, a
  sliver) reach the per-doc aggregation.

Zero corpus-sized shuffles; the plan is scan → explode → broadcast
semi-probe → tiny agg (asserted in tests/test_decontam.py).

PRE-PROBE (the corpus-volume lever): materializing every corpus n-gram
costs corpus-tokens exploded rows even when the corpus is clean. Before
constructing a window's n-gram, its first ``prefix_probe`` tokens are
hashed and checked against the benchmark's distinct window-prefix set
(collected once — bounded by the tiny-benchmark invariant, capped at
``probe_cap`` and falling back loudly to the unfiltered plan beyond
it). Catalyst compiles the membership test to an InSet hash lookup, so
the filter runs inside the same JVM projection; only windows sharing a
benchmark prefix are expanded to full n-grams. Exactness is untouched:
a window whose prefix is absent from the benchmark prefix set cannot
match any benchmark n-gram, and surviving windows still face the exact
full-gram broadcast semi-join. On clean corpora this cuts the exploded
row count by orders of magnitude (measured in BENCH/BASELINE.md).

Normalization (both sides, one shared expression): lowercase, collapse
every non-alphanumeric run to a single space, whitespace-split. N-grams
hash with xxhash64 over the joined token window — 8 bytes per n-gram in
the broadcast instead of the strings themselves.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def _norm_tokens(text_col: str = "text"):
    """Normalized token array: lowercase, non-alphanumeric runs → one
    space, full trim, split. Null text → empty array (poison rows
    degrade to 'no n-grams', never a crashed task)."""
    # trim suffices: after the collapse every boundary char is ' '
    cleaned = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    )
    return F.when(
        F.col(text_col).isNull() | (F.length(cleaned) == 0), F.array()
    ).otherwise(F.split(cleaned, " "))


def _gram_positions(tokens_col, n: int):
    """array<int> of 1-based window start positions. Docs shorter than
    n tokens yield an EMPTY array — ``sequence(1, 0)`` is the DESCENDING
    [1, 0] in Spark, not empty (the same trap ``dedup._shingle_rows``
    guards), so the short case is explicit."""
    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)))


def _window_hash(tokens_col, pos, k: int):
    """xxhash64 over the k-token window starting at 1-based ``pos``."""
    return F.xxhash64(F.concat_ws(" ", F.slice(tokens_col, pos, k)))


def _ngram_hashes(tokens_col, n: int):
    """array<long> of xxhash64 over each n-token window (unfiltered)."""
    return F.transform(
        _gram_positions(tokens_col, n), lambda i: _window_hash(tokens_col, i, n)
    )


def _bench_prefix_set(
    bench: DataFrame, n: int, k: int, probe_cap: int
) -> list[int] | None:
    """The benchmark's distinct window-PREFIX hashes (first k tokens of
    each n-token window), collected driver-side. Bounded by the
    tiny-benchmark invariant; returns None past ``probe_cap`` (caller
    falls back to the unfiltered plan) with a visible warning, because a
    silently skipped optimization on a benchmark 100x the expected size
    is exactly the regression a pipeline owner needs to hear about."""
    toks = _norm_tokens()
    rows = (
        bench.select(
            F.explode(
                F.transform(
                    _gram_positions(toks, n), lambda i: _window_hash(toks, i, k)
                )
            ).alias("g")
        )
        .distinct()
        .limit(probe_cap + 1)
        .collect()
    )
    if len(rows) > probe_cap:
        warnings.warn(
            f"contamination_flags: benchmark prefix set exceeds probe_cap="
            f"{probe_cap}; pre-probe disabled, falling back to the "
            "unfiltered n-gram explode",
            stacklevel=3,
        )
        return None
    return [r.g for r in rows]


def _doc_gram_table(
    docs: DataFrame, n: int, k: int, probe_vals: list[int] | None
) -> DataFrame:
    """(doc_id, g) — one row per corpus n-gram occurrence, prefix-
    filtered when ``probe_vals`` is given. The filter runs inside the
    projection BEFORE the explode, so pruned windows never become rows."""
    toks = _norm_tokens()
    pos = _gram_positions(toks, n)
    if probe_vals is not None:
        if not probe_vals:  # benchmark holds no n-grams: nothing can match
            pos = F.filter(pos, lambda i: F.lit(False))
        else:
            pos = F.filter(
                pos, lambda i: _window_hash(toks, i, k).isin(probe_vals)
            )
    grams = F.transform(pos, lambda i: _window_hash(toks, i, n))
    return docs.select("doc_id", F.explode(grams).alias("g"))


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    prefix_probe: int = 2,
    probe_cap: int = 100_000,
) -> DataFrame:
    """Per-document contamination counts against the benchmark set.

    ``docs``: (doc_id, text). ``bench``: any frame with a ``text``
    column (one row per benchmark item). Returns one row per doc that
    matched: ``(doc_id, n_hits)`` where n_hits counts the doc's n-gram
    OCCURRENCES that appear anywhere in the benchmark (a doc repeating
    one contaminated n-gram k times counts k — the magnitude signal a
    pipeline ranks removals by). Docs with zero hits are absent
    (anti-join or ``decontaminate`` for the clean corpus).

    ``prefix_probe``: leading tokens per window hashed for the pre-probe
    filter (see module docstring); 0 disables it and restores the plain
    explode-everything plan. Result-identical either way — the pre-probe
    only prunes windows that cannot match.

    Null doc_ids group as ONE row (SQL groupBy null semantics): the
    count stays the honest total across them, but individual null-keyed
    docs cannot be located by id — ``decontaminate`` handles them
    fail-closed (see there)."""
    if n <= 0:
        raise ValueError(f"contamination_flags: n must be positive, got {n}")
    k = min(prefix_probe, n) if prefix_probe and prefix_probe > 0 else 0
    probe_vals = _bench_prefix_set(bench, n, k, probe_cap) if k else None
    bench_grams = (
        bench.select(F.explode(_ngram_hashes(_norm_tokens(), n)).alias("g"))
        .distinct()
    )
    doc_grams = _doc_gram_table(docs, n, k if probe_vals is not None else 0,
                                probe_vals)
    return (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    prefix_probe: int = 2,
) -> DataFrame:
    """The clean corpus: every input column, minus docs flagged by
    ``contamination_flags``. The flagged-id side is a sliver of the
    corpus; the anti-join leaves its strategy to AQE (broadcast when it
    fits, shuffle when a pathological benchmark flags half the corpus).

    The anti-join is ``dedup.drop_flagged`` — the shared NULL-SAFE
    fail-closed convention: a plain equi-anti-join never matches a null
    key, so a contaminated doc whose doc_id was lost would sail into the
    "clean" corpus — the exact outcome this operator exists to prevent.
    Null-id docs cannot be told apart by id, so if ANY of them is
    contaminated, ALL of them are removed; when none is flagged they all
    survive."""
    from sparkocr.pipeline.dedup import drop_flagged

    flagged = contamination_flags(
        docs, bench, n, prefix_probe=prefix_probe
    ).select("doc_id")
    return drop_flagged(docs, flagged)
