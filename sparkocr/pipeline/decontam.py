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

Normalization (both sides, one shared expression): lowercase, collapse
every non-alphanumeric run to a single space, whitespace-split. N-grams
hash with xxhash64 over the joined token window — 8 bytes per n-gram in
the broadcast instead of the strings themselves.
"""

from __future__ import annotations

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


def _ngram_hashes(tokens_col, n: int):
    """array<long> of xxhash64 over each n-token window. Docs shorter
    than n tokens yield an EMPTY array — ``sequence(1, 0)`` is the
    DESCENDING [1, 0] in Spark, not empty (the same trap
    ``dedup._shingle_explode`` guards), so the short case is explicit."""
    return F.when(F.size(tokens_col) < n, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens_col, i, n))),
        )
    )


def contamination_flags(
    docs: DataFrame, bench: DataFrame, n: int = 13
) -> DataFrame:
    """Per-document contamination counts against the benchmark set.

    ``docs``: (doc_id, text). ``bench``: any frame with a ``text``
    column (one row per benchmark item). Returns one row per doc that
    matched: ``(doc_id, n_hits)`` where n_hits counts the doc's n-gram
    OCCURRENCES that appear anywhere in the benchmark (a doc repeating
    one contaminated n-gram k times counts k — the magnitude signal a
    pipeline ranks removals by). Docs with zero hits are absent
    (anti-join or ``decontaminate`` for the clean corpus).

    Null doc_ids group as ONE row (SQL groupBy null semantics): the
    count stays the honest total across them, but individual null-keyed
    docs cannot be located by id — ``decontaminate`` handles them
    fail-closed (see there)."""
    if n <= 0:
        raise ValueError(f"contamination_flags: n must be positive, got {n}")
    bench_grams = (
        bench.select(F.explode(_ngram_hashes(_norm_tokens(), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        "doc_id", F.explode(_ngram_hashes(_norm_tokens(), n)).alias("g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 13) -> DataFrame:
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

    flagged = contamination_flags(docs, bench, n).select("doc_id")
    return drop_flagged(docs, flagged)
