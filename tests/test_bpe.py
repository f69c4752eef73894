"""Vendored BPE token counter: reproducible artifact, differential
Spark-vs-pure-Python counts, and the corpus_job --size-col seam."""

import os

import pytest


def _ranks():
    from sparkocr.pipeline.bpe import load_default_ranks

    return load_default_ranks()


def test_vendored_merges_reproducible(tmp_path):
    """The checked-in merges file regenerates bit-identically from the
    repo's own deterministic fixture corpus — the artifact carries no
    information that the trainer + datagen cannot reproduce."""
    import pyarrow.parquet as pq

    from sparkocr.datagen import write_transcripts
    from sparkocr.pipeline.bpe import dump_merges, train_merges

    p = str(tmp_path / "tiny.parquet")
    write_transcripts(p, "tiny")
    texts = [t for t in pq.read_table(p).column("text").to_pylist() if t]
    regen = dump_merges(train_merges(texts, 1024))
    vendored = open(
        os.path.join(
            os.path.dirname(__file__), "..", "sparkocr", "resources",
            "bpe_merges.txt",
        )
    ).read()
    assert regen == vendored


def test_encoder_basics():
    """Counting contract: merges compress (count <= bytes), unmergeable
    input counts its bytes, empty/None behave like the other counters."""
    from sparkocr.pipeline.bpe import count_text, encode_len

    ranks = _ranks()
    # a word made of bytes the fixture corpus never pairs: one token per
    # byte (\x01 is not in any merge)
    assert encode_len(b"\x01\x01\x01", ranks) == 3
    # real fixture-like words compress below their byte length
    w = "the"
    assert 1 <= encode_len(w.encode(), ranks) <= len(w)
    assert count_text("", ranks) == 0
    assert count_text(None, ranks) is None
    assert count_text("  \t ", ranks) == 0
    # whole-text = sum over \S+ words (whitespace carries no tokens)
    assert count_text("a b", ranks) == count_text("a", ranks) + count_text(
        "b", ranks
    )


def test_spark_column_matches_reference(spark, tiny_transcripts):
    """Differential oracle: the Arrow-batched column equals the pure-
    Python encoder on every fixture text (incl. nulls)."""
    from pyspark.sql import functions as F

    from sparkocr.pipeline.bpe import bpe_token_count_col, count_text

    ranks = _ranks()
    rows = (
        spark.read.parquet(tiny_transcripts)
        .select("conv_id", "turn_idx", "text")
        .withColumn("n_bpe", bpe_token_count_col())
        .collect()
    )
    assert len(rows) > 50
    mismatches = [
        (r.conv_id, r.turn_idx)
        for r in rows
        if r.n_bpe != count_text(r.text, ranks)
    ]
    assert mismatches == []
    # and the count is never larger than the UTF-8 byte length
    for r in rows:
        if r.text and r.text.strip():
            assert 0 < r.n_bpe <= len(r.text.encode("utf-8"))


def test_corpus_job_packs_by_bpe(spark, tiny_transcripts, tmp_path):
    """--size-col n_bpe_tokens routes the vendored counter through the
    whole job: written n_tokens equal the reference encoder's counts on
    the written text, and every multi-doc pack respects the budget."""
    from sparkocr.jobs.corpus_job import build_corpus
    from sparkocr.pipeline.bpe import count_text

    out = str(tmp_path / "corpus_bpe")
    counts = build_corpus(
        spark, tiny_transcripts, out, budget=512, min_words=1,
        size_col="n_bpe_tokens",
    )
    assert counts["packed_docs"] > 0
    rows = spark.read.parquet(os.path.join(out, "corpus")).collect()
    ranks = _ranks()
    for r in rows:
        assert r.n_tokens == count_text(r.text, ranks)
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in by_pack.items():
        if len(members) > 1:
            assert sum(m.n_tokens for m in members) <= 512, pid


def test_long_unbroken_word_is_windowed():
    """A whitespace-free megabyte run (minified HTML / base64 blob —
    common crawl payloads) must encode in bounded time via independent
    windows, and the windowed count must equal the sum of its windows'
    counts."""
    import time

    from sparkocr.pipeline.bpe import _MAX_WORD_BYTES, encode_len

    ranks = _ranks()
    blob = (b"abcdefgh" * 131072) + b"xyz"  # ~1 MB + ragged tail
    t0 = time.monotonic()
    n = encode_len(blob, ranks)
    assert time.monotonic() - t0 < 10
    want = sum(
        encode_len(blob[i:i + _MAX_WORD_BYTES], ranks)
        for i in range(0, len(blob), _MAX_WORD_BYTES)
    )
    assert n == want > 0
