"""End-to-end corpus pipeline: transcripts → extract → dedup (exact +
near) → quality → decontaminate → split → pack → parquet, with honest
per-stage accounting."""

import os

import pytest


@pytest.fixture(scope="module")
def bench_file(spark, tiny_transcripts, tmp_path_factory):
    """Benchmark = a verbatim slice of one assembled document — the
    realistic contamination shape."""
    from sparkocr.assemble import assemble_docs_cli
    from sparkocr.extract.dispatch import extract_turns

    docs = assemble_docs_cli(
        extract_turns(spark.read.parquet(tiny_transcripts))
    ).collect()
    victim = max(docs, key=lambda r: len(r.doc_text or ""))
    words = (victim.doc_text or "").split()
    assert len(words) >= 30
    item = " ".join(words[5:30])
    path = str(tmp_path_factory.mktemp("bench") / "bench.parquet")
    spark.createDataFrame([(item,)], "text string").write.parquet(path)
    return path, victim.conv_id


def test_corpus_job_end_to_end(spark, tiny_transcripts, bench_file, tmp_path):
    from sparkocr.jobs.corpus_job import build_corpus
    from sparkocr.pipeline import caching

    bench_path, victim_conv = bench_file
    out = str(tmp_path / "corpus_out")
    counts = build_corpus(
        spark,
        tiny_transcripts,
        out,
        bench_path=bench_path,
        budget=512,
        min_words=3,
    )
    # monotone funnel: every stage keeps at most what the previous kept
    assert (
        counts["assembled_docs"]
        >= counts["after_exact_dedup"]
        >= counts["after_near_dedup"]
        >= counts["after_quality_filter"]
        > counts["after_decontamination"]
        == counts["packed_docs"]
        >= counts["packs"]
        > 0
    ), counts
    rows = spark.read.parquet(os.path.join(out, "corpus")).collect()
    convs = {r.conv_id for r in rows}
    assert victim_conv not in convs  # the contaminated doc is gone
    for r in rows:
        assert r.split in ("train", "val", "test")
        assert r.pack_id is not None and r.pack_pos >= 0
        assert r.n_tokens >= 3  # quality floor held
    assert caching.live_count() == 0  # scope released everything


def test_corpus_job_without_bench(spark, tiny_transcripts, tmp_path):
    from sparkocr.jobs.corpus_job import build_corpus

    out = str(tmp_path / "corpus_nobench")
    counts = build_corpus(spark, tiny_transcripts, out, budget=512, min_words=3)
    assert "after_decontamination" not in counts
    assert counts["packed_docs"] == counts["after_quality_filter"] > 0
