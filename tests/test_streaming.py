"""Streaming extraction: same extractor under readStream, exactly-once via
sink checkpoint (availableNow trigger, deterministic)."""

import os
import shutil

import pytest


@pytest.fixture()
def stream_dirs(tmp_path, tiny_transcripts):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    shutil.copy(tiny_transcripts, os.path.join(d["in"], "part-0.parquet"))
    return d


def test_streaming_matches_batch(spark, stream_dirs, tiny_transcripts):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.streaming.extract_stream import run_once

    run_once(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    got = spark.read.parquet(stream_dirs["out"])
    want = extract_turns(spark.read.parquet(tiny_transcripts), min_parallelism=0)
    key = lambda r: (r["conv_id"], r["turn_idx"])
    g = sorted(got.collect(), key=key)
    w = sorted(want.collect(), key=key)
    assert len(g) == len(w)
    for a, b in zip(g, w):
        assert a["clean_text"] == b["clean_text"]
        assert a["spans"] == b["spans"]
        assert a["is_truncated"] == b["is_truncated"]


def test_windowed_turn_counts_matches_batch(spark, stream_dirs, tiny_transcripts):
    from pyspark.sql import functions as F

    from sparkocr.streaming.extract_stream import windowed_turn_counts

    q = (
        windowed_turn_counts(spark, stream_dirs["in"])
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.win_start, r.tool): (r.n_turns, r.n_chars)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r.ws, r.tool): (r.n_turns, r.n_chars)
        for r in spark.read.parquet(tiny_transcripts)
        .groupBy(
            F.window("ts", "10 minutes").alias("win"), "tool"
        )
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum(F.length("text")).alias("n_chars"))
        .select(F.col("win.start").alias("ws"), "tool", "n_turns", "n_chars")
        .collect()
    }
    assert got == want and len(got) > 1


def test_streaming_exactly_once_on_restart(spark, stream_dirs, tiny_transcripts):
    from sparkocr.streaming.extract_stream import run_once

    run_once(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    n1 = spark.read.parquet(stream_dirs["out"]).count()
    # rerun with the same checkpoint: already-processed files are skipped
    run_once(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    n2 = spark.read.parquet(stream_dirs["out"]).count()
    assert n1 == n2
    # new file arrives -> only its rows are appended
    shutil.copy(tiny_transcripts, os.path.join(stream_dirs["in"], "part-1.parquet"))
    run_once(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    n3 = spark.read.parquet(stream_dirs["out"]).count()
    assert n3 == 2 * n1
