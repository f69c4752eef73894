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


def test_streaming_survives_null_turn_idx_and_ts(spark, tmp_path):
    """File sources force-nullable the declared schema, so one producer
    row with a null turn_idx (or ts) WILL reach the stream. It must pass
    through the extractor (null turn_idx preserved, grounding_cli degraded
    via the error column) instead of poison-pilling the micro-batch — the
    failed batch would replay the same file on every restart, wedging the
    checkpoint forever. Null event times must likewise not vanish from the
    windowed counts silently: they are filtered explicitly and surfaced as
    an observed per-batch metric."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkocr import datagen
    from sparkocr.streaming.extract_stream import run_once, windowed_turn_counts

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = {
        "conv_id": ["c0", "c0", "c0", "c1"],
        "turn_idx": [0, None, 1, None],
        "role": ["user"] * 4,
        "text": ["plain a", "<|ref|>x<|/ref|>", "plain b", "plain c"],
        "tool": ["plain", "grounding_cli", "plain", "plain"],
        "ts": [t0, t0, None, t0],
    }
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pq.write_table(
        pa.Table.from_pydict(rows, schema=datagen.SCHEMA),
        os.path.join(in_dir, "part-0.parquet"),
    )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_once(spark, in_dir, out, ckpt)
    got = spark.read.parquet(out).collect()
    assert len(got) == 4  # rows out == rows in, no crash loop
    by_text = {r["clean_text"]: r for r in got if r["clean_text"]}
    assert by_text["plain a"]["turn_idx"] == 0
    assert by_text["plain c"]["turn_idx"] is None
    cli = [r for r in got if r["tool"] == "grounding_cli"][0]
    assert cli["error"] and "null turn_idx" in cli["error"]

    # windowed counts: the null-ts row is excluded (it can join no
    # window) but observably — not a silent undercount
    q = (
        windowed_turn_counts(spark, in_dir, window="10 minutes")
        .writeStream.format("memory")
        .queryName("null_ts_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("complete")  # append emits only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    obs = [
        p.observedMetrics["turn_feed_quality"]
        for p in q.recentProgress
        if "turn_feed_quality" in p.observedMetrics
    ]
    assert any(m["n_null_ts"] == 1 and m["n_rows"] == 4 for m in obs), obs
    n = spark.sql("select sum(n_turns) s from null_ts_counts").first()["s"]
    assert n == 3


def test_streaming_dedup_drops_replayed_pages(spark, tmp_path):
    """At-least-once feed: the same (conv_id, turn_idx) delivered twice in
    one file AND replayed whole in a later file must extract exactly once;
    null-ts rows bypass the dedup (observably) instead of wedging state."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkocr import datagen
    from sparkocr.streaming.extract_stream import streaming_deduped_turns

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    # c2: two DISTINCT pages with null turn_idx and valid ts; last two:
    # two DISTINCT pages from different conversations whose conv_id was
    # omitted — the dedup key is (conv_id, turn_idx) and dropDuplicates
    # treats null keys as equal, so inside the dedup either pair would
    # collapse; all four must bypass
    rows = {
        "conv_id": ["c0", "c0", "c0", "c1", "c1", "c2", "c2", None, None],
        "turn_idx": [0, 0, 1, 0, 0, None, None, 0, 0],
        "role": ["user"] * 9,
        "text": ["dup a", "dup a", "uniq b", "null-ts c", "null-ts c",
                 "null-idx d", "null-idx e", "null-conv f", "null-conv g"],
        "tool": ["plain"] * 9,
        "ts": [t0, t0, t0, None, None, t0, t0, t0, t0],
    }
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    f0 = os.path.join(in_dir, "part-0.parquet")
    pq.write_table(pa.Table.from_pydict(rows, schema=datagen.SCHEMA), f0)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = (
            streaming_deduped_turns(spark, in_dir, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    q = run()
    got = spark.read.parquet(out).collect()
    # timestamped full-key pages deduped to one row each; BOTH null-ts
    # rows AND both distinct null-turn_idx rows pass through (bypass is
    # deliberate and observable)
    texts = sorted(r["clean_text"] for r in got)
    assert texts == ["dup a", "null-conv f", "null-conv g", "null-idx d",
                     "null-idx e", "null-ts c", "null-ts c", "uniq b"]
    # per-branch metrics (observes sit above the branch filters so the
    # null predicates stay pushable to the scan): bypass branch counts
    # its 6 rows split 2 null-ts / 4 null-key; dedup branch reports 3
    # valid rows in, 2 out (total feed = n_valid + n_bypass = 9, and the
    # engine-side drop = n_valid - n_deduped_out = 1, the "dup a" replay)
    obs = [
        p.observedMetrics["dedup_feed_quality"]
        for p in q.recentProgress
        if "dedup_feed_quality" in p.observedMetrics
    ]
    assert any(
        m["n_bypass"] == 6 and m["n_null_ts"] == 2 and m["n_null_key"] == 4
        for m in obs
    ), obs
    in_obs = [
        p.observedMetrics["dedup_in"]
        for p in q.recentProgress
        if "dedup_in" in p.observedMetrics
    ]
    assert any(m["n_valid"] == 3 for m in in_obs), in_obs
    out_obs = [
        p.observedMetrics["dedup_out"]
        for p in q.recentProgress
        if "dedup_out" in p.observedMetrics
    ]
    assert any(m["n_deduped_out"] == 2 for m in out_obs), out_obs

    # a whole-file replay (same rows, same ts, new file) within the
    # watermark adds NOTHING with a full key; null-keyed rows replay
    # through
    shutil.copy(f0, os.path.join(in_dir, "part-1.parquet"))
    run()
    texts2 = sorted(r["clean_text"] for r in spark.read.parquet(out).collect())
    assert texts2 == ["dup a", "null-conv f", "null-conv f", "null-conv g",
                      "null-conv g", "null-idx d", "null-idx d", "null-idx e",
                      "null-idx e", "null-ts c", "null-ts c", "null-ts c",
                      "null-ts c", "uniq b"]
