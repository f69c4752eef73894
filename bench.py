"""Headline benchmark — one JSON line for the driver.

Runs the extraction DAG over the deterministic bench-profile transcript
table (generated once, cached under ./data/) plus headline catalog queries
over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output: {"metric": "headline_suite_sec", "value": <total sec>, "unit":
"sec", "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import time


def main() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_parquet = os.environ.get(
        "SPARKOCR_BENCH_DATA",
        os.path.join(os.path.dirname(__file__), "data", "transcripts_bench_lg.parquet"),
    )
    if not os.path.exists(bench_parquet):
        d = os.path.dirname(bench_parquet)
        if d:
            os.makedirs(d, exist_ok=True)
        from sparkocr.datagen import write_transcripts

        write_transcripts(bench_parquet, "bench_lg")

    import __spark_entry__ as entry_mod
    from sparkocr.assemble import assemble_docs_cli
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.session import bench_session

    spark = bench_session("sparkocr-bench", cpus)
    times: dict[str, float] = {}

    transcripts = spark.read.parquet(bench_parquet)
    turns_path = os.path.join(os.path.dirname(bench_parquet), "bench_turns_out")
    # warmup = one full untimed rep of exactly the timed stage-1/stage-2
    # ops (extract → parquet write → assemble from the written turns):
    # spawns the FULL python worker pool (a limit() warmup collapses to
    # ~1 task under AQE and leaves every other worker cold) and JITs the
    # zstd writer and assembly codegen, so no timed query pays first-use
    # cost (the extract-only warmup left assembly cold — measured as a
    # systematic pair-0 outlier in the scaling protocol)
    extract_turns(transcripts).write.mode("overwrite").parquet(turns_path)
    assemble_docs_cli(spark.read.parquet(turns_path)).count()

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        times[name] = round(time.monotonic() - t0, 3)
        return out

    # the headline stage runs TWICE and records the faster rep: the shared
    # host's effective speed swings up to 7.8x between back-to-back reps
    # (BENCH/BASELINE.md continuation spread — a steal burst made unchanged
    # TPC-H SQL 5x slow), so a single rep measures the host as often as the
    # DAG; min-of-2 in one process is the cheapest robust estimator, and
    # both raw reps stay visible in the output for honesty
    extract_reps = []
    for _ in range(2):
        t0 = time.monotonic()
        extract_turns(transcripts).write.mode("overwrite").parquet(turns_path)
        extract_reps.append(round(time.monotonic() - t0, 3))
    times["extract_turns"] = min(extract_reps)
    n_turns = spark.read.parquet(turns_path).count()
    # assembly from the materialized stage-1 output (real pipeline shape)
    timed(
        "assemble_docs",
        lambda: assemble_docs_cli(spark.read.parquet(turns_path)).count(),
    )

    catalog = dict(entry_mod.queries())
    # the CATALOG doc_lsh_pairs runs bucket_max=9 so the driver's sf0.01
    # oracle value-checks the cap branch; the BENCH times the scale
    # configuration (bucket_max=10000, the operator default) so the
    # per-query number stays comparable across rounds and actually does
    # the full candidate-join work at sf0.1
    from sparkocr.pipeline.dedup import lsh_candidate_pairs

    catalog["doc_lsh_pairs"] = lambda s, d: lsh_candidate_pairs(
        s.read.parquet(os.path.join(d, "documents.parquet")),
        n_perm=4, band_rows=2, k=8, bucket_max=10_000,
    )
    for name in (
        "pricing_summary",
        "region_revenue",
        "customer_order_windows",
        "doc_minhash",
        "doc_lsh_pairs",  # the near-dup scale path (exact jaccard is the
        #                   sf<=0.01 correctness query; df-capped at scale)
        "doc_simhash_pairs",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "doc_quality",
        "event_sessions",
        "asof_latest_order",
        "orders_range_join",
        "orders_rollup",
        "media_decode_resize",
    ):
        timed(name, lambda n=name: catalog[n](spark, sf_dir).count())
        # LSH/simhash operators cache their signature tables for multi-
        # branch plans; release exactly those between queries so the suite
        # does not accumulate executor storage across unrelated operators
        # (release_all only touches operator-registered caches, not any a
        # user of this session created)
        from sparkocr.pipeline import caching

        caching.release_all()

    # the composed product: the full corpus job (extract → assemble →
    # exact + near dedup → quality → split → pack → parquet) over the
    # same bench transcripts — the end-to-end number a pipeline owner
    # actually ships on, not just per-operator times
    from sparkocr.jobs.corpus_job import build_corpus

    corpus_out = os.path.join(os.path.dirname(bench_parquet), "bench_corpus_out")
    corpus_counts = timed(
        "corpus_job",
        lambda: build_corpus(spark, bench_parquet, corpus_out, budget=2048),
    )

    total = round(sum(times.values()), 3)
    result = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "bench_turns": n_turns,
        "turns_per_sec": round(n_turns / times["extract_turns"], 1),
        "extract_turns_reps": extract_reps,
        "corpus_docs": corpus_counts.get("packed_docs"),
        "corpus_packs": corpus_counts.get("packs"),
        "corpus_stage_sec": corpus_counts.get("stage_sec"),
    }
    print(json.dumps(result))
    spark.stop()
    return result


if __name__ == "__main__":
    main()
