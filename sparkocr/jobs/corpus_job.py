"""End-to-end training-corpus pipeline: transcripts in, packed corpus out.

The composition the individual operators exist for, as one spark-submit
job:

    extract (per-turn, Arrow-batched)
      → assemble (per-conversation document)
      → exact dedup (md5 groups, keep min id)
      → near-dup dedup (MinHash-LSH pairs → connected components →
        one canonical doc per cluster)
      → quality filter (word-count threshold)
      → domain blocklist (optional --blocklist parquet with a
        ``domain`` column; suffix-matched, fail-closed on null ids)
      → benchmark decontamination (optional --bench parquet with a
        ``text`` column; 13-gram overlap on the RAW text — redaction
        placeholders must not mask an eval overlap — fail-closed)
      → PII redaction (optional --redact flag; audit counts ride into
        the corpus columns and the summary)
      → train/val/test hash split
      → sequence packing (fixed-token-budget packs)
      → parquet corpus + one JSON summary line with per-stage counts
        and per-stage wall seconds (``stage_sec`` — each stage count
        already forces the stage's plan, so lap times around the counts
        attribute the job's wall clock with no extra jobs).

Usage (deployment shape mirrors ``extract_job``):

    spark-submit --py-files sparkocr.zip sparkocr/jobs/corpus_job.py \
        --input transcripts.parquet --out /corpus
        [--bench bench.parquet] [--blocklist domains.parquet] [--redact]
        [--budget 2048] [--min-words 5] [--near-threshold 0.8]

Document identity: ``doc_id = xxhash64(conv_id)`` (a long — the type the
whole pipeline keys on), with ``conv_id`` carried alongside for
traceability; the one possible null-conv document (all null-conv turns
assemble into a single doc) hashes a sentinel instead of colliding into
``xxhash64(NULL)`` = the seed. A 64-bit hash collision would silently
merge two conversations, so the job VERIFIES injectivity with one
aggregate pass (distinct doc_ids == distinct conv keys, nulls counted)
and fails loudly on a collision (astronomically unlikely below ~10^8
docs; at larger corpora key the table upstream).

Packing runs PER SPLIT: a pack mixing train and val/test documents is
eval leakage for any consumer that materializes packs wholesale, and a
split-filtered read would see holes in pack_pos — each split packs
independently and pack ids are offset per split to stay globally
unique.

Stage counts in the summary each force an action; intermediate frames
are cached through ``pipeline.caching`` and released before exit, so the
accounting does not recompute the chain stage-by-stage.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F


def build_corpus(
    spark,
    transcripts_path: str,
    out_dir: str,
    bench_path: str | None = None,
    budget: int = 2048,
    min_words: int = 5,
    near_threshold: float = 0.8,
    blocklist_path: str | None = None,
    redact: bool = False,
    size_col: str | None = None,
    minhash_kind: str = "rolling",
) -> dict:
    from sparkocr.assemble import assemble_docs_cli
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.pipeline import caching
    from sparkocr.pipeline.dedup import (
        dedup_corpus,
        hash_split,
        lsh_candidate_pairs,
        neardup_corpus,
    )
    from sparkocr.pipeline.decontam import decontaminate
    from sparkocr.pipeline.packing import pack_sequences
    from sparkocr.pipeline.textstats import ws_token_count_col

    counts: dict[str, int] = {}
    # per-stage wall seconds, measured around each count-forcing action —
    # every stage count already forces the stage's plan, so the lap times
    # attribute the job's wall clock honestly without extra jobs. This is
    # the first thing an owner reads when a nightly run slows down.
    timings: dict[str, float] = {}
    t_lap = time.monotonic()

    def lap(stage: str) -> None:
        nonlocal t_lap
        now = time.monotonic()
        timings[stage] = round(now - t_lap, 3)
        t_lap = now

    counts["stage_sec"] = timings
    with caching.scope():
        transcripts = spark.read.parquet(transcripts_path)
        # markdown=False: this pipeline reads only clean_text (assembly +
        # dedup feeds), so skip the second grounding-cleanup pass
        turns = extract_turns(transcripts, markdown=False)
        docs = caching.register(
            assemble_docs_cli(turns).select(
                F.xxhash64(
                    F.coalesce(F.col("conv_id"), F.lit("\x00corpus_job:null-conv"))
                ).alias("doc_id"),
                "conv_id",
                F.col("doc_text").alias("text"),
            )
        )
        ids = docs.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("doc_id").alias("n_ids"),
            # nulls are invisible to count_distinct; the (single) null
            # conv is a real document and must count toward injectivity
            (
                F.count_distinct("conv_id")
                + F.max(F.col("conv_id").isNull().cast("int"))
            ).alias("n_convs"),
        ).first()
        counts["assembled_docs"] = int(ids["rows"])
        lap("extract_assemble")
        if counts["assembled_docs"] == 0:
            # empty input (or every turn truncated away): there is no
            # corpus to write — and the injectivity guard's max() over
            # zero rows would be null, firing a spurious collision error
            counts.update(
                after_exact_dedup=0, after_near_dedup=0,
                after_quality_filter=0, packed_docs=0, packs=0,
                cluster_edges=0, cluster_mode="driver",
            )
            # optional stage keys must exist whenever their flag is on —
            # a monitoring consumer reading the summary on an empty-input
            # day must not hit a missing key
            if blocklist_path is not None:
                counts["after_domain_filter"] = 0
            if bench_path is not None:
                counts["after_decontamination"] = 0
            if redact:
                counts["pii_redactions"] = 0
            return counts
        if ids["n_ids"] != ids["n_convs"]:
            raise ValueError(
                "corpus_job: the doc_id hash collided "
                f"({ids['n_convs']} conversation keys → {ids['n_ids']} "
                "doc_ids) — two conversations would silently merge; key "
                "the table upstream with a wider id"
            )

        exact = caching.register(dedup_corpus(docs))
        counts["after_exact_dedup"] = exact.count()
        lap("exact_dedup")

        # LSH emits CANDIDATES; only pairs whose estimated similarity
        # clears the threshold are duplicate edges — clustering raw
        # candidates would over-merge anything sharing one band.
        # hash_kind="rolling" by default: the Arrow rolling-hash minhash
        # (minhash_fast) — the signature stage was 80% of this job's
        # near_dedup wall time under the md5 kind (40 s vs 1.8 s on the
        # sf0.1 corpus); a one-off job has no stored sigs to stay
        # compatible with, so it takes the fast construction.
        # min_est pushes the threshold INTO the operator: the band-match
        # pigeonhole prune keeps a big near-dup family's O(d^2)
        # single-band collisions out of the signature verify join.
        # min_est's contract is (0, 1]; thresholds outside it are
        # degenerate-but-valid configurations that keep the unpruned
        # full-candidate path: non-positive means "every candidate is an
        # edge", above 1 means "no estimate qualifies" (near-dedup
        # effectively off — the filter below is simply empty)
        if 0 < near_threshold <= 1:
            pairs = lsh_candidate_pairs(
                exact, hash_kind=minhash_kind, min_est=near_threshold
            )
        else:
            pairs = lsh_candidate_pairs(exact, hash_kind=minhash_kind).filter(
                F.col("est_jaccard") >= near_threshold
            )
        cluster_stats: dict = {}
        neardup = caching.register(
            neardup_corpus(exact, pairs, stats=cluster_stats)
        )
        counts["after_near_dedup"] = neardup.count()
        # clustering telemetry rides the summary: mode says whether the
        # driver finisher or the distributed loop ran; a max_component /
        # rounds spike is the hot-shingle-chaining early warning
        counts["cluster_edges"] = cluster_stats.get("n_edges", 0)
        counts["cluster_mode"] = cluster_stats.get("mode", "driver")
        lap("near_dedup")

        quality = caching.register(
            neardup.filter(ws_token_count_col() >= min_words)
        )
        counts["after_quality_filter"] = quality.count()
        lap("quality_filter")

        final = quality
        if blocklist_path is not None:
            from sparkocr.pipeline.redact import domain_filter

            blocklist = spark.read.parquet(blocklist_path)
            final = caching.register(domain_filter(final, blocklist))
            counts["after_domain_filter"] = final.count()
            lap("domain_filter")
        if bench_path is not None:
            bench = spark.read.parquet(bench_path)
            final = caching.register(decontaminate(final, bench))
            counts["after_decontamination"] = final.count()
            lap("decontamination")
        if redact:
            from sparkocr.pipeline.redact import audit_totals, redact_pii

            final = caching.register(redact_pii(final))
            counts["pii_redactions"] = audit_totals(final)["total"]
            lap("redaction")

        final = caching.register(final.transform(hash_split, key="conv_id"))
        # --size-col: pack by a PRECOMPUTED token-count column instead of
        # the whitespace default — the seam a production pipeline routes
        # real BPE counts through (pack_sequences sizes by whatever count
        # lands in the column; it never re-tokenizes). The two stock
        # counters materialize here by name; any other name must already
        # be a column of the corpus frame (e.g. joined in upstream).
        pack_cols = ["doc_id", "text"]
        if size_col is not None:
            if size_col not in final.columns:
                from sparkocr.pipeline.textstats import word_token_count_col

                stock = {
                    "n_ws_tokens": ws_token_count_col,
                    "n_word_tokens": word_token_count_col,
                }
                if size_col not in stock:
                    raise ValueError(
                        f"corpus_job: --size-col {size_col!r} is neither a "
                        f"corpus column ({final.columns}) nor a stock "
                        f"counter ({sorted(stock)})"
                    )
                final = caching.register(
                    final.withColumn(size_col, stock[size_col]())
                )
            pack_cols.append(size_col)
        # pack PER SPLIT: one pack must never mix train with val/test
        # docs (eval leakage / pack_pos holes for split-filtered reads);
        # per-split pack ids are offset to stay globally unique
        packed_parts = [
            pack_sequences(
                final.filter(F.col("split") == s).select(*pack_cols),
                budget,
                size_col=size_col,
                id_offset=i << 60,  # validated against the group layout
                # by pack_sequences itself — the namespace lives there
            )
            for i, s in enumerate(["train", "val", "test"])
        ]
        packed = packed_parts[0]
        for part in packed_parts[1:]:
            packed = packed.unionByName(part)
        corpus = final.join(
            packed.select("doc_id", "n_tokens", "pack_id", "pack_pos"),
            "doc_id",
        )
        corpus.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus"))

        written = spark.read.parquet(os.path.join(out_dir, "corpus")).agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("pack_id").alias("packs"),
        ).first()
        counts["packed_docs"] = int(written["rows"])
        counts["packs"] = int(written["packs"])
        lap("split_pack_write")
    return counts


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--bench", default=None)
    ap.add_argument("--blocklist", default=None)
    ap.add_argument("--redact", action="store_true")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--near-threshold", type=float, default=0.8)
    ap.add_argument(
        "--size-col", default=None,
        help="pack by this precomputed token-count column instead of the "
        "whitespace default (n_ws_tokens / n_word_tokens materialize by "
        "name; anything else must already be a corpus column — the hook "
        "for real BPE counts)",
    )
    ap.add_argument(
        "--minhash-kind", default="rolling", choices=["rolling", "md5"],
        help="near-dup signature construction: 'rolling' (Arrow fast "
        "path, default) or 'md5' (engine-portable, replayable in any "
        "SQL engine)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkocr.session import build_session

    spark = build_session("sparkocr-corpus", master=args.master)
    t0 = time.monotonic()
    counts = build_corpus(
        spark,
        args.input,
        args.out,
        bench_path=args.bench,
        budget=args.budget,
        min_words=args.min_words,
        near_threshold=args.near_threshold,
        blocklist_path=args.blocklist,
        redact=args.redact,
        size_col=args.size_col,
        minhash_kind=args.minhash_kind,
    )
    summary = {"elapsed_sec": round(time.monotonic() - t0, 3), **counts}
    print(json.dumps(summary))
    spark.stop()
    return summary


if __name__ == "__main__":
    main()
