"""State audit job: one spark-submit that health-checks the incremental
corpus state (LSH store + content tables) and their cross-consistency.

    spark-submit --py-files sparkocr.zip sparkocr/jobs/audit_job.py \
        --store corpus_state [--master ...]

Prints one JSON line and exits nonzero when unhealthy — the cron/alert
contract. What it checks, beyond the per-store audits
(``check_lsh_store``, ``check_content_state``):

- ``lsh_only_docs``: committed sig doc_ids with no committed content
  row. The increment commits the LSH append BEFORE the content state,
  so a crash in between leaves exactly this signature — it heals on
  retry (same id: LSH skips, content commits; different id: the
  store-side ``skip_existing`` guard dedups the LSH side, content
  commits). A persistent nonzero therefore means a crashed increment
  was never retried: its docs are invisible to the content filter and
  would be re-extracted (then excluded from the store) every time they
  re-arrive. Counted with a doc_id anti-join — both tables are
  bucketed by doc_id, so neither large side shuffles.
- ``content_without_sigs``: committed content docs with no committed
  sig row. Legitimate for documents shorter than the shingle width
  (``minhash_signatures`` emits no row for them), so informational,
  not unhealthy — a sudden spike still merits a look (it would also
  follow from an LSH-table loss).

``healthy`` requires: zero dup/missing/mismatch counts in both store
audits and zero ``lsh_only_docs``. Orphan rows (crashed attempts,
invisible to readers) and ``content_without_sigs`` are reported but do
not fail the audit.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def audit_state(spark: SparkSession, store: str) -> dict:
    from sparkocr.pipeline import corpus_state, lsh_store

    out: dict = {"store": store}
    out["lsh"] = lsh_store.check_lsh_store(spark, store)
    out["content"] = corpus_state.check_content_state(spark, store)

    sig_ids = lsh_store._committed_rows(
        spark, store, lsh_store._sigs_table(store)
    ).select("doc_id").distinct()
    content_ids = corpus_state._committed_rows(
        spark, store, corpus_state._byid_table(store)
    ).select("doc_id").distinct()
    out["lsh_only_docs"] = int(
        sig_ids.join(content_ids, "doc_id", "left_anti").count()
    )
    out["content_without_sigs"] = int(
        content_ids.join(sig_ids, "doc_id", "left_anti").count()
    )
    commits = spark.table(corpus_state._commits_table(store)).collect()
    out["increments"] = max(int(r.ordinal) for r in commits)

    bad = out["lsh"]
    cbad = out["content"]
    out["healthy"] = (
        bad["dup_sig_docs"] == 0
        and bad["missing_sig_docs"] == 0
        and bad["band_mismatch_docs"] == 0
        and cbad["mismatched_docs"] == 0
        and out["lsh_only_docs"] == 0
    )
    return out


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkocr.session import build_session

    spark = build_session("sparkocr-audit", master=args.master)
    report = audit_state(spark, args.store)
    print(json.dumps(report))
    spark.stop()
    if not report["healthy"]:
        sys.exit(1)
    return report


if __name__ == "__main__":
    main()
