"""Bucketed table storage — shuffle-free per-conversation operations.

The Iceberg design (north rule) buckets the transcript table by
``bucket(conv_id, N)``. Without the Iceberg jar, Spark's native bucketed
tables (``bucketBy`` + ``sortBy`` + ``saveAsTable``) provide the same
property through the session catalog: a table hash-bucketed on ``conv_id``
lets every downstream ``groupBy("conv_id")`` aggregation — doc assembly —
and every conv_id equi-join read co-located data with NO Exchange in the
plan (asserted in tests/test_plans.py). At 10^12 turns that removes the
single biggest shuffle in the pipeline: assembly moves zero bytes between
executors.

Requires ``spark.sql.sources.bucketing.enabled`` (default true) and a
session catalog (in-memory or Hive); the plain-parquet path with the
checkpoint module's bucket column stays the fallback for catalogless runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_turns_bucketed(
    turns: DataFrame,
    table: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist per-turn output hash-bucketed and sorted by
    (conv_id, turn_idx): bucket pruning for point lookups, shuffle-free
    grouping for assembly, and in-bucket sort order that matches the
    stable output ordering the golden surface requires.

    The pre-write repartition matters: native bucketing writes one file
    per (task, bucket) pair, so an unrepartitioned input with T tasks
    emits up to T×n_buckets small files; repartitioning on conv_id uses
    the same murmur3-mod assignment as the bucket spec, giving each task
    exactly one bucket → one file per bucket."""
    (
        turns.repartition(n_buckets, "conv_id")
        .write.mode(mode)
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .saveAsTable(table)
    )


def read_turns_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
