"""As-of and range join semantics on hand-built interleaved frames."""

import datetime as dt

import pytest


def _ts(day, hour=0):
    return dt.datetime(2026, 1, day, hour)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(1), "e1"),   # before any right row
            ("u1", _ts(5), "e2"),   # after r1
            ("u1", _ts(10), "e3"),  # exactly at r2 (tie: right wins)
            ("u1", _ts(20), "e4"),  # after r2
            ("u2", _ts(5), "e5"),   # other key
        ],
        "k string, t timestamp, event string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(3), "r1", 1),
            ("u1", _ts(10), "r2", 2),
            ("u1", _ts(10), "r2b", 3),  # same instant: max tiebreak wins
            ("u2", _ts(4), "r3", 4),
        ],
        "k string, rt timestamp, name string, tb int",
    )
    return left, right


def test_asof_join_semantics(spark, frames):
    from sparkocr.pipeline.relational_ext import asof_join

    left, right = frames
    out = {
        r.event: r.name_asof
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["name", "tb"], right_tiebreak="tb",
        ).collect()
    }
    assert out == {"e1": None, "e2": "r1", "e3": "r2b", "e4": "r2b", "e5": "r3"}


def test_range_join_semantics(spark, frames):
    from pyspark.sql import functions as F

    from sparkocr.pipeline.relational_ext import range_join

    left, right = frames
    intervals = right.select(
        "k",
        F.col("rt").alias("s"),
        (F.col("rt") + F.expr("INTERVAL 4 DAYS")).alias("e"),
        "name",
    )
    out = sorted(
        (r.event, r.name)
        for r in range_join(
            left, intervals, key="k", left_time="t",
            r_start="s", r_end="e", bucket_seconds=8 * 86400,
            right_cols=["name"],
        ).collect()
    )
    # e2 (day 5) in [3,7) of r1; e3 (day 10) in [10,14) of r2/r2b;
    # e5 (day 5) in [4,8) of r3; e1/e4 in nothing
    assert out == [("e2", "r1"), ("e3", "r2"), ("e3", "r2b"), ("e5", "r3")]


def test_rows_upper_bound_from_parquet_footers(spark, tmp_path):
    """The dispatch's metadata shortcut: a parquet-backed frame reports
    its exact footer row count with no Spark job; non-file frames
    report unknown; projections/filters keep the bound safe (upper)."""
    from pyspark.sql import functions as F

    from sparkocr.pipeline.relational_ext import _rows_upper_bound

    p = str(tmp_path / "ub.parquet")
    spark.range(1234).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert _rows_upper_bound(df) == 1234
    # projection keeps the files; filter only removes rows — still an
    # upper bound
    assert _rows_upper_bound(df.select("k").filter("k = 3")) == 1234
    # in-memory frames have no files → unknown
    assert _rows_upper_bound(spark.range(10)) is None


def test_asof_dispatch_metadata_shortcut_skips_probe(spark, tmp_path):
    """With parquet inputs whose combined footer count sits below the
    threshold, the balanced single-window plan is chosen without the
    probe; a threshold the data CAN reach still probes (and chunks)."""
    import re

    from pyspark.sql import functions as F

    from sparkocr.pipeline.relational_ext import asof_join

    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    spark.range(5000).select(
        F.lit("hot").alias("k"),
        (F.lit(1_700_000_000) + F.col("id")).cast("timestamp").alias("t"),
        F.col("id").alias("lid"),
    ).write.parquet(lp)
    spark.range(10).select(
        F.lit("hot").alias("k"),
        (F.lit(1_700_000_000) + F.col("id") * 1000).cast("timestamp").alias("rt"),
        F.col("id").alias("rid"),
    ).write.parquet(rp)
    left, right = spark.read.parquet(lp), spark.read.parquet(rp)
    kw = dict(key="k", left_time="t", right_time="rt", right_cols=["rid"],
              right_tiebreak="rid", chunk_seconds=3600)
    # 5010 total rows < 100k threshold: footer bound alone settles it
    plan = asof_join(
        left, right, chunk_min_key_rows=100_000, **kw
    )._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" not in plan, plan
    # threshold below the hot key's actual rows: probe runs and chunks
    plan2 = asof_join(
        left, right, chunk_min_key_rows=1_000, **kw
    )._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(_k#\d+, _chunk#\d+", plan2), plan2


def test_rows_upper_bound_refuses_row_multiplying_plans(spark, tmp_path):
    """The footer bound is only an upper bound for scan/project/filter
    plans: a join, explode, or union can hold MORE rows than the input
    files, so those shapes must report unknown (None) and fall back to
    the honest probe."""
    from pyspark.sql import functions as F

    from sparkocr.pipeline.relational_ext import _rows_upper_bound

    p = str(tmp_path / "rm.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert _rows_upper_bound(df.select("k")) == 100  # scan-shaped: ok
    assert _rows_upper_bound(df.join(df.select("k").distinct(), "k")) is None
    assert _rows_upper_bound(
        df.select(F.explode(F.array("id", "k")))
    ) is None
    assert _rows_upper_bound(df.unionByName(df)) is None
    assert _rows_upper_bound(df.groupBy("k").count()) is None
