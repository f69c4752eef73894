"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark and (where an oracle exists) on DuckDB over the same parquet
tables at sf0.001; row counts and order-insensitive values must match."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = __import__("os").environ.get("SPARKOCR_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float).round(6)
        elif pd.api.types.is_integer_dtype(s) or s.dtype == bool:
            # nullable Int64: plain astype("int64") raises on NA, and the
            # old errors="ignore" escape hatch silently skipped
            # normalization (and is removed in pandas 3.0)
            out[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype(str)
        else:
            out[c] = s.astype(object).where(s.notna(), None).astype(str)
    res = pd.DataFrame(out)
    return res.sort_values(list(res.columns), kind="mergesort").reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        # rows-only check (driver's weaker path): it must run and be sane
        assert got is not None
        return
    want = duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: columns {list(g.columns)} vs {list(w.columns)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.limit(5).collect()  # one job, not limit+count twice
    assert {"conv_id", "turn_idx", "clean_text", "spans"} <= set(df.columns)


def test_oracle_keys_subset():
    # full coverage reached in round 2: every entry is value-checked —
    # a new entry without an oracle silently downgrades to rows-only,
    # so adding one must be a deliberate (test-updating) decision
    assert set(ORACLES) == set(QUERIES)


def test_catalog_fits_driver_check_cap():
    # the correctness driver verifies at most 50 entries (round 1 shipped
    # 56 and the last 6 were silently never checked) — keep every entry
    # under the cap so each one gets a CORRECTNESS row
    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} entries: the driver checks only the first 50 — "
        "merge or prune before adding more"
    )
