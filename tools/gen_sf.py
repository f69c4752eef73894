"""Deterministic testdata-shaped table generator for scale factors the
driver does not ship (the driver provides sf0.001/0.01/0.1 read-only;
the sf1 validation sweep needs a 10x dataset with the SAME ten-table
schema). Values are self-consistent synthetic data — the sweep compares
Spark against DuckDB over the SAME files, so only schema, ranges, and
distribution SHAPE matter, not the driver's exact rows:

- identical column names/types (verified against the sf0.1 parquet
  footers), identical value domains (order dates 1995..2001-08, events
  from 2024-01-01, langs/sources/event types, 64-dim embeddings);
- documents carry planted exact dups (~3%) and near-dups (~8%, a few
  words mutated) so the dedup/LSH operators have real work;
- embeddings cluster around 10 centers so ANN recall is meaningful.

Usage: python tools/gen_sf.py --sf 1 --out data/sf1  (seed fixed: 42)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_LANGS = ["en", "de", "zh", "es", "fr"]
_VOCAB = (
    "spark line column order small sort fast value scan agg table hash "
    "query key group batch part vector filter customer stream slow "
    "shuffle join index page cache disk read write plan stage task row "
    "merge split block file byte codec frame"
).split()

_DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, cols: dict, schema: pa.Schema) -> None:
    t = pa.table(cols, schema=schema)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {t.num_rows} rows")


def _ts_us(base_date: str, us: np.ndarray) -> pa.Array:
    base = np.datetime64(base_date, "us").astype("int64")
    return pa.array((base + us).astype("datetime64[us]"))


def generate(out_dir: str, sf: float = 1.0, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    _write(out_dir, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": _REGIONS,
    }, pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    _write(out_dir, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": _NATIONS,
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }, pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                  ("n_regionkey", pa.int32())]))

    n_cust = int(150_000 * sf)
    _write(out_dir, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{k:09d}" for k in range(n_cust)],
        "c_nationkey": (np.arange(n_cust) % 25).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(_SEGMENTS)[rng.integers(0, 5, n_cust)],
    }, pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                  ("c_mktsegment", pa.string())]))

    n_supp = int(10_000 * sf)
    _write(out_dir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{k:09d}" for k in range(n_supp)],
        "s_nationkey": (np.arange(n_supp) % 25).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }, pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    n_part = int(200_000 * sf)
    type1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    type2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    type3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
    t1 = rng.integers(0, len(type1), n_part)
    t2 = rng.integers(0, len(type2), n_part)
    t3 = rng.integers(0, len(type3), n_part)
    _write(out_dir, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{_VOCAB[k % len(_VOCAB)]} {_VOCAB[(k * 7 + 3) % len(_VOCAB)]}"
            for k in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + k % 5}{1 + (k // 5) % 5}" for k in range(n_part)],
        "p_type": [f"{type1[a]} {type2[b]} {type3[c]}" for a, b, c in zip(t1, t2, t3)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900 + (np.arange(n_part) % 1000) + rng.uniform(0, 100, n_part), 2),
    }, pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                  ("p_brand", pa.string()), ("p_type", pa.string()),
                  ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    n_ord = int(1_500_000 * sf)
    # date-only midnight timestamps over [1995-01-01, 2001-08-01], like
    # the driver tables
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    odate_day = rng.integers(0, span_days + 1, n_ord)
    _write(out_dir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", odate_day * _DAY_US),
        "o_orderpriority": np.array(_PRIORITIES)[rng.integers(0, 5, n_ord)],
    }, pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                  ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                  ("o_orderdate", pa.timestamp("us")),
                  ("o_orderpriority", pa.string())]))

    # lineitem: 1..7 lines per order, truncated to ~6M*sf total
    n_li_target = int(6_000_000 * sf)
    per_order = rng.integers(1, 8, n_ord)
    cum = np.cumsum(per_order)
    # clamp: when the drawn total falls short of the target (E[total]
    # equals the target exactly, so this is a coin flip per seed),
    # searchsorted returns n_ord and the unclamped slice below would
    # build a boundary array one longer than per_order
    cut = min(int(np.searchsorted(cum, n_li_target)), n_ord - 1)
    per_order = per_order[: cut + 1]
    l_orderkey = np.repeat(np.arange(len(per_order), dtype=np.int64), per_order)
    n_li = len(l_orderkey)
    l_linenumber = (np.arange(n_li) - np.repeat(np.concatenate([[0], cum[:cut]]), per_order) + 1).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(float)
    _write(out_dir, "lineitem", {
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": l_linenumber,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(
            "1995-01-01",
            (odate_day[l_orderkey] + rng.integers(1, 122, n_li)) * _DAY_US,
        ),
    }, pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                  ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                  ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                  ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                  ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                  ("l_shipdate", pa.timestamp("us"))]))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    gaps = rng.exponential(40_000_000, n_ev).astype(np.int64)  # ~40 s mean
    ts = np.cumsum(gaps)
    _write(out_dir, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_us("2024-01-01", ts),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": np.array(_EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 500, n_ev), 2),
        "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n_ev)],
    }, pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                  ("user_id", pa.int64()), ("event_type", pa.string()),
                  ("value", pa.float64()), ("props", pa.string())]))

    # documents: word salad 8..110 words; planted exact and near dups
    n_doc = int(50_000 * sf)
    vocab = np.array(_VOCAB)
    lens = rng.integers(8, 111, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.03:  # exact dup of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.11:  # near dup: mutate a few words
            words = texts[rng.integers(0, i)].split()
            for _ in range(max(1, len(words) // 20)):
                words[rng.integers(0, len(words))] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    _write(out_dir, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(_LANGS)[rng.integers(0, 5, n_doc)],
        "source": [f"src{k}" for k in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }, pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                  ("lang", pa.string()), ("source", pa.string()),
                  ("n_chars", pa.int64())]))

    n_vec = int(20_000 * sf)
    centers = rng.normal(0, 1, (10, 64))
    label = rng.integers(0, 10, n_vec).astype(np.int32)
    vecs = (centers[label] + rng.normal(0, 0.35, (n_vec, 64))).astype(np.float32)
    _write(out_dir, "embeddings", {
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": label,
    }, pa.schema([("vec_id", pa.int64()),
                  ("embedding", pa.list_(pa.float32())),
                  ("label", pa.int32())]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.out, a.sf, a.seed)
