"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction DAG on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents (omitted only for
genuinely non-SQL-expressible ops; the driver then records rows-only).

Column names are aliased identically on both sides (the driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

EOS = "<｜end▁of▁sentence｜>"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Synthesized transcripts over the documents table (deterministic, mirrors
# BASELINE.json input_hint; the same construction is expressible in SQL so
# the extraction surface itself is oracle-checked).
# --------------------------------------------------------------------------

def _doc_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grounding turn per document: a title ref with doc-dependent
    coords + the doc text + EOS for all but every 7th doc (truncation case).
    conv_id = source, turn_idx = doc_id."""
    d = _t(spark, sf_dir, "documents")
    coords = F.concat(
        F.lit("[["),
        (F.col("doc_id") % 999).cast("string"), F.lit(","),
        ((F.col("doc_id") * 7) % 999).cast("string"), F.lit(","),
        (F.col("doc_id") % 999 + 0).cast("string"), F.lit(","),
        ((F.col("doc_id") * 13) % 999).cast("string"),
        F.lit("]]"),
    )
    text = F.concat(
        F.lit("<|ref|>title<|/ref|><|det|>"), coords, F.lit("<|/det|>"),
        F.col("text"),
        F.when(F.col("doc_id") % 7 != 0, F.lit(EOS)).otherwise(F.lit("")),
    )
    return d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        text.alias("text"),
        F.lit("grounding").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


_DOC_TRANSCRIPT_SQL = f"""
    SELECT source AS conv_id, doc_id,
           '<|ref|>title<|/ref|><|det|>[[' || (doc_id % 999) || ',' ||
           ((doc_id * 7) % 999) || ',' || (doc_id % 999) || ',' ||
           ((doc_id * 13) % 999) || ']]<|/det|>' || text ||
           CASE WHEN doc_id % 7 <> 0 THEN '{EOS}' ELSE '' END AS text
    FROM documents
"""

_TRIMSET = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"


def _img_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grounding turn per document with an IMAGE ref (crop/embed
    surface): image ref + doc text + EOS; every 5th doc additionally gets a
    repeated-text body that trips the windowed n-gram repeat detector."""
    d = _t(spark, sf_dir, "documents")
    coords = F.concat(
        F.lit("[["),
        (F.col("doc_id") % 999).cast("string"), F.lit(","),
        ((F.col("doc_id") * 7) % 999).cast("string"), F.lit(","),
        ((F.col("doc_id") % 999) + 0).cast("string"), F.lit(","),
        ((F.col("doc_id") * 13) % 999).cast("string"),
        F.lit("]]"),
    )
    body = F.when(
        F.col("doc_id") % 5 == 0, F.repeat(F.substring("text", 1, 40), 8)
    ).otherwise(F.col("text"))
    text = F.concat(
        F.lit("<|ref|>image<|/ref|><|det|>"), coords, F.lit("<|/det|>"),
        body, F.lit(EOS),
    )
    return d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        text.alias("text"),
        F.lit("grounding").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


_IMG_BODY_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN repeat(substr(text, 1, 40), 8) ELSE text END"
)


# --------------------------------------------------------------------------
# Extraction queries (oracle-checked through SQL closed forms)
# --------------------------------------------------------------------------

def q_extract_clean(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        F.col("clean_text"),
        F.col("is_truncated"),
    )


def q_extract_spans(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    s = turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        F.explode("spans").alias("sp"),
    )
    return s.select(
        "doc_id",
        F.col("sp.start").alias("span_start"),
        F.col("sp.end").alias("span_end"),
        F.col("sp.label").alias("label"),
        F.col("sp.bbox")[0][0].alias("x1"),
        F.col("sp.bbox")[0][1].alias("y1"),
        F.col("sp.bbox")[0][2].alias("x2"),
        F.col("sp.bbox")[0][3].alias("y2"),
    )


def q_doc_assembly(spark, sf_dir):
    from sparkocr.assemble import assemble_docs_cli
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    return assemble_docs_cli(turns, skip_truncated=True).select(
        "conv_id", "n_turns", "doc_text"
    )


def q_page_slice(spark, sf_dir):
    # S6 page-range slice. The filter is applied to the SOURCE column before
    # any cast so it reaches the parquet scan as a pushed filter (a filter on
    # cast(doc_id) would not push; see tests/test_plans.py).
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") <= 199))
        .select(F.col("source").alias("conv_id"), "doc_id")
    )


def q_vision_tokens(spark, sf_dir):
    # T2/T8 tile + token arithmetic as a column function over part dims
    from pyspark.sql.pandas.functions import pandas_udf
    import pandas as pd

    def _vt(w, h):
        from sparkocr.textproc.tiles import num_image_tokens_mode

        return pd.Series(
            [num_image_tokens_mode(int(a), int(b), "gundam") for a, b in zip(w, h)],
            dtype="int32",
        )

    vt = pandas_udf(_vt, "int")

    p = _t(spark, sf_dir, "part")
    dims = p.select(
        "p_partkey",
        (F.lit(512) + (F.col("p_partkey") % 1600)).cast("int").alias("w"),
        (F.lit(512) + ((F.col("p_partkey") * 3) % 1600)).cast("int").alias("h"),
    )
    return dims.select("p_partkey", vt("w", "h").alias("n_vision_tokens"))


def q_crop_regions(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import crop_regions

    turns = extract_turns(_img_transcripts(spark, sf_dir))
    return crop_regions(turns).select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "img_idx", "crop_path", "x1", "y1", "x2", "y2",
    )


def q_markdown_embed(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import embed_crops_in_markdown

    turns = extract_turns(_img_transcripts(spark, sf_dir))
    return embed_crops_in_markdown(turns).select(
        F.col("turn_idx").cast("bigint").alias("doc_id"), "markdown_embedded"
    )


def q_repeat_flags(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_img_transcripts(spark, sf_dir))
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"), "has_repeat"
    )


def q_locate_stats(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import locate

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    hits = locate(turns, "the")
    return (
        hits.groupBy(F.col("turn_idx").cast("bigint").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("match_start").alias("first_start"),
        )
    )


def q_geometry_parse(spark, sf_dir):
    import pandas as pd

    geo_text = F.concat(
        F.lit("{'Line': {'line': ['(0,0) -- ("),
        F.col("doc_id").cast("string"),
        F.lit(","),
        (F.col("doc_id") * 2).cast("string"),
        F.lit(")'], 'line_type': ['--'], 'line_endpoint': ['A: (0,0)', 'B: ("),
        F.col("doc_id").cast("string"),
        F.lit(","),
        (F.col("doc_id") * 2).cast("string"),
        F.lit(")']}, 'Circle': {'circle_center': ['O: (1,1)'], 'radius': ["),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("]}}"),
    )

    def geo_batches(batches):
        from sparkocr.textproc.geometry import parse_geometry

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                g = parse_geometry(t)
                if g is None or not g["lines"]:
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                ln = g["lines"][0]
                c = g["circles"][0] if g["circles"] else None
                rows.append(
                    (
                        doc_id, len(g["lines"]), ln["x2"], ln["y2"], ln["style"],
                        len(g["endpoints"]), c["radius"] if c else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_lines", "x2", "y2", "style",
                    "n_endpoints", "circle_radius",
                ],
            )

    d = _t(spark, sf_dir, "documents").select("doc_id", geo_text.alias("t"))
    return d.mapInPandas(
        geo_batches,
        "doc_id bigint, n_lines int, x2 double, y2 double, style string, "
        "n_endpoints int, circle_radius double",
    )


def q_payload_chunks(spark, sf_dir):
    from sparkocr.textproc.chunking import chunk_turns

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("turn_idx"), F.lit("d").alias("conv_id"), "text"
    )
    return chunk_turns(d, max_chars=100).select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "chunk_idx", "chunk_text", "n_chunks",
    )


def q_pdf_reading_order(spark, sf_dir):
    """pdfspans mode: spans arrive shuffled (D,B,A,C) and must come back in
    reading order A B / C D (row-major by y-quantum then x), with E3-style
    bbox denormalization on the first span."""
    from sparkocr.extract.dispatch import extract_turns

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit('{"page": 0, "spans": ['),
        F.lit('{"t": "D'), i, F.lit('", "bbox": [500, 163, 900, 193]}, '),
        F.lit('{"t": "B'), i, F.lit('", "bbox": [500, 43, 900, 73]}, '),
        F.lit('{"t": "A'), i, F.lit('", "bbox": [30, 43, 460, 73]}, '),
        F.lit('{"t": "C'), i, F.lit('", "bbox": [30, 163, 460, 193]}]}'),
    )
    tr = d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        payload.alias("text"),
        F.lit("pdfspans").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    turns = extract_turns(tr)
    first = F.col("spans")[0]
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "clean_text",
        F.size("spans").alias("n_spans"),
        first["start"].alias("s0_start"),
        first["end"].alias("s0_end"),
        first["bbox"][0][0].alias("s0_x1"),
        first["bbox"][0][1].alias("s0_y1"),
        first["bbox"][0][2].alias("s0_x2"),
        first["bbox"][0][3].alias("s0_y2"),
    )


def q_html_main_extract(spark, sf_dir):
    """html mode: nav/link boilerplate must be dropped, the two article
    paragraphs kept in order and joined with a blank line."""
    from sparkocr.extract.dispatch import extract_turns

    d = _t(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> <a href="/x">X</a></nav>'),
        F.lit("<article><p>"), F.col("text"), F.lit("</p><p>closing paragraph tail "),
        F.col("doc_id").cast("string"),
        F.lit("</p></article><footer><a href='/t'>T</a></footer></body></html>"),
    )
    tr = d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        payload.alias("text"),
        F.lit("html").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    turns = extract_turns(tr)
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "clean_text",
        F.size("spans").alias("n_blocks"),
    )


def q_label_colors(spark, sf_dir):
    """E13 app-variant analog: per-label first-seen color ranks. Single
    conv so first-seen order == doc_id order; RGB (seeded numpy stream,
    not SQL-expressible) is covered by pytest instead."""
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import label_color_map

    d = _t(spark, sf_dir, "documents")
    text = F.concat(
        F.lit("<|ref|>label_"), (F.col("doc_id") % 4).cast("string"),
        F.lit("<|/ref|><|det|>[[1,2,3,4]]<|/det|>body"), F.lit(EOS),
    )
    tr = d.select(
        F.lit("c").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        text.alias("text"),
        F.lit("grounding").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    cm = label_color_map(extract_turns(tr))
    return cm.select(
        "label",
        F.col("first_turn_idx").cast("bigint").alias("first_doc"),
        "color_idx",
    )


def q_md_table_extract(spark, sf_dir):
    """markdown mode: newline-run collapse, trailing-ws strip, pipe-table
    cell spans (separator row excluded)."""
    from sparkocr.extract.dispatch import extract_turns

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("# Title "), i, F.lit("\n\n\n\n"), F.col("text"),
        F.lit("   \n\n| a | b"), i, F.lit(" |\n|---|---|\n| 1 | x |\n"),
    )
    tr = d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        payload.alias("text"),
        F.lit("markdown").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    turns = extract_turns(tr)
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "clean_text",
        F.size("spans").alias("n_cells"),
    )


def q_doc_assembly_app(spark, sf_dir):
    from sparkocr.assemble import assemble_docs_app
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    return assemble_docs_app(turns).select("conv_id", "n_turns", "doc_text")


def q_mode_metrics(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.metrics import mode_metrics

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    return mode_metrics(turns).select(
        "tool", "n_turns", "n_truncated", "n_errors",
        "chars_in", "chars_out", "avg_chars_out",
    )


def q_conv_skew(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.metrics import conversation_skew

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    # exact columns only (percentiles are approximate by design -> no oracle)
    return conversation_skew(turns).select(
        "n_convs", "n_turns_total", "max_conv_turns"
    )


# --------------------------------------------------------------------------
# Relational catalog (TPC-H-ish + events)
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("r_name")
    )


def q_segment_order_stats(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


def q_top_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def q_running_customer_spend(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend")
    )


def q_customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_nation_returned_share(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("returned_share")
        )
        .orderBy("n_name")
    )


def q_part_type_stats(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(F.upper(F.substring("p_type", 1, 5)).alias("type_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max(F.length("p_name")).alias("max_name_len"),
        )
        .orderBy("type_prefix")
    )


def q_orders_by_month(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("month")
    )


def q_supplier_balance_rank(spark, sf_dir):
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 2)
        .select("n_name", "s_suppkey", "rk")
    )


def q_priority_set_ops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    lo = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return (
        hi.intersect(lo)
        .union(hi.exceptAll(hi))  # no-op union keeps this a set-op exercise
        .distinct()
        .select(F.col("o_custkey").alias("custkey"))
        .orderBy("custkey")
    )


def q_orders_rollup(spark, sf_dir):
    """Hierarchical rollup (hypertable-rollup analog): order counts and
    revenue at (year, priority), (year), and grand-total levels in one
    pass — Spark's rollup == partial-aggregate reuse across levels."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").alias("yr"), "o_orderpriority", "o_totalprice")
        .rollup("yr", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders", "revenue",
        )
    )


def q_asof_latest_order(spark, sf_dir):
    """As-of join: each event picks the user's latest order at or before
    the event time (ties: max orderkey)."""
    from sparkocr.pipeline.relational_ext import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("otime"),
        "o_orderkey",
        "o_totalprice",
    )
    j = asof_join(
        e, o, key="user_id", left_time="ts", right_time="otime",
        right_cols=["o_orderkey", "o_totalprice"], right_tiebreak="o_orderkey",
    )
    return j.select(
        "event_id", "user_id",
        F.col("o_orderkey_asof").alias("asof_orderkey"),
        F.round("o_totalprice_asof", 2).alias("asof_totalprice"),
    )


def q_orders_range_join(spark, sf_dir):
    """Range join: pairs of same-customer orders within 30 days (interval
    [date, date+30d) registered in coarse buckets -> equi join, no banded
    nested loop)."""
    from sparkocr.pipeline.relational_ext import range_join

    o = _t(spark, sf_dir, "orders")
    left = o.select("o_orderkey", "o_custkey", "o_orderdate")
    right = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("r_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("r_end"),
        F.col("o_orderkey").alias("r_orderkey"),
    )
    j = range_join(
        left, right, key="o_custkey", left_time="o_orderdate",
        r_start="r_start", r_end="r_end",
        bucket_seconds=60 * 86400, right_cols=["r_orderkey"],
    )
    return j.select(
        F.col("o_orderkey").alias("left_key"),
        F.col("r_orderkey").alias("right_key"),
        "o_custkey",
    )


def q_event_sessions(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds: unix_timestamp() truncates to whole seconds
    # and a 1800.4 s gap straddling the threshold would sessionize
    # differently from the fractional-epoch oracle. NTZ columns can't cast
    # to double directly; via timestamp is exact (session tz is UTC).
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = F.sum(F.when(gap > 1800, 1).otherwise(0)).over(w) + 1
    # max session id per user == number of 30-min sessions
    return (
        e.withColumn("sess", sess)
        .groupBy("user_id")
        .agg(F.max("sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def q_event_type_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


def q_event_props_k(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.max("k").alias("max_k"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Data-pipeline catalog (documents / embeddings)
# --------------------------------------------------------------------------

def q_doc_exact_dedup(spark, sf_dir):
    from sparkocr.pipeline.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).select("h", "keep_id", "n_dups")


def q_doc_dedup_corpus(spark, sf_dir):
    from sparkocr.pipeline.dedup import dedup_corpus

    return dedup_corpus(_t(spark, sf_dir, "documents")).select(
        "doc_id", "text", "lang", "source"
    )


def q_doc_hash_split(spark, sf_dir):
    from sparkocr.pipeline.dedup import hash_split

    return hash_split(_t(spark, sf_dir, "documents")).select(
        "doc_id", "bucket_256", "split"
    )


def q_doc_jaccard_pairs(spark, sf_dir):
    from sparkocr.pipeline.dedup import jaccard_pairs

    # df_max=256 exercises the document-frequency cap (the anti-quadratic
    # guard) under the oracle: the sf0.01 corpus has shingles in up to 394
    # of 500 docs, and the SQL mirror applies the identical cap.
    return jaccard_pairs(_t(spark, sf_dir, "documents"), k=8, threshold=0.3, df_max=256)


def q_doc_minhash(spark, sf_dir):
    from sparkocr.pipeline.dedup import minhash_signatures

    sig = minhash_signatures(_t(spark, sf_dir, "documents"), n_perm=4, k=8)
    return sig.select("doc_id", "mh_0", "mh_1", "mh_2", "mh_3")


def q_doc_lsh_pairs(spark, sf_dir):
    from sparkocr.pipeline.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(_t(spark, sf_dir, "documents"), n_perm=4, band_rows=2, k=8)


def q_doc_token_counts(spark, sf_dir):
    from sparkocr.pipeline.textstats import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def q_doc_quality(spark, sf_dir):
    from sparkocr.pipeline.textstats import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def q_doc_lang_id(spark, sf_dir):
    from sparkocr.pipeline.textstats import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_doc_fingerprints(spark, sf_dir):
    from sparkocr.pipeline.textstats import md5_fingerprints

    return md5_fingerprints(_t(spark, sf_dir, "documents"))


def q_doc_chunk_fps(spark, sf_dir):
    from sparkocr.pipeline.textstats import chunk_fingerprints

    return chunk_fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.size("chunk_fps").alias("n_chunks"), F.col("chunk_fps")[0].alias("first_fp")
    )


def q_doc_simhash_pairs(spark, sf_dir):
    from sparkocr.pipeline.dedup import simhash_near_dups

    # 3 = the largest radius the 4-chunk blocking covers completely
    return simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_media_decode(spark, sf_dir):
    from sparkocr.pipeline.multimodal import decode_stats, synth_media

    d = decode_stats(synth_media(_t(spark, sf_dir, "documents")))
    return d.select(
        "media_id", "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        "width", "height",
        F.round("aspect_ratio", 6).alias("aspect_ratio"),
    )


def q_media_resize_plan(spark, sf_dir):
    from sparkocr.pipeline.multimodal import resize_plan, synth_media

    return resize_plan(synth_media(_t(spark, sf_dir, "documents")), target=640)


def q_media_frame_sample(spark, sf_dir):
    # frame checksums come from the deterministic fake codec (not
    # SQL-expressible without overflow-safe fold) -> rows-only check
    from sparkocr.pipeline.multimodal import sample_frames, synth_media

    return sample_frames(synth_media(_t(spark, sf_dir, "documents")), n_sample=4)


def _query_vec(spark, sf_dir):
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").collect()
    )
    return [float(v) for v in row[0]["embedding"]]


def q_ann_cosine_topk(spark, sf_dir):
    from sparkocr.pipeline.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10)


def q_ann_lsh_topk(spark, sf_dir):
    from sparkocr.pipeline.similarity import lsh_topk

    return lsh_topk(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10)


def q_ann_ivf_topk(spark, sf_dir):
    # IVF probe: recall < 1 by design -> rows-only driver check; pytest
    # asserts recall against brute force instead
    from sparkocr.pipeline.similarity import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10)


def q_embedding_label_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ed, ed, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    return (
        e.select("label", F.sqrt(dot).alias("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


def q_embedding_near_dups(spark, sf_dir):
    from sparkocr.pipeline.similarity import embedding_near_dups

    return embedding_near_dups(_t(spark, sf_dir, "embeddings"), threshold=0.9)


# --------------------------------------------------------------------------
# Driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction DAG over transcripts synthesized from the
    sf0.001 documents table (grounding markers + truncation cases), through
    the vectorized extractor; returns the per-turn output table."""
    from sparkocr.extract.dispatch import extract_turns

    return extract_turns(_doc_transcripts(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # extraction surface
        "extract_clean": q_extract_clean,
        "extract_spans": q_extract_spans,
        "doc_assembly": q_doc_assembly,
        "doc_assembly_app": q_doc_assembly_app,
        "page_slice": q_page_slice,
        "vision_tokens": q_vision_tokens,
        "crop_regions": q_crop_regions,
        "payload_chunks": q_payload_chunks,
        "pdf_reading_order": q_pdf_reading_order,
        "html_main_extract": q_html_main_extract,
        "md_table_extract": q_md_table_extract,
        "label_colors": q_label_colors,
        "markdown_embed": q_markdown_embed,
        "repeat_flags": q_repeat_flags,
        "locate_stats": q_locate_stats,
        "geometry_parse": q_geometry_parse,
        "mode_metrics": q_mode_metrics,
        "conv_skew": q_conv_skew,
        # relational catalog
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "region_revenue": q_region_revenue,
        "segment_order_stats": q_segment_order_stats,
        "top_orders_per_customer": q_top_orders_per_customer,
        "running_customer_spend": q_running_customer_spend,
        "customers_without_orders": q_customers_without_orders,
        "nation_returned_share": q_nation_returned_share,
        "part_type_stats": q_part_type_stats,
        "orders_by_month": q_orders_by_month,
        "supplier_balance_rank": q_supplier_balance_rank,
        "priority_set_ops": q_priority_set_ops,
        "orders_rollup": q_orders_rollup,
        "asof_latest_order": q_asof_latest_order,
        "orders_range_join": q_orders_range_join,
        "event_sessions": q_event_sessions,
        "event_type_hourly": q_event_type_hourly,
        "event_props_k": q_event_props_k,
        # data-pipeline catalog
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_dedup_corpus": q_doc_dedup_corpus,
        "doc_hash_split": q_doc_hash_split,
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "doc_minhash": q_doc_minhash,
        "doc_lsh_pairs": q_doc_lsh_pairs,
        "doc_token_counts": q_doc_token_counts,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "doc_fingerprints": q_doc_fingerprints,
        "doc_chunk_fps": q_doc_chunk_fps,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "media_decode": q_media_decode,
        "media_resize_plan": q_media_resize_plan,
        "media_frame_sample": q_media_frame_sample,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_label_stats": q_embedding_label_stats,
        "embedding_near_dups": q_embedding_near_dups,
    }


def oracle_sql() -> dict[str, str]:
    from sparkocr.pipeline.textstats import LANGS, lang_score_sql

    lang_cols = ", ".join(
        f"round({lang_score_sql('text', l)}, 6) AS score_{l}" for l in LANGS
    )
    best = "greatest(" + ", ".join(f"score_{l}" for l in LANGS) + ")"
    lang_pred = (
        "CASE WHEN " + best + " <= 0 THEN 'und' "
        + " ".join(f"WHEN score_{l} = {best} THEN '{l}'" for l in LANGS)
        + " END"
    )

    # DuckDB range() only takes constants: enumerate up to a fixed bound and
    # filter per row (document texts are well under 4096 chars at all SFs).
    shingle_cte = """
        WITH sh AS (
            SELECT DISTINCT doc_id, substr(text, r.range::INT, 8) AS sh
            FROM documents, range(1, 4096) r
            WHERE r.range <= length(text) - 7
        )
    """

    return {
        "extract_clean": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL})
            SELECT doc_id,
                   trim(replace('title' || regexp_replace(text,
                        '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                        '{EOS}', ''), {_TRIMSET}) AS clean_text,
                   (doc_id % 7 = 0) AS is_truncated
            FROM t
        """,
        "extract_spans": """
            -- bbox denorm must match python int(v/999*dim): divide FIRST
            SELECT doc_id,
                   0::INT AS span_start, 5::INT AS span_end, 'title' AS label,
                   floor(((doc_id % 999) / 999.0) * 1275)::INT AS x1,
                   floor((((doc_id * 7) % 999) / 999.0) * 1650)::INT AS y1,
                   floor(((doc_id % 999) / 999.0) * 1275)::INT AS x2,
                   floor((((doc_id * 13) % 999) / 999.0) * 1650)::INT AS y2
            FROM documents
        """,
        "doc_assembly": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT conv_id, doc_id,
                       trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET}) AS clean_text
                FROM t WHERE doc_id % 7 <> 0
            )
            SELECT conv_id, count(*)::INT AS n_turns,
                   string_agg(clean_text || chr(10) || chr(10) ||
                              '<--- Page Split --->' || chr(10),
                              '' ORDER BY doc_id) AS doc_text
            FROM cleaned GROUP BY conv_id
        """,
        "page_slice": """
            SELECT source AS conv_id, doc_id FROM documents
            WHERE doc_id BETWEEN 100 AND 199
        """,
        "doc_assembly_app": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT conv_id, doc_id,
                       trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET}) AS clean_text,
                       row_number() OVER (PARTITION BY conv_id ORDER BY doc_id) AS pg
                FROM t
            )
            SELECT conv_id, count(*)::INT AS n_turns,
                   string_agg(chr(10) || chr(10) || '--- ' || chr(128196) ||
                              ' 第 ' || pg || ' 页 ---' || chr(10) || chr(10)
                              || clean_text, '' ORDER BY doc_id) AS doc_text
            FROM cleaned GROUP BY conv_id
        """,
        "crop_regions": """
            SELECT doc_id, 0::INT AS img_idx,
                   'images/' || doc_id || '_0.jpg' AS crop_path,
                   floor(((doc_id % 999) / 999.0) * 1275)::INT AS x1,
                   floor((((doc_id * 7) % 999) / 999.0) * 1650)::INT AS y1,
                   floor(((doc_id % 999) / 999.0) * 1275)::INT AS x2,
                   floor((((doc_id * 13) % 999) / 999.0) * 1650)::INT AS y2
            FROM documents
        """,
        "markdown_embed": f"""
            SELECT doc_id,
                   replace(
                       trim(chr(10) || chr(10) || '**[图片 1]**' ||
                            chr(10) || chr(10) || {_IMG_BODY_SQL}, {_TRIMSET}),
                       '**[图片 1]**',
                       '![](images/' || doc_id || '_0.jpg)') AS markdown_embedded
            FROM documents
        """,
        "repeat_flags": """
            SELECT doc_id, (doc_id % 5 = 0) AS has_repeat FROM documents
        """,
        "payload_chunks": """
            SELECT doc_id, r.range::INT AS chunk_idx,
                   substr(text, (r.range * 100 + 1)::INT, 100) AS chunk_text,
                   greatest(ceil(length(text) / 100.0), 1)::INT AS n_chunks
            FROM documents, range(0, 64) r
            -- greatest(,1): empty text still yields one empty chunk row,
            -- matching chunk_turns' n_chunks >= 1 contract
            WHERE r.range * 100 < greatest(length(text), 1)
        """,
        "html_main_extract": """
            -- document text has no markup chars or whitespace runs
            -- (verified), so the kept article blocks pass through verbatim
            SELECT doc_id,
                   text || chr(10) || chr(10) ||
                   'closing paragraph tail ' || doc_id AS clean_text,
                   2::INT AS n_blocks
            FROM documents
        """,
        "label_colors": """
            WITH firsts AS (
                SELECT 'label_' || (doc_id % 4) AS label,
                       min(doc_id) AS first_doc
                FROM documents GROUP BY 1)
            SELECT label, first_doc,
                   (row_number() OVER (ORDER BY first_doc) - 1)::INT AS color_idx
            FROM firsts
        """,
        "md_table_extract": """
            -- normalize: trailing spaces before newline dropped, newline
            -- runs of 3+ collapse to 2, outer strip; 4 pipe cells
            -- (separator row excluded)
            SELECT doc_id,
                   '# Title ' || doc_id || chr(10) || chr(10) || text ||
                   chr(10) || chr(10) || '| a | b' || doc_id || ' |' ||
                   chr(10) || '|---|---|' || chr(10) || '| 1 | x |' AS clean_text,
                   4::INT AS n_cells
            FROM documents
        """,
        "pdf_reading_order": """
            -- A B on row 4 (y1=43), C D on row 16 (y1=163); first span = A
            SELECT doc_id,
                   'A' || doc_id || ' ' || 'B' || doc_id || chr(10) ||
                   'C' || doc_id || ' ' || 'D' || doc_id AS clean_text,
                   4::INT AS n_spans,
                   0::INT AS s0_start,
                   (1 + length(doc_id::VARCHAR))::INT AS s0_end,
                   floor(30 / 999.0 * 1275)::INT AS s0_x1,
                   floor(43 / 999.0 * 1650)::INT AS s0_y1,
                   floor(460 / 999.0 * 1275)::INT AS s0_x2,
                   floor(73 / 999.0 * 1650)::INT AS s0_y2
            FROM documents
        """,
        "locate_stats": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT doc_id,
                       trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET}) AS clean_text
                FROM t
            )
            SELECT doc_id,
                   ((length(clean_text) - length(replace(clean_text, 'the', '')))
                    / 3)::BIGINT AS n_matches,
                   (strpos(clean_text, 'the') - 1)::INT AS first_start
            FROM cleaned WHERE strpos(clean_text, 'the') > 0
        """,
        "geometry_parse": """
            SELECT doc_id, 1::INT AS n_lines, doc_id::DOUBLE AS x2,
                   (doc_id * 2)::DOUBLE AS y2, '--' AS style,
                   2::INT AS n_endpoints,
                   (doc_id % 9 + 1)::DOUBLE AS circle_radius
            FROM documents
        """,
        "mode_metrics": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT doc_id, length(text) AS nin,
                       length(trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET})) AS nout
                FROM t
            )
            SELECT 'grounding' AS tool, count(*) AS n_turns,
                   sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_truncated,
                   0::BIGINT AS n_errors,
                   sum(nin)::BIGINT AS chars_in, sum(nout)::BIGINT AS chars_out,
                   round(avg(nout), 2) AS avg_chars_out
            FROM cleaned
        """,
        "conv_skew": """
            WITH sizes AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
            SELECT count(*)::BIGINT AS n_convs, sum(n)::BIGINT AS n_turns_total,
                   max(n)::BIGINT AS max_conv_turns
            FROM sizes
        """,
        # relational
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "region_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "segment_order_stats": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(avg(o_totalprice), 4) AS avg_price,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rk FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders) WHERE rk <= 3
        """,
        "running_customer_spend": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                         AS running_spend
            FROM orders
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "nation_returned_share": """
            SELECT n_name,
                   round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
                         / count(*), 6) AS returned_share
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "part_type_stats": """
            SELECT upper(substr(p_type, 1, 5)) AS type_prefix,
                   count(*) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price,
                   max(length(p_name)) AS max_name_len
            FROM part GROUP BY 1 ORDER BY 1
        """,
        "orders_by_month": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "supplier_balance_rank": """
            SELECT n_name, s_suppkey, rk FROM (
                SELECT n_name, s_suppkey,
                       rank() OVER (PARTITION BY n_name
                                    ORDER BY s_acctbal DESC, s_suppkey) AS rk
                FROM supplier JOIN nation ON s_nationkey = n_nationkey)
            WHERE rk <= 2
        """,
        "priority_set_ops": """
            SELECT DISTINCT o_custkey AS custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND o_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '5-LOW')
            ORDER BY custkey
        """,
        "orders_rollup": """
            SELECT coalesce(yr::VARCHAR, 'ALL') AS yr,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM (SELECT year(o_orderdate)::INT AS yr, o_orderpriority,
                         o_totalprice FROM orders)
            GROUP BY ROLLUP (yr, o_orderpriority)
        """,
        "asof_latest_order": """
            SELECT e.event_id, e.user_id,
                   o2.o_orderkey AS asof_orderkey,
                   round(o2.o_totalprice, 2) AS asof_totalprice
            FROM events e LEFT JOIN LATERAL (
                SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
                ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
            ) o2 ON true
        """,
        "orders_range_join": """
            SELECT l.o_orderkey AS left_key, r.o_orderkey AS right_key,
                   l.o_custkey
            FROM orders l JOIN orders r
            ON l.o_custkey = r.o_custkey
            AND r.o_orderdate <= l.o_orderdate
            AND l.o_orderdate < r.o_orderdate + INTERVAL 30 DAY
        """,
        "event_sessions": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events)
            -- ::BIGINT: DuckDB sum() window yields HUGEINT which pandas
            -- renders as float64 and the driver hashes 3.0 vs Spark's 3
            SELECT user_id, max(sess)::BIGINT AS n_sessions, count(*) AS n_events FROM (
                SELECT user_id,
                       sum(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS sess
                FROM g) GROUP BY user_id
        """,
        "event_type_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                   event_type, count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_props_k": """
            -- TRY_CAST: a props row without "k" gives '' which ::INT would
            -- ERROR on in DuckDB, while Spark's cast nulls it
            SELECT event_type,
                   round(avg(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)), 4) AS avg_k,
                   max(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # data pipeline
        "doc_exact_dedup": """
            SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "doc_dedup_corpus": """
            SELECT doc_id, text, lang, source FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        """,
        "doc_hash_split": """
            WITH b AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT
                            AS INT) AS bucket_256
                FROM documents)
            SELECT doc_id, bucket_256,
                   CASE WHEN bucket_256 < 230 THEN 'train'
                        WHEN bucket_256 < 243 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "doc_jaccard_pairs": shingle_cte + """
            , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            -- df cap mirrors jaccard_pairs(df_max=256): hot shingles leave
            -- the candidate join AND the intersection, union stays full
            keep AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
                     WHERE df <= 256),
            fsh AS (SELECT doc_id, sh FROM sh WHERE sh IN (SELECT sh FROM keep)),
            common AS (
                SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
                FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id1, id2,
                   round(n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common), 6) AS jaccard
            FROM common JOIN sizes s1 ON id1 = s1.doc_id
            JOIN sizes s2 ON id2 = s2.doc_id
            WHERE n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common) >= 0.3
        """,
        "doc_minhash": shingle_cte + """
            SELECT doc_id,
                   min(md5('p0:' || sh)) AS mh_0, min(md5('p1:' || sh)) AS mh_1,
                   min(md5('p2:' || sh)) AS mh_2, min(md5('p3:' || sh)) AS mh_3
            FROM sh GROUP BY doc_id
        """,
        "doc_lsh_pairs": shingle_cte + """
            , sig AS (
                SELECT doc_id,
                       min(md5('p0:' || sh)) AS mh_0, min(md5('p1:' || sh)) AS mh_1,
                       min(md5('p2:' || sh)) AS mh_2, min(md5('p3:' || sh)) AS mh_3
                FROM sh GROUP BY doc_id),
            bands AS (
                SELECT doc_id, 0 AS band_id, md5(mh_0 || ',' || mh_1) AS bh FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band_id, md5(mh_2 || ',' || mh_3) AS bh FROM sig),
            cand AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id)
            SELECT id1, id2,
                   round(((s1.mh_0 = s2.mh_0)::INT + (s1.mh_1 = s2.mh_1)::INT +
                          (s1.mh_2 = s2.mh_2)::INT + (s1.mh_3 = s2.mh_3)::INT) / 4.0, 6)
                          AS est_jaccard
            FROM cand JOIN sig s1 ON id1 = s1.doc_id JOIN sig s2 ON id2 = s2.doc_id
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_ws_tokens,
                   length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id, length(text) AS n_chars,
                   length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                         / (length(text) + 1), 6) AS punct_ratio,
                   round(((length(' ' || lower(text) || ' ')
                           - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5.0)
                         / (length(regexp_extract_all(text, '[A-Za-z0-9]+')) + 1), 6)
                         AS stopword_ratio,
                   round(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) * 1.0
                         / (length(regexp_extract_all(text, '[A-Za-z0-9]+')) + 1), 6)
                         AS mean_word_len
            FROM documents
        """,
        "doc_lang_id": f"""
            WITH scored AS (SELECT doc_id, {lang_cols} FROM documents)
            SELECT doc_id, {lang_pred} AS lang_pred,
                   score_en, score_de, score_fr, score_es
            FROM scored
        """,
        "doc_fingerprints": """
            SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM documents
        """,
        "media_decode": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text))::INT AS n_bytes,
                   round(list_avg(list_transform(regexp_extract_all(text, '.'),
                                                 c -> ord(c))), 6) AS mean_byte,
                   (320 + doc_id % 1280)::INT AS width,
                   (240 + (doc_id * 3) % 960)::INT AS height,
                   round((320 + doc_id % 1280) * 1.0
                         / (240 + (doc_id * 3) % 960), 6) AS aspect_ratio
            FROM documents
        """,
        "media_resize_plan": """
            SELECT doc_id AS media_id,
                   (320 + doc_id % 1280)::INT AS width,
                   (240 + (doc_id * 3) % 960)::INT AS height,
                   round(least(640.0 / (320 + doc_id % 1280),
                               640.0 / (240 + (doc_id * 3) % 960)), 6) AS scale,
                   floor((320 + doc_id % 1280) *
                         least(640.0 / (320 + doc_id % 1280),
                               640.0 / (240 + (doc_id * 3) % 960)))::INT AS out_w,
                   floor((240 + (doc_id * 3) % 960) *
                         least(640.0 / (320 + doc_id % 1280),
                               640.0 / (240 + (doc_id * 3) % 960)))::INT AS out_h
            FROM documents
        """,
        "ann_cosine_topk": """
            -- zero-norm guard mirrors the Spark side (which nulls them):
            -- DuckDB's list_cosine_similarity yields NaN there, and NaN
            -- sorts FIRST under DESC, which would hijack the top-k
            SELECT vec_id,
                   CASE WHEN list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]) > 0
                        THEN round(list_cosine_similarity(embedding::DOUBLE[],
                             (SELECT embedding::DOUBLE[] FROM embeddings
                              WHERE vec_id = 0)), 6)
                   END AS cosine
            FROM embeddings
            ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 10
        """,
        "embedding_label_stats": """
            SELECT label, count(*) AS n,
                   round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                                   embedding::DOUBLE[]))), 4) AS avg_norm
            FROM embeddings GROUP BY label ORDER BY label
        """,
        # vision_tokens, doc_chunk_fps, doc_simhash_pairs, ann_lsh_topk,
        # embedding_near_dups: no SQL analog (custom arithmetic / numpy /
        # LSH recall<1) → driver records rows-only checks.
    }
