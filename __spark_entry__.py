"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction DAG on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents, one per entry
(full coverage: every catalog query is value-checked).

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

def _coords():
    """The doc-dependent det coords literal shared by every synthetic
    grounding fixture (one definition: the three transcript builders and
    the oracle SQL must all agree on it)."""
    return F.concat(
        F.lit("[["),
        (F.col("doc_id") % 999).cast("string"), F.lit(","),
        ((F.col("doc_id") * 7) % 999).cast("string"), F.lit(","),
        (F.col("doc_id") % 999).cast("string"), F.lit(","),
        ((F.col("doc_id") * 13) % 999).cast("string"),
        F.lit("]]"),
    )


def _doc_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grounding turn per document: a title ref with doc-dependent
    coords + the doc text + EOS for all but every 7th doc (truncation case).
    conv_id = source, turn_idx = doc_id."""
    d = _t(spark, sf_dir, "documents")
    coords = _coords()
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
    coords = _coords()
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
    # T1/T2/T8 tile + token arithmetic as a column function over part dims;
    # oracle-checked against the SQL closed form (_vision_tokens_sql)
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


def q_markdown_embed_b64(spark, sf_dir):
    """E14 full analog: crop records joined to the media payload table,
    placeholders spliced with data:image/png;base64 URIs (count=1 each,
    reference app/utils.py:130-147); payload bytes come from the
    deterministic fake codec (synth_media)."""
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.pipeline.multimodal import synth_media
    from sparkocr.regions import embed_crops_in_markdown_b64

    turns = extract_turns(_img_transcripts(spark, sf_dir))
    d = _t(spark, sf_dir, "documents")
    # page identity (conv_id, turn_idx) ← (source, doc_id), payload from
    # the fake codec's media table
    media = synth_media(d).join(
        d.select(
            F.col("doc_id").alias("media_id"), F.col("source").alias("conv_id")
        ),
        "media_id",
    ).select("conv_id", F.col("media_id").alias("turn_idx"), "payload")
    return embed_crops_in_markdown_b64(turns, media).select(
        F.col("turn_idx").cast("bigint").alias("doc_id"), "markdown_embedded"
    )


def q_repeat_flags(spark, sf_dir):
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_img_transcripts(spark, sf_dir))
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"), "has_repeat"
    )


def q_locate_with_spans(spark, sf_dir):
    """Q3 locate, row-level with the grounded-span overlap join (supersedes
    round-1's aggregate-only locate_stats): needle 'itl' hits inside the
    'title' label span (offset 1) on every doc plus any body occurrences,
    exercising both the overlap row and the no-overlap null row."""
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import locate_with_spans

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    hits = locate_with_spans(turns, "itl")
    return hits.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "match_start", "match_end", "span_start", "span_end", "label",
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


def q_pipeline_metrics(spark, sf_dir):
    """mode_metrics + conversation_skew counters in one entry (merged so
    the 50-entry driver check covers every catalog row; exact columns only
    — percentiles are approximate by design and stay out of the oracle).
    Single extraction pass: both finals share a (conv_id, tool) partial
    aggregate whose exchange Spark reuses."""
    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.metrics import pipeline_metrics

    turns = extract_turns(_doc_transcripts(spark, sf_dir))
    return pipeline_metrics(turns).select(
        "tool", "n_turns", "n_truncated", "n_errors",
        "chars_in", "chars_out", "avg_chars_out",
        "n_convs", "n_turns_total", "max_conv_turns",
    )


def q_doc_assembly_det(spark, sf_dir):
    """_det.mmd variant: UNCLEANED grounded text + page-split concat
    (run_dpsk_ocr_pdf.py:302-304) — branches off the raw transcripts."""
    from sparkocr.assemble import assemble_docs_det

    return assemble_docs_det(_doc_transcripts(spark, sf_dir)).select(
        "conv_id", "n_turns", "doc_text"
    )


def _cli_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts exercising the CLI PDF cleanup algebra (E4/E5): an image
    ref (→ replace-ALL link), an 'other' ref (→ removal), a 4-newline run
    and latex colon-eq tokens (→ the per-other-match replace chain), EOS on
    all but every 7th doc (→ SKIP_REPEAT drop)."""
    d = _t(spark, sf_dir, "documents")
    coords = _coords()
    text = F.concat(
        F.lit("<|ref|>image<|/ref|><|det|>"), coords, F.lit("<|/det|>"),
        F.col("text"),
        F.lit("<|ref|>footnote<|/ref|><|det|>[[5,6,7,8]]<|/det|>"),
        F.lit("\n\n\n\na \\coloneqq b \\eqqcolon c"),
        F.when(F.col("doc_id") % 7 != 0, F.lit(EOS)).otherwise(F.lit("")),
    )
    return d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        text.alias("text"),
        F.lit("grounding_cli").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def q_pdf_cli_clean(spark, sf_dir):
    """E4/E5 end-to-end: the CLI PDF per-page cleanup (replace-ALL image
    links named by jdx=turn_idx, other-ref removal, latex fixes, newline
    collapse, SKIP_REPEAT drop) through extract_turns' grounding_cli mode
    (reference run_dpsk_ocr_pdf.py:292-320)."""
    from sparkocr.extract.dispatch import extract_turns

    turns = extract_turns(_cli_transcripts(spark, sf_dir))
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"),
        "clean_text",
        "is_truncated",
    )


def q_eval_batch_clean(spark, sf_dir):
    """E11 end-to-end: eval-batch cleanup (clean_formula, ref removal,
    LITERAL backslash-n run collapse, <center> removal) through
    extract_turns' grounding_eval mode (run_dpsk_ocr_eval_batch.py:156-169)."""
    from sparkocr.extract.dispatch import extract_turns

    d = _t(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit("<|ref|>eq<|/ref|><|det|>[[1,2,3,4]]<|/det|>"),
        F.lit("<center>"), F.col("text"), F.lit("</center>"),
        F.lit("\\n\\n\\n\\n"),  # literal backslash-n escape run, not newlines
        F.lit("\\[ E=mc^2 \\quad (mass) \\]"),
    )
    tr = d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        payload.alias("text"),
        F.lit("grounding_eval").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    turns = extract_turns(tr)
    return turns.select(
        F.col("turn_idx").cast("bigint").alias("doc_id"), "clean_text"
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


def q_segment_customer_coverage(spark, sf_dir):
    """Per-segment order stats + anti-join coverage in one entry: total
    customers, customers with orders, customers WITHOUT orders (left-anti),
    order count, average price. Merges the round-1 segment_order_stats and
    customers_without_orders entries so both demos stay driver-checked
    under the 50-entry cap."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    totals = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))
    # no broadcast hint: customer is data-sized (unlike nation/region) —
    # a forced broadcast would OOM at scale; AQE picks broadcast when the
    # side is actually small
    ordering = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.countDistinct("o_custkey").alias("n_ordering_customers"),
        )
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        totals.join(ordering, "c_mktsegment", "left")
        .join(without, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            "n_customers",
            "n_ordering_customers",
            F.coalesce("n_without_orders", F.lit(0)).cast("bigint").alias("n_without_orders"),
            "n_orders",
            "avg_price",
        )
        .orderBy("c_mktsegment")
    )


def q_customer_order_windows(spark, sf_dir):
    """Two window specs over one scan: per-customer price rank
    (row_number) and running spend (unbounded-preceding sum). Merges the
    round-1 top_orders_per_customer and running_customer_spend entries."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_rank).alias("price_rank"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
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
    # ADAPTIVE skew dispatch: the chunked two-phase plan (last-carry
    # window per (user, 30-day chunk)) engages only when a key-column
    # probe finds a user with >= 5M rows. Threshold re-measured round 5:
    # a single-task window over a 3M-row hot key costs 0.24 s while the
    # chunked plan's extra stages cost ~2 s flat — chunking only pays
    # when one key's rows reach the 10^7+ range where a one-task sort
    # becomes seconds-long and spill-prone. Below the threshold the
    # dispatch itself is free at small SFs: a parquet-footer row-count
    # bound (no Spark job) proves no key can reach 5M before the probe
    # job ever launches. The chunked branch's semantics stay oracle-
    # checked via q_event_sessions (unconditional chunking) and
    # differential pytest.
    j = asof_join(
        e, o, key="user_id", left_time="ts", right_time="otime",
        right_cols=["o_orderkey", "o_totalprice"], right_tiebreak="o_orderkey",
        chunk_seconds=30 * 86400, chunk_min_key_rows=5_000_000,
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
    """30-min-gap sessionization per user. session_counts' fractional-epoch
    arithmetic matches the DuckDB oracle exactly (unix_timestamp() would
    truncate); chunk_seconds engages the skew-safe two-phase plan — break
    counting per (user, week) window + boundary gaps over one summary row
    per chunk, so a bot user with 10^9 events is #weeks tasks, not one.
    Chunking is deliberately UNCONDITIONAL here (no chunk_min_key_rows):
    this is the catalog entry that keeps the chunked branch value-checked
    by the DuckDB oracle now that q_asof_latest_order dispatches
    adaptively and runs unchunked at oracle/bench scale."""
    from sparkocr.pipeline.relational_ext import session_counts

    e = _t(spark, sf_dir, "events")
    return session_counts(
        e, key="user_id", time="ts", gap_seconds=1800, chunk_seconds=7 * 86400
    )


def q_event_hourly_stats(spark, sf_dir):
    """event_type_hourly + event_props_k merged in round 4 (freeing a
    catalog slot under the driver's 50-entry cap for doc_contamination):
    the hour truncation/formatting, per-type counts and value sums, AND
    the JSON props "k" regexp extraction are all value-checked through
    one (hour, event_type) output."""
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    return (
        e.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "value",
            k.alias("k"),
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("hour", "event_type")
    )


# --------------------------------------------------------------------------
# Data-pipeline catalog (documents / embeddings)
# --------------------------------------------------------------------------

def q_doc_dedup_corpus(spark, sf_dir):
    """exact_dedup + dedup_corpus in ONE entry (merged in round 3 to free
    a catalog slot for doc_dup_clusters): the kept canonical rows carry
    their group's n_dups, so the dedup relation (group sizes, min-id
    canonical choice) and the materialization (full surviving rows) are
    both value-checked through one output."""
    from sparkocr.pipeline.dedup import dedup_corpus, exact_dedup

    docs = _t(spark, sf_dir, "documents")
    groups = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"), "n_dups")
    return dedup_corpus(docs).join(groups, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_dups"
    )


def q_doc_dup_clusters(spark, sf_dir):
    """End-to-end near-dup pipeline tail: candidate pairs (exact n-gram
    jaccard, df-capped) → connected components → (doc_id, cluster_id =
    min reachable id), singletons included. The oracle replays the
    transitive closure with a recursive CTE."""
    from sparkocr.pipeline import caching
    from sparkocr.pipeline.dedup import dup_clusters, jaccard_pairs

    # release the PREVIOUS cache-registering operator's handles (driver
    # convention — see q_doc_jaccard_pairs); dup_clusters consumes the
    # pairs eagerly, so jaccard's own shingle cache is also done after
    # this entry and the NEXT release_all() drops it
    caching.release_all()

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, k=8, threshold=0.3, df_max=256)
    return dup_clusters(pairs, nodes=docs.select("doc_id")).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def q_doc_pack_assignments(spark, sf_dir):
    """Sequence packing value-checked end-to-end (round 4 — absorbed the
    doc_hash_split entry, whose bucket/split columns ride along, so one
    output checks hash_split's md5 bucketing AND the greedy next-fit
    packer). The stream assignment is hash_split's engine-portable md5
    bucket (group_col), so the DuckDB oracle can replay the exact pack
    walk with a recursive CTE over the same (group, doc_id)-sorted
    stream; budget 100 on ~40-ws-token docs yields 2-3 doc packs with
    plenty of boundary cases."""
    from sparkocr.pipeline.dedup import hash_split
    from sparkocr.pipeline.packing import pack_sequences

    docs = hash_split(_t(spark, sf_dir, "documents"))
    src = docs.withColumn("grp", (F.col("bucket_256") % 8).cast("int"))
    packed = pack_sequences(src, budget=100, n_groups=8, group_col="grp")
    return packed.join(
        docs.select("doc_id", "bucket_256", "split"), "doc_id"
    ).select(
        "doc_id", "n_tokens", "group_id", "pack_id", "pack_pos",
        "bucket_256", "split",
    )


def q_doc_contamination(spark, sf_dir):
    """Benchmark decontamination value-checked (round 4): the benchmark
    is a deterministic slice of the corpus itself (doc_id % 50 == 3), so
    the flagged set covers self-matches, exact dups, and near-dups that
    share a 13-gram. Runs with the DEFAULT prefix pre-probe, so the
    pruned-window branch is itself under the oracle (the same discipline
    doc_lsh_pairs applies to its hot-bucket cap)."""
    from sparkocr.pipeline.decontam import contamination_flags

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter((F.col("doc_id") % 50) == 3).select("text")
    return contamination_flags(docs, bench, n=13)


def q_doc_jaccard_pairs(spark, sf_dir):
    from sparkocr.pipeline.dedup import jaccard_pairs
    from sparkocr.pipeline import caching

    # release the PREVIOUS cache-registering operator's handles: a driver
    # evaluating all 50 entries in one session has no release hook of its
    # own, so accumulation is bounded to one operator's caches at a time
    # (this thread's registry only — a user's own caches are never touched)
    caching.release_all()

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
    from sparkocr.pipeline import caching

    # release the PREVIOUS cache-registering operator's handles: a driver
    # evaluating all 50 entries in one session has no release hook of its
    # own, so accumulation is bounded to one operator's caches at a time
    # (this thread's registry only — a user's own caches are never touched)
    caching.release_all()

    # bucket_max=9 exercises the hot-bucket cap under the oracle: the
    # sf0.01 corpus has band buckets of up to 14 docs, so the capped
    # semi-join branch actually DROPS buckets and the SQL mirror applies
    # the identical membership filter (value-checking the cap path, not
    # just its no-op default)
    return lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), n_perm=4, band_rows=2, k=8, bucket_max=9
    )


def q_doc_token_counts(spark, sf_dir):
    # fingerprint=True folds the md5 document fingerprint (round-1's
    # doc_fingerprints entry) into the same single-scan projection
    from sparkocr.pipeline.textstats import token_counts

    return token_counts(_t(spark, sf_dir, "documents"), fingerprint=True)


def q_doc_quality(spark, sf_dir):
    from sparkocr.pipeline.textstats import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def q_doc_lang_id(spark, sf_dir):
    from sparkocr.pipeline.textstats import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_doc_chunk_fps(spark, sf_dir):
    # chunk count + first fingerprint, oracle-replayed positionally
    from sparkocr.pipeline.textstats import chunk_fingerprints

    return chunk_fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.size("chunk_fps").alias("n_chunks"), F.col("chunk_fps")[0].alias("first_fp")
    )


def q_doc_simhash_pairs(spark, sf_dir):
    from sparkocr.pipeline.dedup import simhash_near_dups
    from sparkocr.pipeline import caching

    # release the PREVIOUS cache-registering operator's handles: a driver
    # evaluating all 50 entries in one session has no release hook of its
    # own, so accumulation is bounded to one operator's caches at a time
    # (this thread's registry only — a user's own caches are never touched)
    caching.release_all()

    # 3 = the largest radius the 4-chunk blocking covers completely —
    # which is exactly what lets the oracle verify it against the
    # brute-force all-pairs hamming definition
    return simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_media_decode_resize(spark, sf_dir):
    """Decode stats + resize plan in one pipeline (merged round-1 entries):
    the resize arithmetic needs only (width, height), which decode_stats
    already emits, so the plan stays one MapInPandas + a JVM projection —
    no join, no second scan."""
    from sparkocr.pipeline.multimodal import decode_stats, resize_exprs, synth_media

    d = decode_stats(synth_media(_t(spark, sf_dir, "documents")))
    # resize_exprs: the ONE definition of the resize arithmetic (exact
    # integer out dims — a hand-copied float variant here drifted by one
    # pixel on binding dimensions like 1077)
    scale, out_w, out_h = resize_exprs(F.col("width"), F.col("height"), 640)
    return d.select(
        "media_id", "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        "width", "height",
        F.round("aspect_ratio", 6).alias("aspect_ratio"),
        F.round(scale, 6).alias("scale"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
    )


def q_media_frame_sample(spark, sf_dir):
    # even-split frame slices + md5-prefix checksums, fully replayed by
    # the SQL oracle (frame bytes are the ASCII payload text)
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
    # IVF probe: recall < 1 by design vs brute force (pytest asserts the
    # recall); the oracle replays the same cell assignment + probe, so the
    # probed result itself is value-checked exactly
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
    from sparkocr.pipeline import caching

    # release the PREVIOUS cache-registering operator's handles: a driver
    # evaluating all 50 entries in one session has no release hook of its
    # own, so accumulation is bounded to one operator's caches at a time
    # (this thread's registry only — a user's own caches are never touched)
    caching.release_all()

    # threshold 0.3 (not the production-ish 0.9 default): the synthetic
    # random embeddings have no cosine>=0.9 pairs at any SF, and a
    # zero-row result would make the value check vacuous — 0.3 yields
    # real bucketed pairs for the oracle to verify
    return embedding_near_dups(_t(spark, sf_dir, "embeddings"), threshold=0.3)


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
    """Exactly 50 entries: the round-1 driver checked only the first 50 of
    56, so low-value entries were merged (segment stats + anti-join, the
    two window demos, mode/skew metrics, decode + resize, fingerprints into
    token counts; round 3 merged exact_dedup into dedup_corpus; round 4
    merged the two event demos into event_hourly_stats and folded
    doc_hash_split into doc_pack_assignments) so the round-4 additions
    (sequence packing, benchmark decontamination) fit under the cap with
    every entry checked."""
    return {
        # extraction surface
        "extract_clean": q_extract_clean,
        "extract_spans": q_extract_spans,
        "doc_assembly": q_doc_assembly,
        "doc_assembly_app": q_doc_assembly_app,
        "doc_assembly_det": q_doc_assembly_det,
        "pdf_cli_clean": q_pdf_cli_clean,
        "eval_batch_clean": q_eval_batch_clean,
        "page_slice": q_page_slice,
        "vision_tokens": q_vision_tokens,
        "crop_regions": q_crop_regions,
        "payload_chunks": q_payload_chunks,
        "pdf_reading_order": q_pdf_reading_order,
        "html_main_extract": q_html_main_extract,
        "md_table_extract": q_md_table_extract,
        "label_colors": q_label_colors,
        "markdown_embed": q_markdown_embed,
        "markdown_embed_b64": q_markdown_embed_b64,
        "repeat_flags": q_repeat_flags,
        "locate_with_spans": q_locate_with_spans,
        "geometry_parse": q_geometry_parse,
        "pipeline_metrics": q_pipeline_metrics,
        # relational catalog
        "pricing_summary": q_pricing_summary,
        "region_revenue": q_region_revenue,
        "segment_customer_coverage": q_segment_customer_coverage,
        "customer_order_windows": q_customer_order_windows,
        "priority_set_ops": q_priority_set_ops,
        "orders_rollup": q_orders_rollup,
        "asof_latest_order": q_asof_latest_order,
        "orders_range_join": q_orders_range_join,
        "event_sessions": q_event_sessions,
        "event_hourly_stats": q_event_hourly_stats,
        # data-pipeline catalog
        "doc_dedup_corpus": q_doc_dedup_corpus,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_pack_assignments": q_doc_pack_assignments,
        "doc_contamination": q_doc_contamination,
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "doc_minhash": q_doc_minhash,
        "doc_lsh_pairs": q_doc_lsh_pairs,
        "doc_token_counts": q_doc_token_counts,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "doc_chunk_fps": q_doc_chunk_fps,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "media_decode_resize": q_media_decode_resize,
        "media_frame_sample": q_media_frame_sample,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_label_stats": q_embedding_label_stats,
        "embedding_near_dups": q_embedding_near_dups,
    }


def _vision_tokens_sql() -> str:
    """SQL closed form of num_image_tokens_mode(..., 'gundam') (T1/T2/T8):
    enumerates the candidate tile ratios IN THE SEQUENCE count_tiles scans
    them (the tie-break is order-dependent) and replays the scan's
    semantics — first minimal-diff ratio wins unless a LATER equal-diff
    ratio passes the area test (process/image_process.py:11-42)."""
    import math

    from sparkocr.textproc.tiles import MAX_CROPS, MIN_CROPS

    target_ratios = set(
        (i, j)
        for n in range(MIN_CROPS, MAX_CROPS + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if i * j <= MAX_CROPS and i * j >= MIN_CROPS
    )
    ordered = sorted(target_ratios, key=lambda x: x[0] * x[1])
    values = ", ".join(
        f"({ord_}, {i}, {j}, {i / j!r})" for ord_, (i, j) in enumerate(ordered)
    )
    # gundam mode: base=1024, image=640 → h=w=16, h2=w2=10 (deepseek_ocr.py
    # :61-106); global = 16*17 = 272, +1 separator
    assert math.ceil((1024 // 16) / 4) == 16 and math.ceil((640 // 16) / 4) == 10
    return f"""
        WITH dims AS (
            SELECT p_partkey,
                   (512 + p_partkey % 1600)::INT AS w,
                   (512 + (p_partkey * 3) % 1600)::INT AS h
            FROM part),
        ratios(ord, i, j, ar) AS (VALUES {values}),
        scored AS (
            SELECT d.p_partkey, d.w, d.h, r.ord, r.i, r.j,
                   abs(d.w * 1.0 / d.h - r.ar) AS diff,
                   (d.w * 1.0 * d.h > 0.5 * 640 * 640 * r.i * r.j) AS areaok
            FROM dims d, ratios r),
        best AS (
            SELECT p_partkey, min(diff) AS dstar FROM scored GROUP BY 1),
        pick AS (
            SELECT s.p_partkey,
                   min(s.ord) FILTER (WHERE s.diff = b.dstar) AS first_ord,
                   max(s.ord) FILTER (WHERE s.diff = b.dstar AND s.areaok)
                       AS last_ok_ord
            FROM scored s JOIN best b USING (p_partkey)
            GROUP BY 1),
        chosen AS (
            SELECT d.p_partkey, d.w, d.h, r.i, r.j
            FROM dims d JOIN pick p USING (p_partkey)
            JOIN ratios r ON r.ord = coalesce(p.last_ok_ord, p.first_ord))
        SELECT p_partkey,
               CASE WHEN w <= 640 AND h <= 640 THEN 273
                    ELSE (272 + (j * 10) * (i * 10 + 1) + 1)::INT
               END AS n_vision_tokens
        FROM chosen
    """


def _lsh_sig_sql(col: str, n_planes: int = 12, dim: int = 64) -> str:
    """SQL bit-packed random-hyperplane signature of ``col`` (a DOUBLE[]
    expression): the seeded planes are deterministic, so they embed as
    literals and DuckDB replays the exact signature the Arrow-batched UDF
    computes. Verified empirically: zero sign disagreements across every
    SF (min |dot| margin ~5e-5, float-rounding noise ~1e-13)."""
    from sparkocr.pipeline.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ",".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product({col}, {lit}) > 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _simhash_sql() -> str:
    """CTE computing each doc's 64-bit SimHash exactly as
    ``_simhash64_impl`` does: whitespace tokens, token hash = first 8
    md5-digest bytes as uint64, per-bit majority vote, packed into a
    SIGNED int64 (bit 63 contributes the int64 minimum, matching numpy's
    uint64→int64 wrap)."""
    votes = ", ".join(
        # cast each bit to signed BEFORE the -1: the expression would
        # otherwise stay UBIGINT and underflow on 0 - 1
        f"sum(2 * ((h >> {j}) & 1)::BIGINT - 1) AS v{j}" for j in range(64)
    )
    low_bits = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(63)
    )
    sig = (
        f"(CASE WHEN v63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END "
        f"+ ({low_bits}))"
    )
    return f"""
        toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5(t.tok), 1, 16))::UBIGINT AS h
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS t(tok)),
        votes AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id),
        sigs AS (
            SELECT d.doc_id, coalesce({sig}, 0)::BIGINT AS sig
            FROM documents d LEFT JOIN votes v USING (doc_id))
    """


def _chunk_fps_sql() -> str:
    """SQL replay of the rolling-hash content-defined chunker for the
    columns the entry exposes (chunk count + first fingerprint): windowed
    polynomial base 257 mod 2^31-1 over the ASCII bytes (each 16-term
    window sum < 2^44, safe in BIGINT), boundary where the low 6 bits are
    all ones. Position bound 4096 exceeds every fixture text length
    (max 577)."""
    from sparkocr.pipeline.textstats import _BASE, _CHUNK_MASK, _MOD, _WINDOW

    terms = " + ".join(
        # ::BIGINT before the multiply: ord() is INT32 and byte * 2^31-ish
        # power overflows 32 bits
        f"ord(substr(text, i + {k + 1}, 1))::BIGINT * {pow(_BASE, _WINDOW - 1 - k, _MOD)}"
        for k in range(_WINDOW)
    )
    return f"""
        pos AS (
            SELECT doc_id, text, r.range::INT AS i
            FROM documents, range(0, 4096) r
            WHERE length(text) >= {_WINDOW}
              AND r.range <= length(text) - {_WINDOW}),
        cuts AS (
            SELECT doc_id, i + {_WINDOW} AS cut
            FROM pos
            WHERE (({terms}) % {_MOD}) & {_CHUNK_MASK} = {_CHUNK_MASK}),
        cagg AS (
            SELECT c.doc_id, min(c.cut) AS first_cut,
                   count(*) FILTER (WHERE c.cut < length(d.text)) AS n_cuts
            FROM cuts c JOIN documents d USING (doc_id)
            GROUP BY c.doc_id)
    """


def _cosine_guard_sql(a: str, b: str) -> str:
    """NaN-safe cosine: DuckDB sorts/compares NaN ABOVE every double, so an
    unguarded zero vector would pass >= thresholds and hijack top-k; null
    instead, mirroring the Spark side's zero-norm guard."""
    return (
        f"CASE WHEN list_dot_product({a}, {a}) > 0 "
        f"AND list_dot_product({b}, {b}) > 0 "
        f"THEN round(list_cosine_similarity({a}, {b}), 6) END"
    )


def oracle_sql() -> dict[str, str]:
    from sparkocr.pipeline.textstats import LANGS, lang_score_sql

    from sparkocr.pipeline.textstats import _WINDOW as _W  # noqa: N811 — keeps the
    # chunk-fps short-text branch in lockstep with the operator constant

    # coalesce mirrors textstats.lang_id: NULL text scores 0 / 'und'
    _txt = "coalesce(text, '')"
    lang_cols = ", ".join(
        f"round({lang_score_sql(_txt, l)}, 6) AS score_{l}" for l in LANGS
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

    # affine-minhash mirror (dedup.minhash_signatures): one md5 per
    # shingle → 60-bit int mod 2^31-1 → per-perm affine minima with the
    # exact mh_affine_params(4) constants the Spark side uses. The Spark
    # side signatures the first 2^20 chars (MH_MAX_CHARS); like the
    # shingle CTE's own range(1, 4096) bound, that cap cannot bind on the
    # <4096-char oracle documents, so the shared `sh` CTE mirrors exactly.
    from sparkocr.pipeline.dedup import MH_PRIME, mh_affine_params

    mh_hm_cte = f"""
        , shx AS (
            SELECT doc_id,
                   (('0x' || substr(md5(sh), 1, 15))::BIGINT % {MH_PRIME}) AS hm
            FROM sh
        )"""
    mh_cols = ", ".join(
        f"min(({a} * hm + {b}) % {MH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(mh_affine_params(4))
    )

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
        "vision_tokens": _vision_tokens_sql(),
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
        "doc_assembly_det": f"""
            -- _det.mmd: raw text minus EOS (markers intact) + page split,
            -- EOS-less pages (doc_id % 7 = 0) skipped like the clean file
            WITH t AS ({_DOC_TRANSCRIPT_SQL})
            SELECT conv_id, count(*)::INT AS n_turns,
                   string_agg(replace(text, '{EOS}', '') || chr(10) || chr(10) ||
                              '<--- Page Split --->' || chr(10),
                              '' ORDER BY doc_id) AS doc_text
            FROM t WHERE doc_id % 7 <> 0 GROUP BY conv_id
        """,
        "pdf_cli_clean": """
            -- closed form of run_dpsk_ocr_pdf.py:292-320 on the CLI
            -- fixture: image ref -> ![](images/{jdx}_0.jpg)\\n (replace
            -- all), other ref removed, \\coloneqq/\\eqqcolon fixed, the
            -- 4-newline run collapsed to 2; EOS-less pages drop to ''
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN ''
                        ELSE '![](images/' || doc_id || '_0.jpg)' || chr(10) ||
                             text || chr(10) || chr(10) || 'a := b =: c'
                   END AS clean_text,
                   (doc_id % 7 = 0) AS is_truncated
            FROM documents
        """,
        "eval_batch_clean": """
            -- closed form of run_dpsk_ocr_eval_batch.py:156-169: ref
            -- removed, <center> tags dropped, LITERAL backslash-n run
            -- collapsed 4 -> 2 (those are 2-char escape sequences, not
            -- newlines), clean_formula strips the \\quad annotation
            SELECT doc_id,
                   text || '\\n\\n' || '\\[E=mc^2\\]' AS clean_text
            FROM documents
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
        "markdown_embed_b64": f"""
            -- placeholder -> reference's b64 splice (app/utils.py:139-147):
            -- '\\n\\n![图片 1](data:image/png;base64,B64)\\n\\n', payload =
            -- fake-codec bytes = utf-8 text
            SELECT doc_id,
                   replace(
                       trim(chr(10) || chr(10) || '**[图片 1]**' ||
                            chr(10) || chr(10) || {_IMG_BODY_SQL}, {_TRIMSET}),
                       '**[图片 1]**',
                       chr(10) || chr(10) || '![图片 1](data:image/png;base64,' ||
                       base64(encode(text)) || ')' || chr(10) || chr(10))
                       AS markdown_embedded
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
        "locate_with_spans": f"""
            -- every occurrence of 'itl' in the cleaned text; the single
            -- grounded span is [0,5) 'title', so only match_start < 5
            -- overlaps (match_end = start+3 > 0 always)
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT doc_id,
                       trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET}) AS clean_text
                FROM t
            ),
            pos AS (
                -- position enumeration bound: must exceed max clean_text
                -- length or matches past it are silently missed (document
                -- texts max 577 chars at every SF; 8192 leaves headroom)
                SELECT doc_id, (r.range - 1)::INT AS match_start
                FROM cleaned, range(1, 8192) r
                WHERE r.range <= length(clean_text) - 2
                  AND substr(clean_text, r.range::INT, 3) = 'itl'
            )
            SELECT doc_id, match_start, (match_start + 3)::INT AS match_end,
                   CASE WHEN match_start < 5 THEN 0::INT END AS span_start,
                   CASE WHEN match_start < 5 THEN 5::INT END AS span_end,
                   CASE WHEN match_start < 5 THEN 'title' END AS label
            FROM pos
        """,
        "geometry_parse": """
            SELECT doc_id, 1::INT AS n_lines, doc_id::DOUBLE AS x2,
                   (doc_id * 2)::DOUBLE AS y2, '--' AS style,
                   2::INT AS n_endpoints,
                   (doc_id % 9 + 1)::DOUBLE AS circle_radius
            FROM documents
        """,
        "pipeline_metrics": f"""
            WITH t AS ({_DOC_TRANSCRIPT_SQL}),
            cleaned AS (
                SELECT doc_id, length(text) AS nin,
                       length(trim(replace('title' || regexp_replace(text,
                            '<\\|ref\\|>.*?<\\|/ref\\|><\\|det\\|>.*?<\\|/det\\|>', '', 's'),
                            '{EOS}', ''), {_TRIMSET})) AS nout
                FROM t
            ),
            mm AS (
                SELECT 'grounding' AS tool, count(*) AS n_turns,
                       sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_truncated,
                       0::BIGINT AS n_errors,
                       sum(nin)::BIGINT AS chars_in, sum(nout)::BIGINT AS chars_out,
                       round(avg(nout), 2) AS avg_chars_out
                FROM cleaned
            ),
            cs AS (
                SELECT count(*)::BIGINT AS n_convs, sum(n)::BIGINT AS n_turns_total,
                       max(n)::BIGINT AS max_conv_turns
                FROM (SELECT source, count(*) AS n FROM documents GROUP BY source)
            )
            SELECT * FROM mm CROSS JOIN cs
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
        "region_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "segment_customer_coverage": """
            WITH t AS (SELECT c_mktsegment, count(*) AS n_customers
                       FROM customer GROUP BY 1),
            o AS (SELECT c_mktsegment, count(*) AS n_orders,
                         round(avg(o_totalprice), 4) AS avg_price,
                         count(DISTINCT o_custkey) AS n_ordering_customers
                  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
            w AS (SELECT c_mktsegment, count(*) AS n_without_orders FROM customer
                  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1)
            SELECT t.c_mktsegment, n_customers, n_ordering_customers,
                   coalesce(n_without_orders, 0)::BIGINT AS n_without_orders,
                   n_orders, avg_price
            FROM t LEFT JOIN o USING (c_mktsegment) LEFT JOIN w USING (c_mktsegment)
            ORDER BY 1
        """,
        "customer_order_windows": """
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                                      AS price_rank,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                         AS running_spend
            FROM orders
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
        "event_hourly_stats": """
            -- TRY_CAST: a props row without "k" gives '' which ::INT would
            -- ERROR on in DuckDB, while Spark's cast nulls it
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                   event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
                   round(avg(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)), 4) AS avg_k,
                   max(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS max_k
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # data pipeline
        "doc_dedup_corpus": """
            -- coalesce = dedup._dedup_key: null-text docs are each their
            -- OWN group, never one collapsed NULL cluster (vacuous on the
            -- current fixtures, but the operator guarantees it); kept
            -- rows carry their group's n_dups so the merged entry checks
            -- exact_dedup's relation AND the corpus materialization
            WITH g AS (
                SELECT coalesce(md5(text), 'null:' || doc_id) AS h,
                       min(doc_id) AS keep_id, count(*) AS n_dups
                FROM documents GROUP BY 1)
            SELECT d.doc_id, d.text, d.lang, d.source, g.n_dups
            FROM documents d JOIN g ON d.doc_id = g.keep_id
        """,
        "doc_dup_clusters": shingle_cte.replace("WITH sh", "WITH RECURSIVE sh") + """
            , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            keep AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
                     WHERE df <= 256),
            fsh AS (SELECT doc_id, sh FROM sh WHERE sh IN (SELECT sh FROM keep)),
            common AS (
                SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
                FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            -- the SAME rounded-threshold pair rule as doc_jaccard_pairs
            pairs AS (
                SELECT id1, id2
                FROM common JOIN sizes s1 ON id1 = s1.doc_id
                JOIN sizes s2 ON id2 = s2.doc_id
                WHERE round(n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common), 6)
                      >= 0.3),
            edges AS (
                SELECT id1 AS u, id2 AS v FROM pairs
                UNION SELECT id2, id1 FROM pairs),
            -- transitive closure: cluster_id = min reachable doc id,
            -- every doc a (possibly singleton) cluster member
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst)
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        """,
        "doc_pack_assignments": """
            -- replays pack_sequences' greedy next-fit walk exactly: the
            -- stream assignment is the engine-portable md5 bucket (mod 8),
            -- streams sort by (group_id, doc_id, n_tokens), and the
            -- recursive CTE advances one row per group per level carrying
            -- (open-pack local index, tokens used, position) — the same
            -- recurrence the vectorized mapInPandas implements (a doc
            -- overflowing a NON-empty pack closes it; an oversized doc
            -- entering an EMPTY pack takes it alone)
            WITH RECURSIVE b AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT
                            AS INT) AS bucket_256,
                       regexp_replace(coalesce(text, ''),
                                      '^\\s+|\\s+$', '', 'g') AS ft
                FROM documents),
            sized AS (
                SELECT doc_id, bucket_256,
                       CASE WHEN bucket_256 < 230 THEN 'train'
                            WHEN bucket_256 < 243 THEN 'val'
                            ELSE 'test' END AS split,
                       (bucket_256 % 8)::INT AS group_id,
                       (CASE WHEN ft = '' THEN 0
                             ELSE len(regexp_split_to_array(ft, '\\s+'))
                        END)::BIGINT AS n_tokens
                FROM b),
            ordered AS (
                SELECT *, row_number() OVER (
                    PARTITION BY group_id ORDER BY doc_id, n_tokens) AS rn
                FROM sized),
            walk AS (
                SELECT doc_id, n_tokens, group_id, bucket_256, split, rn,
                       0::BIGINT AS local, n_tokens AS used, 0 AS pack_pos
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.doc_id, o.n_tokens, o.group_id, o.bucket_256,
                       o.split, o.rn,
                       CASE WHEN w.used > 0 AND w.used + o.n_tokens > 100
                            THEN w.local + 1 ELSE w.local END,
                       CASE WHEN w.used > 0 AND w.used + o.n_tokens > 100
                            THEN o.n_tokens ELSE w.used + o.n_tokens END,
                       CASE WHEN w.used > 0 AND w.used + o.n_tokens > 100
                            THEN 0 ELSE w.pack_pos + 1 END
                FROM walk w JOIN ordered o
                  ON o.group_id = w.group_id AND o.rn = w.rn + 1)
            SELECT doc_id, n_tokens, group_id,
                   group_id::BIGINT * 1099511627776 + local AS pack_id,
                   pack_pos::INT AS pack_pos, bucket_256, split
            FROM walk
        """,
        "doc_contamination": """
            -- shared normalization (lowercase, non-alnum runs -> one
            -- space) and 13-gram windows on both sides; the benchmark is
            -- the doc_id %% 50 == 3 corpus slice. Counts n-gram
            -- OCCURRENCES per doc (not distinct grams), matching
            -- contamination_flags' magnitude semantics. generate_series
            -- with stop < start is empty in DuckDB, so short docs yield
            -- no windows (Spark guards its descending-sequence trap the
            -- same way).
            WITH toks AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(coalesce(text, '')),
                                                        '[^a-z0-9]+', ' ', 'g')),
                                    ' ') AS t
                FROM documents),
            pos AS (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 12, 0))) AS i
                FROM toks),
            grams AS (
                SELECT doc_id, array_to_string(t[i:i + 12], ' ') AS g
                FROM pos),
            bench AS (
                SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 3)
            SELECT doc_id, count(*) AS n_hits
            FROM grams WHERE g IN (SELECT g FROM bench)
            GROUP BY doc_id
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
            -- filter the ROUNDED value like dedup.jaccard_pairs does: a
            -- raw ratio in [0.2999995, 0.3) rounds up and is KEPT by the
            -- operator, so the raw-value filter would diverge exactly at
            -- the rounding boundary
            WHERE round(n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common), 6) >= 0.3
        """,
        "doc_minhash": shingle_cte + mh_hm_cte + f"""
            SELECT doc_id, {mh_cols}
            FROM shx GROUP BY doc_id
        """,
        "doc_lsh_pairs": shingle_cte + mh_hm_cte + f"""
            , sig AS (
                SELECT doc_id, {mh_cols}
                FROM shx GROUP BY doc_id),""" + """
            bands AS (
                SELECT doc_id, 0 AS band_id, md5(mh_0 || ',' || mh_1) AS bh FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band_id, md5(mh_2 || ',' || mh_3) AS bh FROM sig),
            -- hot-bucket cap mirrors lsh_candidate_pairs(bucket_max=9):
            -- buckets with more than 9 members leave the candidate join
            keep AS (SELECT band_id, bh FROM (
                         SELECT band_id, bh, count(*) AS bn
                         FROM bands GROUP BY 1, 2)
                     WHERE bn <= 9),
            fb AS (SELECT b.doc_id, b.band_id, b.bh FROM bands b
                   JOIN keep k ON b.band_id = k.band_id AND b.bh = k.bh),
            cand AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM fb a JOIN fb b
                ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id)
            SELECT id1, id2,
                   round(((s1.mh_0 = s2.mh_0)::INT + (s1.mh_1 = s2.mh_1)::INT +
                          (s1.mh_2 = s2.mh_2)::INT + (s1.mh_3 = s2.mh_3)::INT) / 4.0, 6)
                          AS est_jaccard
            FROM cand JOIN sig s1 ON id1 = s1.doc_id JOIN sig s2 ON id2 = s2.doc_id
        """,
        "doc_token_counts": r"""
            -- full-whitespace trim mirrors the Spark side (sql trim()
            -- strips only spaces)
            SELECT doc_id,
                   CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0
                        THEN 0
                        ELSE length(regexp_split_to_array(
                             regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
                   END AS n_ws_tokens,
                   length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens,
                   length(text) AS n_chars,
                   -- the canonical exact-dup key (dedup._dedup_key): full
                   -- md5, null-text rows keyed by their own doc_id
                   coalesce(md5(text), 'null:' || doc_id) AS fp
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
        "media_decode_resize": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text))::INT AS n_bytes,
                   round(list_avg(list_transform(regexp_extract_all(text, '.'),
                                                 c -> ord(c))), 6) AS mean_byte,
                   (320 + doc_id % 1280)::INT AS width,
                   (240 + (doc_id * 3) % 960)::INT AS height,
                   round((320 + doc_id % 1280) * 1.0
                         / (240 + (doc_id * 3) % 960), 6) AS aspect_ratio,
                   round(least(640.0 / (320 + doc_id % 1280),
                               640.0 / (240 + (doc_id * 3) % 960)), 6) AS scale,
                   -- exact integer floor(d * target / long_side): the
                   -- float-scale form floor(d * scale) loses the binding
                   -- dimension by one pixel for many sizes
                   ((320 + doc_id % 1280) * 640 //
                    greatest(320 + doc_id % 1280,
                             240 + (doc_id * 3) % 960))::INT AS out_w,
                   ((240 + (doc_id * 3) % 960) * 640 //
                    greatest(320 + doc_id % 1280,
                             240 + (doc_id * 3) % 960))::INT AS out_h
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
        "doc_chunk_fps": f"""
            -- content-defined chunk boundaries replayed positionally;
            -- first chunk = text up to the first cut (whole text when no
            -- cut or text shorter than the window)
            WITH {_chunk_fps_sql()}
            SELECT d.doc_id,
                   (CASE WHEN length(d.text) < {_W} THEN 1
                         ELSE coalesce(c.n_cuts, 0) + 1 END)::INT AS n_chunks,
                   substr(md5(CASE WHEN c.first_cut IS NULL THEN d.text
                                   ELSE substr(d.text, 1, c.first_cut) END),
                          1, 12) AS first_fp
            FROM documents d LEFT JOIN cagg c USING (doc_id)
        """,
        "doc_simhash_pairs": f"""
            -- brute-force hamming <= 3 over SQL-replayed simhashes: the
            -- 4-chunk blocking is COMPLETE for radius 3 (pigeonhole), so
            -- the blocked Spark result equals this exhaustive definition
            WITH {_simhash_sql()}
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   bit_count(xor(a.sig, b.sig))::INT AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
        """,
        "media_frame_sample": """
            -- even-split byte bounds per frame, evenly sampled indices
            -- (j*nf)//take, 60-bit md5-prefix checksum per slice — the
            -- exact fake-codec arithmetic (payload = ASCII text bytes)
            WITH m AS (
                SELECT doc_id AS media_id, text,
                       CASE WHEN doc_id % 3 = 0 THEN (doc_id % 7 + 2)
                            ELSE 1 END AS nf,
                       length(text) AS n
                FROM documents),
            s AS (SELECT *, least(4, nf) AS take FROM m),
            f AS (
                SELECT media_id, text, nf, n,
                       ((r.range * nf) // take)::INT AS frame_idx
                FROM s, range(0, 4) r WHERE r.range < take)
            SELECT media_id, frame_idx,
                   CASE WHEN e > b THEN
                        ('0x' || substr(md5(substr(text, b + 1, e - b)), 1, 15))::BIGINT
                        ELSE 0 END AS frame_checksum,
                   (e - b)::INT AS n_bytes
            FROM (SELECT media_id, text, frame_idx,
                         (frame_idx * n) // nf AS b,
                         ((frame_idx + 1) * n) // nf AS e
                  FROM f)
        """,
        "ann_lsh_topk": f"""
            -- hyperplane signatures replayed with literal planes; probe =
            -- hamming <= 2 of the query's signature, exact cosine inside
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            sig AS (SELECT vec_id, embedding,
                           {_lsh_sig_sql("embedding::DOUBLE[]")} AS s
                    FROM embeddings),
            qs AS (SELECT {_lsh_sig_sql("qv")} AS s FROM q)
            SELECT vec_id,
                   {_cosine_guard_sql("embedding::DOUBLE[]", "(SELECT qv FROM q)")}
                       AS cosine
            FROM sig, qs
            WHERE bit_count(xor(sig.s::BIGINT, qs.s::BIGINT)) <= 2
            ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 10
        """,
        "ann_ivf_topk": f"""
            -- centroids = the 16 lowest-vec_id embeddings (the Spark
            -- coarse quantizer); cell = argmin squared L2 (tie: lowest
            -- cell), probe = 4 cells nearest the query, exact cosine
            WITH cents AS (SELECT vec_id AS cell_id,
                                  embedding::DOUBLE[] AS cv
                           FROM embeddings WHERE vec_id < 16),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0),
            probe AS (SELECT cell_id FROM cents, q
                      ORDER BY list_dot_product(qv, qv)
                               - 2.0 * list_dot_product(qv, cv)
                               + list_dot_product(cv, cv), cell_id
                      LIMIT 4),
            celled AS (SELECT vec_id, embedding FROM (
                SELECT e.vec_id, e.embedding, c.cell_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv)
                           + list_dot_product(c.cv, c.cv), c.cell_id) AS rn
                FROM embeddings e CROSS JOIN cents c)
                WHERE rn = 1 AND cell_id IN (SELECT cell_id FROM probe))
            SELECT vec_id,
                   {_cosine_guard_sql("embedding::DOUBLE[]", "(SELECT qv FROM q)")}
                       AS cosine
            FROM celled
            ORDER BY cosine DESC NULLS LAST, vec_id LIMIT 10
        """,
        "embedding_near_dups": f"""
            -- full-signature buckets (hamming 0) then exact cosine >= 0.3
            -- (the synthetic embeddings have no 0.9 pairs; 0.3 keeps the
            -- value check non-vacuous)
            WITH sig AS (SELECT vec_id, embedding,
                                {_lsh_sig_sql("embedding::DOUBLE[]")} AS s
                         FROM embeddings)
            SELECT id1, id2, cosine FROM (
                SELECT a.vec_id AS id1, b.vec_id AS id2,
                       {_cosine_guard_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")}
                           AS cosine
                FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id)
            WHERE cosine >= 0.3
        """,
        "embedding_label_stats": """
            SELECT label, count(*) AS n,
                   round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                                   embedding::DOUBLE[]))), 4) AS avg_norm
            FROM embeddings GROUP BY label ORDER BY label
        """,
    }
