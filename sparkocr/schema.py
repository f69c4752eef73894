"""Fixed StructType schemas — the reference's implicit tuples made explicit
(SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import types as T

# Input table (BASELINE.json input_hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("bbox", T.ArrayType(T.ArrayType(T.IntegerType())), True),
        # IMAGE_MARK containment rule (grounding mode only; null elsewhere)
        T.StructField("is_image", T.BooleanType(), True),
    ]
)

# Per-turn extraction output (the golden-equality surface + QC columns).
TURNS_OUT = T.StructType(
    [
        # conv_id/turn_idx nullable: the TRANSCRIPTS declaration says
        # non-null, but file sources force-nullable every field, so one
        # producer row with a null key WILL reach the extractor — it must
        # pass through (rows out == rows in) rather than poison-pill the
        # task; a declared non-null output makes the JVM projection NPE
        # on exactly that row (UnsafeWriter.write on a null UTF8String
        # for conv_id; "Value at index is null" for turn_idx)
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("clean_text", T.StringType(), True),
        T.StructField("markdown_text", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN), True),
        T.StructField("is_truncated", T.BooleanType(), True),
        T.StructField("has_repeat", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("n_chars_in", T.IntegerType(), True),
        T.StructField("n_chars_out", T.IntegerType(), True),
    ]
)

# Per-conversation assembled document.
DOCS_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("doc_text", T.StringType(), True),
    ]
)
