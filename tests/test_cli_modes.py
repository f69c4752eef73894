"""Round-2 additions: CLI/eval dispatch modes end-to-end, det-variant
assembly, and the first-occurrence-only base64 embed."""

import pandas as pd
import pytest

from sparkocr.textproc import grounding

EOS = grounding.EOS


def _tr(spark, rows):
    """rows: (conv_id, turn_idx, text, tool)"""
    return spark.createDataFrame(
        [(c, t, "assistant", x, tool, None) for c, t, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_grounding_cli_mode_matches_pure_function(spark):
    from sparkocr.extract.dispatch import extract_turns

    img = "<|ref|>image<|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    other = "<|ref|>note<|/ref|><|det|>[[5,6,7,8]]<|/det|>"
    payload = img + "body " + other + "\n\n\n\na \\coloneqq b" + EOS
    rows = [
        ("c", 3, payload, "grounding_cli"),
        ("c", 4, img + "no eos page", "grounding_cli"),  # SKIP_REPEAT drop
    ]
    out = {
        r.turn_idx: r
        for r in extract_turns(_tr(spark, rows)).collect()
    }
    want, dropped = grounding.pdf_cli_clean(payload, jdx=3)
    assert not dropped
    assert out[3].clean_text == want
    # jdx flows from turn_idx into the image link name
    assert "![](images/3_0.jpg)" in out[3].clean_text
    assert "\\coloneqq" not in out[3].clean_text and "a := b" in out[3].clean_text
    assert "\n\n\n" not in out[3].clean_text
    assert out[4].clean_text == "" and out[4].is_truncated


def test_grounding_eval_mode_matches_pure_function(spark):
    from sparkocr.extract.dispatch import extract_turns

    ref = "<|ref|>eq<|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    payload = ref + "<center>body</center>" + "\\n\\n\\n\\n" + "\\[ x \\quad (u) \\]"
    out = extract_turns(_tr(spark, [("c", 0, payload, "grounding_eval")])).collect()
    want = grounding.eval_batch_clean(payload)
    assert out[0].clean_text == want == "body" + "\\n\\n" + "\\[x\\]"


def test_assemble_docs_det_keeps_markers_strips_eos(spark):
    from sparkocr.assemble import assemble_docs_det
    from sparkocr.textproc.grounding import PAGE_SPLIT

    ref = "<|ref|>t<|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    rows = [
        ("c", 0, ref + "page zero" + EOS, "grounding"),
        ("c", 1, "lost page (no eos)", "grounding"),
        ("c", 2, "page two" + EOS, "grounding"),
    ]
    out = assemble_docs_det(_tr(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_turns == 2  # EOS-less page skipped, like the clean CLI file
    # markers survive (det variant is the UNCLEANED text), EOS does not
    assert r.doc_text == (
        ref + "page zero" + PAGE_SPLIT + "page two" + PAGE_SPLIT
    )


def test_b64_embed_replaces_first_occurrence_only(spark):
    from pyspark.sql import functions as F

    from sparkocr.extract.dispatch import extract_turns
    from sparkocr.regions import embed_crops_in_markdown_b64

    # body LEGITIMATELY contains the literal placeholder string — only the
    # generated placeholder (first occurrence) may be replaced
    body = "text with literal **[图片 1]** inside"
    img = "<|ref|>image<|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    # two conversations whose turn indices collide: payload routing must
    # key on the FULL page identity (conv_id, turn_idx)
    turns = extract_turns(
        _tr(
            spark,
            [
                ("c", 7, img + body + EOS, "grounding"),
                ("c2", 7, img + "other conv body" + EOS, "grounding"),
            ],
        )
    )
    media = spark.createDataFrame(
        [("c", 7, b"PIXELDATA"), ("c2", 7, b"OTHERDATA")],
        "conv_id string, turn_idx int, payload binary",
    )
    out = {
        r.conv_id: r.markdown_embedded
        for r in embed_crops_in_markdown_b64(turns, media).collect()
    }
    import base64

    md = out["c"]
    b64 = base64.b64encode(b"PIXELDATA").decode()
    assert md.count(f"data:image/png;base64,{b64}") == 1
    # the body's literal copy survives untouched
    assert "literal **[图片 1]** inside" in md
    assert f"\n\n![图片 1](data:image/png;base64,{b64})\n\n" in md
    # same turn_idx, different conversation → that conversation's payload
    b64_2 = base64.b64encode(b"OTHERDATA").decode()
    assert b64_2 in out["c2"] and b64 not in out["c2"]


def test_extract_markdown_false_skips_variant_pass(spark):
    from sparkocr.extract.dispatch import extract_turns

    ref = "<|ref|>title<|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    rows = [("c", i, ref + f"body {i}" + EOS, "grounding") for i in range(4)]
    full = extract_turns(_tr(spark, rows)).orderBy("turn_idx").collect()
    lite = extract_turns(_tr(spark, rows), markdown=False).orderBy("turn_idx").collect()
    for f_, l in zip(full, lite):
        assert l.clean_text == f_.clean_text
        assert l.is_truncated == f_.is_truncated
        assert [s.asDict() for s in l.spans] == [s.asDict() for s in f_.spans]
        assert f_.markdown_text is not None and l.markdown_text is None
