"""End-to-end Spark extraction vs the transcribed reference oracle.

Golden-equality gate (north_rule): per-turn clean_text / markdown_text /
span offsets byte-equal under stable (conv_id, turn_idx) ordering, and the
physical plan stays vectorized (one MapInPandas, no per-row Python)."""

from __future__ import annotations

import pandas as pd
import pytest

import oracle_ref as oracle
from sparkocr.datagen import generate_rows
from sparkocr.extract.dispatch import extract_turns
from sparkocr.textproc import grounding, htmlmain, mdtable, pdfspans


def expected_for(text: str, tool: str):
    """Golden triple (clean_text, markdown_text, is_truncated) — grounding
    from the line-faithful reference transcription; other modes from the
    module functions (their semantics are ours, pinned by unit tests)."""
    if tool == "grounding":
        return (
            oracle.clean_output_text(text, False, False),
            oracle.clean_formula(oracle.clean_output_text(text, True, True)),
            oracle.EOS not in text,
        )
    if tool == "html":
        t, _ = htmlmain.extract_html_main(text)
        return t, t, False
    if tool == "pdfspans":
        t, _, _ = pdfspans.extract_pdf_spans(text)
        return t, t, False
    if tool == "markdown":
        t, _ = mdtable.extract_markdown(text)
        return t, t, False
    return text.strip(), text.strip(), False


@pytest.fixture(scope="module")
def extracted(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts)
    out = extract_turns(df).orderBy("conv_id", "turn_idx")
    return out.toPandas()


def test_row_counts_and_ordering(extracted, tiny_transcripts):
    import pyarrow.parquet as pq

    n_in = pq.read_table(tiny_transcripts).num_rows
    assert len(extracted) == n_in
    keys = list(zip(extracted["conv_id"], extracted["turn_idx"]))
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)  # no turn lost or duplicated


def test_golden_equality_per_turn(extracted):
    rows = generate_rows("tiny")
    golden = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    assert len(golden) == len(extracted)
    for rec in extracted.itertuples():
        src = golden[(rec.conv_id, rec.turn_idx)]
        want_clean, want_md, want_trunc = expected_for(src["text"], src["tool"])
        assert rec.clean_text == want_clean, (rec.conv_id, rec.turn_idx, src["tool"])
        assert rec.markdown_text == want_md, (rec.conv_id, rec.turn_idx)
        assert bool(rec.is_truncated) == (want_trunc if src["tool"] == "grounding" else False)


def test_span_offsets_slice_correctly(extracted):
    checked = 0
    for rec in extracted.itertuples():
        if rec.spans is None:
            continue
        for s in rec.spans:
            if s["start"] is None or s["label"] is None:
                continue
            sliced = rec.clean_text[s["start"] : s["end"]]
            if rec.tool in ("html", "pdfspans", "markdown"):
                # non-grounding spans always slice to real content
                assert len(sliced) == s["end"] - s["start"]
                checked += 1
            elif s["end"] - s["start"] == len(s["label"]):
                assert sliced == s["label"]
                checked += 1
    assert checked > 20


def test_grounding_spans_match_core(extracted):
    rows = {(r["conv_id"], r["turn_idx"]): r for r in generate_rows("tiny")}
    for rec in extracted.itertuples():
        src = rows[(rec.conv_id, rec.turn_idx)]
        if src["tool"] != "grounding":
            continue
        _, want_spans, _ = grounding.clean_grounded(src["text"])
        raw = [] if rec.spans is None else list(rec.spans)
        got = [
            {
                "start": None if pd.isna(s["start"]) else int(s["start"]),
                "end": None if pd.isna(s["end"]) else int(s["end"]),
                "label": s["label"],
                "bbox": None if s["bbox"] is None else [[int(v) for v in b] for b in s["bbox"]],
                "is_image": bool(s["is_image"]),
            }
            for s in raw
        ]
        assert got == want_spans


def test_extraction_is_batch_and_partition_invariant(spark, tiny_transcripts):
    """Per-turn outputs must be a pure function of the row — identical no
    matter how rows are split across partitions or Arrow batches. This is
    the property that makes results reproducible across cluster sizes
    (local[8] vs a 1000-executor run slice the table completely
    differently); any cross-row state sneaking into extract_batch would
    break it silently."""
    df = spark.read.parquet(tiny_transcripts)

    def plain(v):
        # toPandas renders array<struct> as numpy arrays of dicts with
        # numpy scalars inside — normalize to plain python for ==
        if v is None:
            return None
        if isinstance(v, dict):
            return {k: plain(x) for k, x in v.items()}
        if hasattr(v, "tolist"):
            return plain(v.tolist())
        if isinstance(v, (list, tuple)):
            return [plain(x) for x in v]
        return v

    def snapshot(src):
        out = extract_turns(src).orderBy("conv_id", "turn_idx").toPandas()
        spans = out.pop("spans")
        return out.reset_index(drop=True), [plain(s) for s in spans]

    base, base_spans = snapshot(df.coalesce(1))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
        shredded, shredded_spans = snapshot(df.repartition(7))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pd.testing.assert_frame_equal(base, shredded)
    assert base_spans == shredded_spans


def test_physical_plan_is_vectorized(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts)
    plan = extract_turns(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no per-row Python UDF


def test_assembly_matches_reference_concat(spark, tiny_transcripts):
    from sparkocr.assemble import assemble_docs_cli

    df = spark.read.parquet(tiny_transcripts)
    turns = extract_turns(df)
    docs = {
        r["conv_id"]: r["doc_text"]
        for r in assemble_docs_cli(turns, skip_truncated=True).collect()
    }
    docs1 = {
        r["conv_id"]: r["doc_text"]
        for r in assemble_docs_cli(turns, skip_truncated=True, two_phase=False).collect()
    }
    assert docs == docs1  # two-phase == single-phase
    # oracle: per conv, ordered surviving clean pages + page-split suffix
    rows = generate_rows("tiny")
    byconv: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        clean, md, trunc = expected_for(r["text"], r["tool"])
        trunc = trunc if r["tool"] == "grounding" else False
        if trunc:
            continue
        byconv.setdefault(r["conv_id"], []).append(clean)
    want = {c: oracle.assemble_pdf_doc(pages) for c, pages in byconv.items()}
    assert docs == want


def test_assembly_app_style_numbering(spark, tiny_transcripts):
    from sparkocr.assemble import assemble_docs_app

    df = spark.read.parquet(tiny_transcripts)
    turns = extract_turns(df)
    row = (
        assemble_docs_app(turns.filter("conv_id = 'conv_000000'"))
        .collect()[0]
    )
    assert row["doc_text"].startswith("\n\n--- 📄 第 1 页 ---\n\n")
    assert f"--- 📄 第 {row['n_turns']} 页 ---" in row["doc_text"]


def test_extract_batch_survives_adversarial_garbage():
    """Robustness sweep (no Spark, pure Arrow-batch surface): at 10^12-turn
    scale ONE payload that crashes an extractor kills its task and the
    retry loops — every tool path must absorb arbitrary garbage (astral
    unicode, NULs/controls, marker/html/json/md-table soup, None, 10k-char
    runs, unknown/None tools), keep row count, keep span offsets inside
    clean_text, and degrade through the error column. A 6000-row offline
    sweep was clean; CI keeps 1500 rows."""
    import random

    import pandas as pd

    from sparkocr.extract.dispatch import extract_batch

    tools = ["grounding", "grounding_cli", "grounding_eval", "html", "pdfspans",
             "markdown", "plain", "", "unknown", None]
    rng = random.Random(424242)

    def garbage():
        mode = rng.randrange(8)
        if mode == 0:
            return "".join(chr(rng.randrange(1, 0x110000)) for _ in range(rng.randrange(200)))
        if mode == 1:
            return "".join(rng.choice("\x00\x01\x1b퟿�￿ ab<>&|[]{}") for _ in range(rng.randrange(300)))
        if mode == 2:
            atoms = ["<|ref|>", "<|/ref|>", "<|det|>", "<|/det|>", "[[", "]]", ",",
                     "1", "999", "-5", "1e9", "image", "title", "<｜end▁of▁sentence｜>",
                     "\\(", "\\)", "$$", "|", "\n"]
            return "".join(rng.choice(atoms) for _ in range(rng.randrange(80)))
        if mode == 3:
            atoms = ["<div", ">", "<script>", "</", "<!--", "&#x", ";", "'", '"',
                     "<p>", "</p>", "<head>", "<title>", "x" * 50, "\r\n"]
            return "".join(rng.choice(atoms) for _ in range(rng.randrange(120)))
        if mode == 4:
            atoms = ['{"page":', '"spans"', "[", "]", "{", "}", ":", ",", '"t"',
                     '"bbox"', "null", "NaN", "1e400", '"\\ud800"', "-1", "0"]
            return "".join(rng.choice(atoms) for _ in range(rng.randrange(60)))
        if mode == 5:
            atoms = ["|", "---", ":-:", "\n", "# ", "```", "~~~", "a|b", "\\|", " "]
            return "".join(rng.choice(atoms) for _ in range(rng.randrange(120)))
        if mode == 6:
            return None
        return rng.choice(["", " ", "\x00", "𝕏" * 10000])

    # sprinkle null turn_idx: file sources force-nullable the schema, so
    # a null page index must degrade (grounding_cli error column; Int32
    # passthrough elsewhere), never raise out of the batch; same for
    # null conv_id (TURNS_OUT declares it nullable for exactly this —
    # a non-null declaration NPEs the JVM output projection on the row)
    rows = [(None if i % 89 == 0 else f"c{i % 7}",
             None if i % 97 == 0 else i, "assistant",
             garbage(), rng.choice(tools))
            for i in range(1500)]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    out = extract_batch(df)
    assert len(out) == len(df)
    for r in out.itertuples():
        ct = r.clean_text
        assert ct is None or isinstance(ct, str)
        for s in r.spans or []:
            st_, en = s.get("start"), s.get("end")
            if st_ is not None and en is not None and ct is not None:
                assert 0 <= st_ <= en <= len(ct), (r.turn_idx, st_, en, len(ct))
    assert len(extract_batch(df.copy(), markdown=False)) == len(df)


def test_dedup_markdown_round_trips(spark, tiny_transcripts):
    """The Arrow-transfer optimization (extract_batch emits markdown_text
    null when byte-identical to clean_text; extract_turns restores it
    JVM-side with coalesce) must be bijective: the deduped batch combined
    with clean_text reproduces the default batch EXACTLY, and the Spark
    output never surfaces a null markdown beside a non-null clean under
    markdown=True. A legitimate-null regression (an extractor returning
    md=None with clean set) would silently corrupt markdown into clean."""
    from sparkocr.extract.dispatch import extract_batch

    df = spark.read.parquet(tiny_transcripts)
    pdf = df.select("conv_id", "turn_idx", "role", "text", "tool").toPandas()
    full = extract_batch(pdf)
    deduped = extract_batch(pdf, dedup_markdown=True)
    restored = deduped["markdown_text"].combine_first(deduped["clean_text"])
    pd.testing.assert_series_equal(
        restored, full["markdown_text"], check_names=False
    )
    # end-to-end: the Spark output's markdown must EQUAL the un-deduped
    # batch surface row-for-row (not just satisfy a coalesce shape — a
    # corrupted restore that flattened grounding markdown into clean
    # would still produce non-null values)
    expected = {
        (r.conv_id, r.turn_idx): m
        for r, m in zip(pdf.itertuples(), full["markdown_text"])
    }
    rows = extract_turns(df).select(
        "conv_id", "turn_idx", "tool", "markdown_text"
    ).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert r.markdown_text == expected[(r.conv_id, r.turn_idx)], (
            r.conv_id, r.turn_idx, r.tool
        )
    # markdown=False keeps its null-markdown contract for grounding rows
    # (the skipped second pass) — no coalesce fill may resurrect them —
    # while every other mode still round-trips through the dedup
    lean = extract_turns(df, markdown=False).select(
        "tool", "markdown_text", "clean_text"
    ).collect()
    assert any(r.tool == "grounding" for r in lean)
    for r in lean:
        if r.tool == "grounding":
            assert r.markdown_text is None
        else:
            # every non-grounding mode returns markdown identical to clean
            assert r.markdown_text == r.clean_text


def test_extract_batch_tolerates_pandas_na_turn_idx():
    """Nullable Int32 batches (extract_batch's own output dtype) carry
    pd.NA, whose `!=` returns NA and raises on bool() — the null guard
    must use pd.isna, or it crashes on exactly the row it exists to
    degrade."""
    import pandas as pd

    from sparkocr.extract.dispatch import extract_batch

    df = pd.DataFrame(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": pd.array([pd.NA, 1], dtype="Int32"),
            "role": ["user", "user"],
            "text": ["<|ref|>x<|/ref|>", "plain"],
            "tool": ["grounding_cli", "plain"],
        }
    )
    out = extract_batch(df)
    assert len(out) == 2
    cli = out[out["tool"] == "grounding_cli"].iloc[0]
    assert cli["error"] and "null turn_idx" in cli["error"]


def test_extract_turns_survives_null_conv_id(spark, tmp_path):
    """A null conv_id must pass through the FULL Spark path — the pandas
    batch always handled it, but a non-nullable conv_id in TURNS_OUT made
    the JVM output projection NPE (UnsafeWriter on a null UTF8String),
    which the pandas-surface sweep can never catch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkocr import datagen

    rows = {
        "conv_id": [None, None, "a"],
        "turn_idx": [0, 0, 1],
        "role": ["user"] * 3,
        "text": ["f", "g", "h"],
        "tool": ["plain"] * 3,
        "ts": [None] * 3,
    }
    p = str(tmp_path / "nullconv.parquet")
    pq.write_table(pa.Table.from_pydict(rows, schema=datagen.SCHEMA), p)
    out = extract_turns(spark.read.parquet(p)).collect()
    assert sorted((r.conv_id or "", r.clean_text) for r in out) == [
        ("", "f"), ("", "g"), ("a", "h"),
    ]
