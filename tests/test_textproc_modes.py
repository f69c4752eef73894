"""Unit tests: HTML boilerplate strip, PDF-span reading order, markdown
table recovery, windowed n-gram repeat detector."""

from sparkocr.textproc import htmlmain, mdtable, pdfspans, repeats


# ---------------------------------------------------------------- html ----

ARTICLE = (
    "<html><head><title>T</title><style>p{}</style></head><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
    "<article><h1>Big Headline</h1>"
    "<p>This paragraph has plenty of characters of running prose to keep.</p>"
    "<p>Another long paragraph with real sentence content &amp; entities 中.</p>"
    "</article>"
    "<div>" + " ".join(f"<a href='/l{k}'>link {k}</a>" for k in range(8)) + "</div>"
    "<footer>© footer junk</footer></body></html>"
)


def test_html_keeps_article_drops_boilerplate():
    text, spans = htmlmain.extract_html_main(ARTICLE)
    assert "plenty of characters" in text
    assert "Big Headline" in text
    assert "Home" not in text  # nav dropped
    assert "link 3" not in text  # link farm dropped by link density
    assert "footer junk" not in text
    assert "p{}" not in text  # style dropped
    assert "& entities 中" in text  # entities decoded
    # spans slice back to the block text
    for s in spans:
        assert text[s["start"] : s["end"]] in text
        assert s["label"].startswith("block:")


def test_html_unclosed_tags_tolerated():
    text, spans = htmlmain.extract_html_main(
        "<div><p>One long enough paragraph of sustained prose content here"
        "<p>Second long enough paragraph of sustained prose content here</div>"
    )
    assert "One long enough" in text and "Second long enough" in text


def test_html_empty():
    assert htmlmain.extract_html_main("") == ("", [])


# ------------------------------------------------------------ pdfspans ----

def test_pdfspans_reading_order_and_offsets():
    import json

    payload = json.dumps(
        {
            "page": 0,
            "spans": [
                {"t": "right1", "bbox": [500, 42, 900, 70]},   # row 4, col 2
                {"t": "second", "bbox": [30, 160, 400, 190]},  # row 16
                {"t": "left1", "bbox": [30, 40, 400, 70]},     # row 4, col 1
            ],
        }
    )
    text, spans, err = pdfspans.extract_pdf_spans(payload)
    assert err is None
    assert text == "left1 right1\nsecond"
    assert [text[s["start"] : s["end"]] for s in spans] == ["left1", "right1", "second"]
    # bbox denorm int(v/999*dim), w=1275 h=1650
    assert spans[0]["bbox"] == [[int(30 / 999 * 1275), int(40 / 999 * 1650),
                                 int(400 / 999 * 1275), int(70 / 999 * 1650)]]


def test_pdfspans_same_row_quantum_groups():
    import json

    payload = json.dumps(
        {"page": 1, "spans": [
            {"t": "b", "bbox": [600, 104, 700, 120]},
            {"t": "a", "bbox": [100, 98, 200, 120]},  # round(98/10)=10 == round(104/10)
        ]}
    )
    text, spans, _ = pdfspans.extract_pdf_spans(payload)
    assert text == "a b"


def test_pdfspans_malformed():
    text, spans, err = pdfspans.extract_pdf_spans("{not json")
    assert text == "" and spans == [] and err is not None
    text, spans, err = pdfspans.extract_pdf_spans('{"page":0,"spans":[{"t":"x"}]}')
    assert err is not None  # missing bbox


# ------------------------------------------------------------ markdown ----

def test_markdown_normalize_and_cells():
    src = "# T\n\n\n\n| a | b |\n|---|---|\n| 1 | two |\n\ntail   \n"
    norm, spans = mdtable.extract_markdown(src)
    assert "\n\n\n" not in norm
    assert norm.endswith("tail")
    cells = [norm[s["start"] : s["end"]] for s in spans]
    assert cells == ["a", "b", "1", "two"]


def test_markdown_td_cells_and_fence_skipped():
    src = "```\n| no | cells |\n```\n<table><tr><td>x</td><td>y</td></tr></table>"
    norm, spans = mdtable.extract_markdown(src)
    cells = [norm[s["start"] : s["end"]] for s in spans]
    assert cells == ["x", "y"]


# -------------------------------------------------------------- repeats ----

def test_repeat_detector_flags_runaway():
    text = ("token " * 30) * 3  # the same 30-gram repeats back-to-back
    assert repeats.find_repeat(text, 20, 50) is not None
    assert repeats.has_repeat(text, "pdf")


def test_repeat_detector_whitelists_td():
    text = "<table><tr>" + "<td>cell</td>" * 40 + "</tr></table>"
    assert repeats.find_repeat(text, 3, 50) is None  # td-laden ngrams skipped


def test_repeat_detector_clean_text():
    text = " ".join(f"word{i}" for i in range(200))
    assert repeats.find_repeat(text, 20, 50) is None


def test_repeat_formulations_agree():
    """find_repeat dispatches between an interpreter loop (short texts)
    and a numpy prefix-trick sweep (long texts) — the two formulations
    must agree exactly, including whitelist handling, overlap repeats,
    and the window boundary, on a seeded adversarial sweep that also
    straddles the dispatch threshold."""
    import random

    from sparkocr.textproc.repeats import (
        _NUMPY_MIN_TOKENS,
        _find_repeat_loop,
        _find_repeat_numpy,
        tokenize,
    )

    rng = random.Random(97)
    vocab = [f"w{i}" for i in range(40)] + ["<td>", "</td>", ".", ","]
    for trial in range(4000):
        n = rng.choice([3, 5, 8])
        w = rng.choice([n + rng.randrange(0, 6), 2 * n + rng.randrange(0, 10)])
        L = rng.randrange(0, 80)
        toks = [rng.choice(vocab[: rng.choice([4, 8, 44])]) for _ in range(L)]
        if L > n and rng.random() < 0.5:
            i = rng.randrange(0, L - n)
            j = min(L - n, i + rng.randrange(1, w + 3))
            toks[j : j + n] = toks[i : i + n]
        text = " ".join(toks).replace(" <td>", "<td>").replace("</td> ", "</td>")
        tk = tokenize(text)
        if len(tk) < n + 1:
            continue
        limit = w - n + 1
        assert _find_repeat_loop(tk, text, n, limit) == _find_repeat_numpy(
            tk, text, n, limit
        ), (n, w, text)
    # both sides of the dispatch boundary flag the same planted repeat
    for L in (_NUMPY_MIN_TOKENS - 30, _NUMPY_MIN_TOKENS + 30):
        words = [f"u{i}" for i in range(L)]
        words[40:60] = words[10:30]  # 20-gram repeat at distance 30
        text = " ".join(words)
        assert repeats.find_repeat(text, 20, 50) == 40


def test_textstats_null_text_rows(spark):
    """NULL text must behave like empty text in lang_id ('und', scores 0 —
    not a surprise NULL bucket) and must keep a usable fingerprint (the
    dedup key: null-text docs are each their OWN group, never collapsed
    into one bogus md5(NULL) duplicate cluster)."""
    from sparkocr.pipeline.textstats import lang_id, md5_fingerprints, token_counts

    docs = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, None), (3, None), (4, "")],
        "doc_id long, text string",
    )
    langs = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert langs[2] == "und" and langs[3] == "und" and langs[4] == "und"
    assert langs[1] == "en"

    for df in (md5_fingerprints(docs), token_counts(docs, fingerprint=True)):
        fps = {r.doc_id: r.fp for r in df.select("doc_id", "fp").collect()}
        assert fps[2] is not None and fps[3] is not None
        assert fps[2] != fps[3]  # null docs never share a dup key
        assert len(fps[1]) == 32  # full md5, not a birthday-prone prefix
