"""Core grounding algebra vs the transcribed reference oracle.

The production code (segment splicing, sparkocr.textproc.grounding) and the
oracle (naive sequential str.replace, tests/oracle_ref.py) are different
algorithms; these tests pin that they agree byte-for-byte, and pin the
verified reference semantics from SURVEY.md §5.3 as hard-coded expectations.
"""

from __future__ import annotations

import oracle_ref as oracle
from sparkocr.textproc import grounding as g

EOS = g.EOS
REF = "<|ref|>{}<|/ref|><|det|>{}<|/det|>"


def both_clean(text, include_images=False, remove_labels=False):
    got, spans, trunc = g.clean_grounded(text, include_images, remove_labels)
    want = oracle.clean_output_text(text, include_images, remove_labels)
    assert got == want, (got, want)
    return got, spans, trunc


def test_happy_path_keeps_label_text():
    t = "Head " + REF.format("title", "[[1,2,3,4]]") + "Hello " + REF.format(
        "image", "[[10,20,30,40]]"
    ) + " tail" + EOS
    clean, spans, trunc = both_clean(t)
    assert clean == "Head titleHello  tail"
    assert not trunc
    assert [s["label"] for s in spans] == ["title", "image"]
    # 'title' kept in place at offset 5..10
    assert (spans[0]["start"], spans[0]["end"]) == (5, 10)
    assert clean[spans[0]["start"] : spans[0]["end"]] == "title"
    # image ref removed: zero-width span at its landing site
    assert spans[1]["start"] == spans[1]["end"] == 10 + len("Hello ")


def test_include_images_numbering_and_remove_labels():
    t = (
        REF.format("image", "[[0,0,10,10]]")
        + "A"
        + REF.format("image", "[[5,5,6,6]]")
        + "B"
        + REF.format("text", "[[1,1,2,2]]")
        + EOS
    )
    clean, spans, _ = both_clean(t, include_images=True, remove_labels=True)
    assert clean == "**[图片 1]**\n\nA\n\n**[图片 2]**\n\nB"


def test_duplicate_identical_matches_sequential_count1():
    # Two identical image refs: first replace hits occurrence 1, second the
    # remaining occurrence — numbering 1 then 2 (app/utils.py:111-116).
    r = REF.format("image", "[[1,2,3,4]]")
    t = f"x{r}y{r}z{EOS}"
    clean, spans, _ = both_clean(t, include_images=True)
    assert clean.count("**[图片 1]**") == 1
    assert clean.count("**[图片 2]**") == 1
    # span offsets land on the two placeholders in order
    p1 = clean.find("**[图片 1]**") - 2  # includes leading \n\n, clamped by strip
    assert spans[0]["start"] <= clean.find("**[图片 1]**")
    assert spans[1]["start"] > spans[0]["start"]


def test_label_with_newline_dotall():
    t = "a" + REF.format("multi\nline", "[[1,2,3,4]]") + "b" + EOS
    clean, spans, _ = both_clean(t)
    assert clean == "amulti\nlineb"
    assert spans[0]["label"] == "multi\nline"


def test_malformed_coords_null_bbox():
    t = "a" + REF.format("title", "[[10,20,") + "b" + EOS
    clean, spans, _ = both_clean(t)
    assert spans[0]["bbox"] is None
    assert clean == "atitleb"


def test_multibox_denorm_truncation():
    t = REF.format("table", "[[0,0,999,999],[100,200,300,400],[1,1,2,2]]") + EOS
    _, spans, _ = both_clean(t)
    w, h = 1275, 1650
    assert spans[0]["bbox"] == [
        [0, 0, 1275, 1650],
        [int(100 / 999 * w), int(200 / 999 * h), int(300 / 999 * w), int(400 / 999 * h)],
        [int(1 / 999 * w), int(1 / 999 * h), int(2 / 999 * w), int(2 / 999 * h)],
    ]


def test_missing_eos_truncated_flag():
    t = "no end here"
    clean, spans, trunc = both_clean(t)
    assert trunc and clean == "no end here"


def test_eos_single_pass_removal():
    # An EOS nested so that removing it forms a new EOS: str.replace does a
    # single pass and does NOT remove the newly-formed token.
    nested = EOS[:5] + EOS + EOS[5:]
    got, _, _ = g.clean_grounded("x" + nested + "y")
    want = oracle.clean_output_text("x" + nested + "y")
    assert got == want == "x" + EOS + "y"


def test_empty_and_whitespace():
    assert g.clean_grounded("")[0] == oracle.clean_output_text("") == ""
    assert g.clean_grounded("   \n\t ")[0] == oracle.clean_output_text("   \n\t ") == ""


def test_strip_shifts_span_offsets():
    t = "   " + REF.format("title", "[[1,2,3,4]]") + " body" + EOS
    clean, spans, _ = both_clean(t)
    assert clean == "title body"
    assert (spans[0]["start"], spans[0]["end"]) == (0, 5)


def test_clean_formula():
    t = r"pre \[x = y \quad (1.23)\] mid \[a+b\] post"
    got = g.clean_formula(t)
    want = oracle.clean_formula(t)
    assert got == want == r"pre \[x = y\] mid \[a+b\] post"


def test_markdown_grounded_formula_after_cleanup():
    t = REF.format("text", "[[1,1,2,2]]") + r" \[z \quad (4)\]" + EOS
    got = g.markdown_grounded(t)
    want = oracle.clean_formula(oracle.clean_output_text(t, True, True))
    assert got == want == r"\[z\]"


def test_pdf_cli_clean_matches_oracle():
    r_img = REF.format("image", "[[1,2,3,4]]")
    r_other = REF.format("title", "[[9,9,9,9]]")
    t = f"a{r_img}b{r_other}c\\coloneqq d\n\n\n\ne{EOS}"
    got, gd = g.pdf_cli_clean(t, jdx=3)
    want, wd = oracle.pdf_cli_page(t, jdx=3)
    assert (got, gd) == (want, wd)
    assert "![](images/3_0.jpg)\n" in got
    assert ":=" in got and "\n\n\n\n" not in got


def test_pdf_cli_no_other_matches_chain_never_runs():
    # Faithful quirk: the latex/newline replace chain sits inside the
    # other-match loop — with no other matches it never executes.
    t = f"x\\coloneqq y\n\n\n\nz{EOS}"
    got, _ = g.pdf_cli_clean(t)
    want, _ = oracle.pdf_cli_page(t, 0)
    assert got == want
    assert "\\coloneqq" in got and "\n\n\n\n" in got


def test_pdf_cli_skip_repeat_drop():
    assert g.pdf_cli_clean("no eos") == ("", True)
    got, dropped = g.pdf_cli_clean("no eos", skip_repeat=False)
    want, wd = oracle.pdf_cli_page("no eos", 0, skip_repeat=False)
    assert (got, dropped) == (want, wd) == ("no eos", False)


def test_eval_batch_clean_matches_oracle():
    r_other = REF.format("title", "[[9,9,9,9]]")
    t = f"<center>T</center>{r_other}lit\\n\\n\\n\\neral"
    got = g.eval_batch_clean(t)
    want = oracle.eval_batch_page(t)
    assert got == want
    assert "<center>" not in got and "\\n\\n\\n\\n" not in got


def test_parse_bbox_extremes():
    assert g.parse_bbox("[[0,0,999,999]]", 1275, 1650) == [[0, 0, 1275, 1650]]
    assert g.parse_bbox("not a literal") is None
    assert g.parse_bbox("[[1,2,3]]") == []  # malformed box skipped


# Marker-soup atoms for the standing parity fuzz: partial/nested/degenerate
# grounding markers, EOS mid-stream, latex/center/newline cleanup triggers.
# A 60k-case offline run over this pool (5 surfaces per case: all four
# include_images x remove_labels combos + clean_formula on the cleaned
# output) found zero divergences; the bounded hypothesis version keeps the
# space covered in CI.
_SOUP_ATOMS = [
    "<|ref|>", "<|/ref|>", "<|det|>", "<|/det|>", "[[", "]]", "[", "]",
    ",", " ", "1", "23", "999", "-5", "007", "1e9", "0x1f", "image",
    "title", "text", "sub_title", "para", "<|ref|>image<|/ref|>",
    "<|det|>[[1,2,3,4]]<|/det|>", "<|det|>[[12, 34, 56, 78], [1,2,3,4]]<|/det|>",
    "<｜end▁of▁sentence｜>", "\\(", "\\)", "\\[", "\\]", "$$", "$", "|",
    "\n", "\n\n", "word ", "中文 ", "<center>", "</center>", "\\n",
    "* ", "# h\n", "```", "!", "(", ")", "🙂", "\t", ".", "<|grounding|>",
]


def test_clean_grounded_matches_oracle_on_marker_soup():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(st.lists(st.sampled_from(_SOUP_ATOMS), min_size=0, max_size=40))
    def check(atoms):
        t = "".join(atoms)
        for inc in (False, True):
            for rem in (False, True):
                want = oracle.clean_output_text(t, inc, rem)
                got = g.clean_grounded(t, include_images=inc, remove_labels=rem)[0]
                assert got == want, (inc, rem, t)
        wantf = oracle.clean_formula(oracle.clean_output_text(t, True, True))
        gotf = g.clean_formula(
            g.clean_grounded(t, include_images=True, remove_labels=True)[0]
        )
        assert gotf == wantf, t

    check()
