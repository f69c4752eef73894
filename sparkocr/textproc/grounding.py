"""Grounding-marker extraction & cleanup — the golden-equality surface.

Pure-Python core (no Spark imports) invoked from Arrow batches by
``sparkocr.extract.dispatch``. Reproduces, byte-for-byte, the reference's
deterministic post-processing over raw model-output strings:

- marker grammar ``<|ref|>LABEL<|/ref|><|det|>COORDS<|/det|>`` consumed with
  ``re.findall(..., re.DOTALL)``            (reference: app/utils.py:54-57)
- app-style cleanup ``clean_output_text``   (reference: app/utils.py:98-127)
  with sequential ``str.replace(old, new, 1)`` in findall order
- EOS terminator strip (single left-to-right pass, like ``str.replace``)
  (reference: app/utils.py:125)
- formula cleanup ``clean_formula``         (reference: app/utils.py:85-95)
- CLI PDF cleanup (replace-all, latex fixes, newline collapse)
  (reference: run_dpsk_ocr_pdf.py:292-320)
- eval-batch cleanup (literal-\\n collapse, <center> removal)
  (reference: run_dpsk_ocr_eval_batch.py:156-169)
- bbox denormalization ``int(v/999*dim)``   (reference: run_dpsk_ocr_image.py:108-115)
- coords parsed with ``ast.literal_eval`` where the reference uses ``eval``
  (reference: run_dpsk_ocr_image.py:72-82) — deliberate safety divergence,
  identical on all literal inputs; non-literal input yields null bbox just
  like the reference's exception→None path.

On top of the reference semantics we compute **character-span offsets** into
the final cleaned text. Offsets are tracked *during* the sequential-replace
rebuild (segment splicing), never re-searched afterwards, so duplicate
substrings cannot make them drift.
"""

from __future__ import annotations

import ast
import re
from typing import Any

# Fullwidth-bar EOS token (U+FF5C bars, U+2581 lower block), app/utils.py:125.
EOS = "<\uff5cend\u2581of\u2581sentence\uff5c>"

# Marker grammar, DOTALL (labels may contain newlines). app/utils.py:56.
REF_RE = re.compile(r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL)

# An "image" ref is detected by substring containment, not label equality.
# run_dpsk_ocr_pdf.py:134 / app/utils.py:75.
IMAGE_MARK = "<|ref|>image<|/ref|>"

# Formula body matcher, app/utils.py:87.
FORMULA_RE = re.compile(r"\\\[(.*?)\\\]")
QUAD_ANNOT_RE = re.compile(r"\\quad\s*\([^)]*\)")

# Default page dimensions for bbox denormalization (FIXTURES.md §2.1 case 14).
DEFAULT_W = 1275
DEFAULT_H = 1650


# Strict fast-path grammar: a non-empty COMMA-SEPARATED list of 4-int boxes
# with an optional single trailing comma, ints with no leading zeros — i.e.
# only strings literal_eval would also accept, so the fast path can never
# accept what the reference's eval path rejects. Anything else falls back
# to literal_eval. Skips ast's parse+compile (~40% of grounding time).
_INT = r"(?:0|[1-9]\d*)"
_BOX = rf"\[\s*{_INT}\s*,\s*{_INT}\s*,\s*{_INT}\s*,\s*{_INT}\s*\]"
# re.ASCII: unicode \s/\d would admit NBSP whitespace and e.g. Arabic-Indic
# digits (which int() happily parses) that literal_eval — and the
# reference's eval — reject as SyntaxError; the fast path must never
# accept what the fallback rejects
_FAST_COORDS_RE = re.compile(
    rf"^\s*\[\s*{_BOX}(?:\s*,\s*{_BOX})*(?:\s*,)?\s*\]\s*$", re.ASCII
)
_BOX_RE = re.compile(
    r"\[\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\]", re.ASCII
)


def parse_bbox(coords_text: str, width: int = DEFAULT_W, height: int = DEFAULT_H):
    """COORDS literal → list of denormalized [x1,y1,x2,y2] pixel boxes, or None.

    Mirrors extract_coordinates_and_label (run_dpsk_ocr_image.py:72-82):
    parse failure → None. Each box denormalized ``int(v/999*dim)`` with
    Python truncation (run_dpsk_ocr_image.py:108-115); malformed individual
    boxes are skipped (the reference's per-ref try/except swallows them).
    """
    if coords_text and _FAST_COORDS_RE.match(coords_text):
        out = []
        for x1, y1, x2, y2 in _BOX_RE.findall(coords_text):
            # same per-box skip as the fallback path: an int of ~309+
            # digits raises OverflowError at the /999 float division —
            # the reference's per-ref try/except swallows that box, and
            # an uncaught raise here would kill the live Arrow batch
            try:
                out.append(
                    [
                        int(int(x1) / 999 * width),
                        int(int(y1) / 999 * height),
                        int(int(x2) / 999 * width),
                        int(int(y2) / 999 * height),
                    ]
                )
            except Exception:
                continue
        return out
    try:
        lst = ast.literal_eval(coords_text)
    except Exception:
        return None
    if not isinstance(lst, (list, tuple)):
        return None
    out = []
    for points in lst:
        try:
            x1, y1, x2, y2 = points
            out.append(
                [
                    int(x1 / 999 * width),
                    int(y1 / 999 * height),
                    int(x2 / 999 * width),
                    int(y2 / 999 * height),
                ]
            )
        except Exception:
            continue
    return out


# ---------------------------------------------------------------------------
# Segment-splicing string builder: replicates str.replace semantics while
# tracking where each replacement landed in the final string.
# ---------------------------------------------------------------------------


class _Segments:
    """A string as a list of ``[text, tag]`` pieces.

    ``replace`` replicates Python's ``str.replace(old, new[, count])``
    exactly: leftmost matches, single non-overlapping left-to-right pass over
    the *current* string, no rescan of replacement output. Each replacement
    inserts a piece tagged ``tag`` (first occurrence only) so its final
    offset can be recovered; pieces cut by later replacements lose their tag
    (their span is reported as null).
    """

    __slots__ = ("pieces",)

    def __init__(self, text: str):
        self.pieces: list[list[Any]] = [[text, None]] if text else []

    def text(self) -> str:
        return "".join(p[0] for p in self.pieces)

    def replace(self, old: str, new: str, count: int = -1, tag=None) -> int:
        """str.replace semantics; returns number of replacements performed."""
        if not old:
            return 0
        full = self.text()
        ranges: list[tuple[int, int]] = []
        pos = 0
        while count < 0 or len(ranges) < count:
            p = full.find(old, pos)
            if p < 0:
                break
            ranges.append((p, p + len(old)))
            pos = p + len(old)
        if not ranges:
            return 0
        self._apply(ranges, new, tag)
        return len(ranges)

    def _apply(self, ranges: list[tuple[int, int]], new: str, tag) -> None:
        # Step 1: cut every [a,b) range out, keeping absolute start offsets.
        cut: list[tuple[int, str, Any]] = []  # (abs_start, text, tag)
        pos = 0
        for piece, ptag in self.pieces:
            start, end = pos, pos + len(piece)
            pos = end
            if not piece:
                # zero-length marker: destroyed iff strictly inside a range
                if not any(a < start < b for a, b in ranges):
                    cut.append((start, piece, ptag))
                continue
            off = 0  # local offset of the not-yet-emitted remainder
            was_cut = False
            for a, b in ranges:
                if b <= start or a >= end:
                    continue
                was_cut = True
                la, lb = max(a, start) - start, min(b, end) - start
                if la > off:
                    cut.append((start + off, piece[off:la], None))
                off = max(off, lb)
            if not was_cut:
                cut.append((start, piece, ptag))
            elif off < len(piece):
                cut.append((start + off, piece[off:], None))
        # Step 2: insert `new` at every range start (tag on the first only).
        starts = [a for a, _ in ranges]
        first = starts[0]
        out: list[list[Any]] = []
        si = 0
        for abs_start, txt, ptag in cut:
            while si < len(starts) and starts[si] <= abs_start:
                out.append([new, tag if starts[si] == first else None])
                si += 1
            out.append([txt, ptag])
        while si < len(starts):
            out.append([new, tag if starts[si] == first else None])
            si += 1
        # Drop untagged empties to keep the list small.
        self.pieces = [p for p in out if p[0] or p[1] is not None]

    def finalize_strip(self):
        """.strip() the final text; return (text, {tag: (start, end)})."""
        full = self.text()
        stripped = full.strip()
        lead = len(full) - len(full.lstrip())
        n = len(stripped)
        offsets: dict[Any, tuple[int, int]] = {}
        pos = 0
        for piece, ptag in self.pieces:
            start, end = pos, pos + len(piece)
            pos = end
            if ptag is not None:
                s = min(max(start - lead, 0), n)
                e = min(max(end - lead, 0), n)
                offsets[ptag] = (s, e)
        return stripped, offsets


def clean_grounded(
    text: str,
    include_images: bool = False,
    remove_labels: bool = False,
    width: int = DEFAULT_W,
    height: int = DEFAULT_H,
):
    """Port of clean_output_text (app/utils.py:98-127) + span offsets.

    Returns ``(clean_text, spans, is_truncated)`` where ``spans`` is a list
    of dicts ``{start, end, label, bbox, is_image}`` — one per findall match in match
    order; ``start/end`` index into the returned text (``start == end`` for
    refs replaced by the empty string); both are None if a later replacement
    destroyed the landing site. ``is_truncated`` is True iff the EOS token is
    absent from the raw input (run_dpsk_ocr_pdf.py:295-299 repeat heuristic).
    """
    is_truncated = EOS not in (text or "")
    if not text:
        return "", [], is_truncated
    matches = REF_RE.findall(text)
    segs = _Segments(text)
    spans_meta: list[tuple[str, Any, bool]] = []
    img_num = 0
    for full, label, coords in matches:
        tag = len(spans_meta)
        is_image = IMAGE_MARK in full
        spans_meta.append((label, parse_bbox(coords, width, height), is_image))
        if is_image:
            if include_images:
                # app/utils.py:114 — numbered CJK placeholder, count=1
                segs.replace(full, f"\n\n**[\u56fe\u7247 {img_num + 1}]**\n\n", 1, tag)
                img_num += 1
            else:
                segs.replace(full, "", 1, tag)
        else:
            if remove_labels:
                segs.replace(full, "", 1, tag)
            else:
                segs.replace(full, label, 1, tag)
    segs.replace(EOS, "")  # single-pass replace-all, app/utils.py:125
    clean, offsets = segs.finalize_strip()
    spans = []
    for i, (label, bbox, is_image) in enumerate(spans_meta):
        se = offsets.get(i)
        spans.append(
            {
                "start": se[0] if se else None,
                "end": se[1] if se else None,
                "label": label,
                "bbox": bbox,
                # detected by IMAGE_MARK containment in the FULL match (not
                # label equality) — the reference's rule, run_dpsk_ocr_pdf.py
                # :134 / app/utils.py:75 — so placeholder numbering and crop
                # records count the same spans even when a non-image label's
                # det payload embeds the mark.
                "is_image": is_image,
            }
        )
    return clean, spans, is_truncated


def clean_formula(text: str) -> str:
    """Port of clean_formula (app/utils.py:85-95 / run_dpsk_ocr_eval_batch.py:58-73)."""

    def process_formula(match: re.Match) -> str:
        formula = match.group(1)
        formula = QUAD_ANNOT_RE.sub("", formula)
        formula = formula.strip()
        return r"\[" + formula + r"\]"

    return FORMULA_RE.sub(process_formula, text)


def markdown_grounded(text: str) -> str:
    """Golden markdown_text: clean_output_text(text, True, True) then
    clean_formula (FIXTURES.md §3; ordering per run_dpsk_ocr_eval_batch.py
    applied to the app-style cleanup)."""
    clean, _, _ = clean_grounded(text, include_images=True, remove_labels=True)
    return clean_formula(clean)


def extract_grounded_pair(text: str):
    """(clean_text, markdown_text, spans, is_truncated) in one call.

    When the payload has no grounding markers, the app-style cleanup is
    flag-independent (only EOS strip + outer strip), so the second full
    pass is skipped and markdown = clean_formula(clean). With markers the
    two passes differ (labels kept vs dropped, image numbering) and both
    run, exactly as before.
    """
    if text and REF_RE.search(text) is None:
        clean, spans, trunc = clean_grounded(text)
        return clean, clean_formula(clean), spans, trunc
    clean, spans, trunc = clean_grounded(text)
    return clean, markdown_grounded(text), spans, trunc


def split_image_other(text: str):
    """re_match of the CLI scripts (run_dpsk_ocr_pdf.py:129-141): full-match
    strings split into image vs other by IMAGE_MARK containment."""
    matches = REF_RE.findall(text)
    images = [m[0] for m in matches if IMAGE_MARK in m[0]]
    others = [m[0] for m in matches if IMAGE_MARK not in m[0]]
    return matches, images, others


def pdf_cli_clean(content: str, jdx: int = 0, skip_repeat: bool = True):
    """CLI PDF per-page markdown path (run_dpsk_ocr_pdf.py:292-320).

    Returns ``(cleaned, dropped)``. EOS present → stripped (replace-all);
    absent → page dropped when ``skip_repeat`` (SKIP_REPEAT, config.py:16).
    Image refs → ``![](images/{jdx}_{idx}.jpg)\\n`` via replace-ALL; other
    refs → removed with the latex/newline replace chain run once per
    other-match iteration, faithfully including the no-other-matches case
    where the chain never runs.
    """
    if EOS in content:
        content = content.replace(EOS, "")
    elif skip_repeat:
        return "", True
    _, images, others = split_image_other(content)
    for idx, m in enumerate(images):
        content = content.replace(m, "![](images/" + str(jdx) + "_" + str(idx) + ".jpg)\n")
    for m in others:
        content = (
            content.replace(m, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
        )
    return content, False


PAGE_SPLIT = "\n\n<--- Page Split --->\n"


def eval_batch_clean(content: str) -> str:
    """Eval-batch per-image markdown path (run_dpsk_ocr_eval_batch.py:156-169).

    clean_formula first, then per-other-match: remove + collapse LITERAL
    ``\\n`` escape runs (backslash-n characters, not newlines) + drop
    <center> tags. The collapse chain runs once per other-match iteration.
    """
    content = clean_formula(content)
    # eval-batch's own re_match puts EVERY full match — image refs included
    # — into its "other" list (run_dpsk_ocr_eval_batch.py:75-84), unlike the
    # PDF script's image/other split; iterate all matches accordingly.
    matches = REF_RE.findall(content)
    for m, _label, _coords in matches:
        content = (
            content.replace(m, "")
            .replace("\\n\\n\\n\\n", "\\n\\n")
            .replace("\\n\\n\\n", "\\n\\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content
