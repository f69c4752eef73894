"""Markdown / table structure recovery.

Normalizes markdown the way the reference's PDF markdown path does —
newline-run collapse (run_dpsk_ocr_pdf.py:319-320) generalized to
``\\n{3,} → \\n\\n`` — strips trailing per-line whitespace, outer-strips, and
extracts table cells from both pipe tables and ``<td>``-style HTML fragments
(the reference whitelists <td>/</td> in its no-repeat processor,
run_dpsk_ocr_pdf.py:52, i.e. repeated cells are legitimate structure).
Cell spans carry offsets into the normalized text.
"""

from __future__ import annotations

import re

_NL_RUN = re.compile(r"\n{3,}")
_TRAIL_WS = re.compile(r"[ \t]+(?=\n)")
_TD_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.DOTALL | re.IGNORECASE)
_FENCE_RE = re.compile(r"(`{3,}|~{3,})(.*)$")
# GFM delimiter rows need only ONE dash per column ('|-|-|' is valid)
_SEP_ROW = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$")


def normalize_markdown(text: str) -> str:
    if not text:
        return ""
    text = _TRAIL_WS.sub("", text)
    text = _NL_RUN.sub("\n\n", text)
    return text.strip()


def _pipe_row_cells(line: str):
    """Cells of one pipe-table row with their offsets within the line."""
    if "|" not in line:
        return []
    stripped = line.strip()
    if not (stripped.startswith("|") or stripped.count("|") >= 2):
        return []
    if _SEP_ROW.match(line):
        return []
    cells = []
    bounds = []
    j = line.find("|")
    while j >= 0:  # C-speed scan instead of a per-char python loop
        bounds.append(j)
        j = line.find("|", j + 1)
    edges = [-1] + bounds + [len(line)]
    for a, b in zip(edges, edges[1:]):
        seg = line[a + 1 : b]
        t = seg.strip()
        if t == "" and (a == -1 or b == len(line)):
            continue  # outside the leading/trailing pipes
        off = a + 1 + (len(seg) - len(seg.lstrip()))
        cells.append((t, off, off + len(t)))
    return cells


def extract_markdown(text: str):
    """payload → (normalized_text, spans) where spans are table cells
    (label 'cell') with offsets into the normalized text."""
    norm = normalize_markdown(text)
    spans: list[dict] = []
    # pipe-table cells, line by line (offsets are line-local + line start);
    # fenced code regions are recorded so BOTH cell extractors skip them
    pos = 0
    in_fence = False
    fence_char = ""
    fence_len = 0
    fenced: list[tuple[int, int]] = []  # [start, end) char ranges in norm
    fence_start = 0
    for line in norm.split("\n"):
        ls = line.lstrip()
        # CommonMark fence rules: an opener is a run of >= 3 backticks or
        # tildes; a BACKTICK opener's info string may not contain ANY
        # backtick (```a` is a paragraph — a single stray backtick used to
        # be accepted and its fake fence swallowed every later table
        # cell), a tilde opener's info string is unrestricted; the closer
        # must use the SAME char, be at least as long, and carry no info.
        m = _FENCE_RE.match(ls)
        on_delim = False
        if m is not None:
            run, info = m.group(1), m.group(2)
            if not in_fence:
                if run[0] == "~" or "`" not in info:
                    in_fence, fence_char, fence_len = True, run[0], len(run)
                    fence_start = pos
                    on_delim = True
            elif run[0] == fence_char and len(run) >= fence_len and not info.strip():
                in_fence = False
                fenced.append((fence_start, pos + len(line) + 1))
                on_delim = True
        if not in_fence and not on_delim:
            for t, a, b in _pipe_row_cells(line):
                if t:
                    spans.append({"start": pos + a, "end": pos + b, "label": "cell", "bbox": None})
        pos += len(line) + 1
    if in_fence:  # unterminated fence runs to end of text
        fenced.append((fence_start, pos))
    # <td> cells — same fence suppression as pipe cells (a <table> inside a
    # code sample is code, not structure)
    for m in _TD_RE.finditer(norm):
        if any(a <= m.start(1) < b for a, b in fenced):
            continue
        if m.end(1) == m.start(1):
            continue  # empty <td></td>: match the pipe extractor's filter
        spans.append(
            {"start": m.start(1), "end": m.end(1), "label": "cell", "bbox": None}
        )
    spans.sort(key=lambda s: (s["start"], s["end"]))
    return norm, spans
