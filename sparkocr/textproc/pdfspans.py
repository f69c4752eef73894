"""PDF layout reconstruction: span/bbox records → reading-order text.

Payload: JSON ``{"page": p, "spans": [{"t": str, "bbox": [x1,y1,x2,y2]}...]}``
with bboxes in the reference's 0-999 normalized space, spans in arbitrary
order. We reproduce the reference's 2-D reading-order assembly semantics —
row-major, top-to-bottom then left-to-right with explicit newline separators
(deepseek_ocr.py:423-438, the ``image_newline``-per-grid-row layout) — as a
deterministic sort:

    row = round(y1 / ROW_QUANTUM);  sort by (page, row, x1, original_index)

Spans on one visual row are joined with a single space; rows are joined with
'\\n'. Bboxes are denormalized ``int(v/999*dim)`` exactly like E3
(run_dpsk_ocr_image.py:108-115). Character spans index the assembled text.
"""

from __future__ import annotations

import json
import math

ROW_QUANTUM = 10  # 0-999 normalized units per visual row bucket
DEFAULT_W = 1275
DEFAULT_H = 1650


# row bucketing uses int(round(...)) inline: Python 3 banker's rounding —
# pinned by tests


def extract_pdf_spans(payload: str, width: int = DEFAULT_W, height: int = DEFAULT_H):
    """payload JSON → (text, spans, error).

    spans: one per input span, ordered by reading order, with char offsets
    into the assembled text and denormalized pixel bbox. Malformed JSON or
    shape → ("", [], error_message).
    """
    if not payload:
        return "", [], "empty payload"
    try:
        obj = json.loads(payload)
        page = int(obj.get("page", 0))
        raw = obj["spans"]
        recs = []
        num = (int, float)
        for i, s in enumerate(raw):
            t = s.get("t", "")
            if not isinstance(t, str):
                # validate NOW like the bbox below: a None/number text would
                # not fail until len(t) during assembly, outside this except
                raise TypeError("non-string span text")
            x1, y1, x2, y2 = s["bbox"]
            # coordinates must be numbers NOW: a str here would not fail
            # until the sort/denorm below, which run outside this except
            # and would kill the task instead of yielding an error record
            if not (
                isinstance(x1, num) and isinstance(y1, num)
                and isinstance(x2, num) and isinstance(y2, num)
            ):
                raise TypeError("non-numeric bbox")
            # json.loads parses NaN/Infinity by default, and a finite
            # 1.7e308 overflows to inf in the later /999*width denorm —
            # both must land in THIS try so the payload degrades to an
            # error record instead of killing the Arrow batch at the
            # unguarded denorm/sort below
            if not all(
                math.isfinite(v) and abs(v) < 1e15 for v in (x1, y1, x2, y2)
            ):
                raise ValueError("non-finite or absurd bbox")
            recs.append(
                (page, int(round(y1 / ROW_QUANTUM)), x1, i, t, (x1, y1, x2, y2))
            )
    except Exception as e:
        return "", [], f"pdfspans parse error: {type(e).__name__}"
    # no key= needed: tuples compare lexicographically and element 3 (the
    # original index) is unique, so (t, bbox) are never reached
    recs.sort()
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    prev_row = None
    for page, row, _x, _i, t, bbox in recs:
        key = (page, row)
        if prev_row is not None:
            sep = "\n" if key != prev_row else " "
            parts.append(sep)
            pos += len(sep)
        prev_row = key
        start = pos
        parts.append(t)
        pos += len(t)
        x1, y1, x2, y2 = bbox
        spans.append(
            {
                "start": start,
                "end": pos,
                "label": "span",
                "bbox": [
                    [
                        int(x1 / 999 * width),
                        int(y1 / 999 * height),
                        int(x2 / 999 * width),
                        int(y2 / 999 * height),
                    ]
                ],
            }
        )
    return "".join(parts), spans, None
