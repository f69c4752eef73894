"""Geometry re-plot *parse* path — E12 (SURVEY.md §2.5).

The reference (run_dpsk_ocr_image.py:270-319) detects ``line_type`` in the
raw model output, ``eval``s the dict, and re-plots lines / endpoints /
circles with matplotlib to ``geo.jpg``. The matplotlib render is out of
scope (X); the deterministic parse — string dict → typed records — ports
as a batch function producing one struct per payload:

    {lines: [{x1,y1,x2,y2,style}], endpoints: [{label,x,y}],
     circles: [{label,x,y,radius}]}

Coordinate tuples appear as ``"(x,y) -- (x,y)"`` segment strings and
``"LABEL: (x,y)"`` endpoint/center strings, exactly the shapes the
reference's plotting loop consumes. ``ast.literal_eval`` replaces the
reference's ``eval`` (same deliberate safety divergence as grounding E2);
non-literal or malformed payloads yield None, mirroring the reference's
try/except skip.
"""

from __future__ import annotations

import ast
import re

_POINT_RE = re.compile(r"\(\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*\)")


def _parse_point(s: str):
    m = _POINT_RE.search(s or "")
    if not m:
        return None
    return float(m.group(1)), float(m.group(2))


def _parse_segment(s: str):
    pts = _POINT_RE.findall(s or "")
    if len(pts) < 2:
        return None
    (x1, y1), (x2, y2) = pts[0], pts[1]
    return float(x1), float(y1), float(x2), float(y2)


def _parse_labeled(s: str):
    """``"LABEL: (x,y)"`` → (label, point). The label is everything before
    the first colon; the point is searched in the remainder, so trailing
    text after the ')' (a period, units) keeps the label associated — an
    end-anchored regex would silently drop the label while keeping the
    point."""
    s = s or ""
    if ":" in s:
        label, _, rest = s.partition(":")
        pt = _parse_point(rest)
        if pt is not None:
            return label.strip(), pt
    return None, _parse_point(s)


def has_geometry(text: str) -> bool:
    """The reference's trigger: substring check (run_dpsk_ocr_image.py:270)."""
    return "line_type" in (text or "")


def parse_geometry(text: str):
    """Raw payload → geometry struct dict, or None.

    Mirrors the reference's consumption of the evaluated dict:
    ``Line.line[i]`` zipped with ``Line.line_type[i]`` (style) and
    ``Line.line_endpoint`` labels; ``Circle.circle_center`` zipped with
    ``Circle.radius`` (run_dpsk_ocr_image.py:274-316).
    """
    if not has_geometry(text):
        return None
    # the dict literal may be embedded in surrounding text: take the
    # outermost braces span, as the reference effectively does by eval'ing
    # the whole cleaned output only when it IS the dict.
    start, end = text.find("{"), text.rfind("}")
    if start < 0 or end <= start:
        return None
    try:
        d = ast.literal_eval(text[start : end + 1])
    except Exception:
        return None
    if not isinstance(d, dict):
        return None
    try:
        return _consume_geometry(d)
    except Exception:
        # literal but malformed shapes ({"Line": [1,2]}, a non-list
        # radius, an int where a list is expected) raise during
        # consumption — the documented contract is None for ANY
        # malformed payload, mirroring the reference's try/except skip
        return None


def _consume_geometry(d: dict):
    lines = []
    line_d = d.get("Line") or {}
    segs = line_d.get("line") or []
    styles = line_d.get("line_type") or []
    for i, seg in enumerate(segs):
        parsed = _parse_segment(seg if isinstance(seg, str) else "")
        if parsed is None:
            continue
        x1, y1, x2, y2 = parsed
        style = styles[i] if i < len(styles) and isinstance(styles[i], str) else None
        lines.append({"x1": x1, "y1": y1, "x2": x2, "y2": y2, "style": style})

    endpoints = []
    for ep in line_d.get("line_endpoint") or []:
        label, pt = _parse_labeled(ep if isinstance(ep, str) else "")
        if pt is None:
            continue
        endpoints.append({"label": label, "x": pt[0], "y": pt[1]})

    circles = []
    circ_d = d.get("Circle") or {}
    centers = circ_d.get("circle_center") or []
    radii = circ_d.get("radius") or []
    for i, c in enumerate(centers):
        label, pt = _parse_labeled(c if isinstance(c, str) else "")
        if pt is None:
            continue
        r = radii[i] if i < len(radii) else None
        try:
            r = float(r) if r is not None else None
        except (TypeError, ValueError):
            r = None
        circles.append({"label": label, "x": pt[0], "y": pt[1], "radius": r})

    return {"lines": lines, "endpoints": endpoints, "circles": circles}
