"""HTML main-content extraction — readability/trafilatura-style block scoring.

Stdlib-only (``html.parser``): flatten the DOM into block records
``(tag, text, link_chars, boiler, in_article)``, score each block by
text-density and link-density, keep high-density low-link blocks outside
boilerplate containers, and emit the main text plus character spans of the
kept blocks.

This is the Spark analog of the reference's S1 "payload normalization" slot
(SURVEY.md §2.1): where the reference EXIF-corrects an image before OCR, we
strip boilerplate from an HTML payload before assembly. No reference code
corresponds line-for-line; the algorithm follows the published
readability/trafilatura text-density + link-density heuristic.

Deterministic by construction: fixed tag sets, fixed thresholds, no
randomness. Entities are decoded by the parser (convert_charrefs=True);
unclosed tags are tolerated by HTMLParser's best-effort model.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Content inside these is discarded entirely.
DROP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head", "iframe"})
# Classic boilerplate containers: their blocks are down-weighted.
BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})
# Tags that open a new text block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "body", "li", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "pre", "blockquote", "table",
        "ul", "ol", "tr", "figure", "figcaption", "br", "hr",
    }
)

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


class _BlockCollector(HTMLParser):
    """Flatten a document into block records in document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._article_depth = 0
        self._cur_parts: list[str] = []
        self._cur_link_chars = 0
        self._cur_tag = "body"

    def _flush(self):
        raw = "".join(self._cur_parts)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            self.blocks.append(
                {
                    "tag": self._cur_tag,
                    "text": text,
                    "link_chars": min(self._cur_link_chars, len(text)),
                    "boiler": self._boiler_depth > 0,
                    "in_article": self._article_depth > 0,
                }
            )
        self._cur_parts = []
        self._cur_link_chars = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag
        if tag in BOILER_TAGS:
            self._boiler_depth += 1
        if tag in ("article", "main"):
            self._article_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            # text AFTER a closing block tag belongs to the enclosing
            # context, not the closed tag — without this reset, junk after
            # </h1> would inherit the heading's keep-exemption
            self._cur_tag = "body"
        if tag in BOILER_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag in ("article", "main"):
            self._article_depth = max(0, self._article_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_startendtag(self, tag, attrs):
        if tag.lower() == "br":
            self._cur_parts.append(" ")

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._cur_parts.append(data)
        if self._link_depth:
            self._cur_link_chars += len(_WS_RE.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()


def flatten_blocks(html: str) -> list[dict]:
    p = _BlockCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # best-effort on malformed markup; keep what was collected
    return p.blocks


def score_blocks(blocks: list[dict]) -> list[bool]:
    """Keep-decision per block from text-density / link-density heuristics.

    keep iff: not boilerplate AND link_density < MAX_LINK_DENSITY AND
    (chars >= MIN_BLOCK_CHARS OR heading OR (inside <article>/<main> AND
    chars >= 10)).
    """
    keep = []
    for b in blocks:
        chars = len(b["text"])
        link_density = b["link_chars"] / chars if chars else 1.0
        ok = (
            not b["boiler"]
            and link_density < MAX_LINK_DENSITY
            and (
                chars >= MIN_BLOCK_CHARS
                or b["tag"] in HEADING_TAGS
                or (b["in_article"] and chars >= 10)
            )
        )
        keep.append(ok)
    return keep


def extract_html_main(html: str):
    """HTML payload → (main_text, spans). Blocks joined with '\\n\\n';
    each span = {start, end, label: 'block:<tag>', bbox: None}."""
    if not html:
        return "", []
    blocks = flatten_blocks(html)
    keep = score_blocks(blocks)
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if parts:
            pos += 2  # "\n\n"
        start = pos
        parts.append(b["text"])
        pos += len(b["text"])
        spans.append(
            {"start": start, "end": pos, "label": f"block:{b['tag']}", "bbox": None}
        )
    return "\n\n".join(parts), spans
