"""HTML main-content extraction — readability/trafilatura-style block scoring.

Stdlib-only: flatten the DOM into block records
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
randomness. Entities are decoded in text data; unclosed tags are tolerated.

Tokenization is a compiled-regex scanner rather than ``html.parser``:
HTMLParser's char-at-a-time ``goahead`` loop was measured at ~50% of the
whole extraction hot path. The scanner reproduces HTMLParser's
(convert_charrefs=True) event stream on the constructs the collector
consumes — tags with quoted attributes (including ``>`` inside quotes),
comments, declarations/PIs, script/style CDATA content mode (undecoded,
terminated only by the matching close tag), ``<br/>`` self-closing, bare
``<`` as text — verified by a differential test against HTMLParser
(tests/test_htmlfast.py).
"""

from __future__ import annotations

import re
from html import unescape

# Content inside these is discarded entirely.
DROP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head", "iframe"})

# Start tags that may legitimately appear INSIDE <head>: any other start
# tag implies </head> (HTML5 tag omission) — a page omitting both </head>
# and <body> (common in scraped/hand-written HTML) must not lose its whole
# body. Text alone does not trigger the release (tags-only approximation
# of the spec, which also ends head at non-whitespace text).
HEAD_CONTENT_TAGS = frozenset(
    {"head", "title", "meta", "link", "base", "basefont", "bgsound",
     "style", "script", "noscript", "noframes", "template", "html"}
)
# Classic boilerplate containers: their blocks are down-weighted.
BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})
# Tags that open a new text block. <br> is NOT one: it is a line break —
# splitting at it would score each short line as its own (droppable)
# block, so both <br> and <br/> join with a space instead.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "body", "li", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "pre", "blockquote", "table",
        "ul", "ol", "tr", "figure", "figcaption", "hr",
    }
)

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


# Tag-ish constructs at a '<'. Quoted attribute values may contain '>'.
# Name charset mirrors HTMLParser's tagfind_tolerant (anything but
# whitespace and '/>' after a leading letter).
_TAG_RE = re.compile(
    r"""<(?:
        (?P<comment>!--)
      | (?P<marked>!\[)                                     # <![CDATA[ .. ]]>, <![if ..]>
      | (?P<decl>![^>]*>)                                   # <!doctype..>, bogus <!..>
      | (?P<pi>\?[^>]*>)                                    # <?..>
      | /\s*(?P<end>[a-zA-Z][^\t\n\r\f\ />]*)[^>]*>         # </name junk>
      | /(?P<endbogus>[^>]*)>                               # </>, </1..> → bogus, swallowed
      | (?P<start>[a-zA-Z][^\t\n\r\f\ />]*)                 # <name
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)>             # attrs ('>' ok in quotes)
    )""",
    re.VERBOSE | re.DOTALL,
)

# A trailing '/' in the attr text is self-closing ONLY when it is not the
# tail of an unquoted attribute VALUE: HTMLParser parses <a href=http://x/>
# as value 'http://x/' (start tag), but <br/>, <br />, <a foo/>, <a x="y"/>
# as self-closing. The '/' belongs to a value iff an '=' introduces an
# unquoted run reaching the end of the attr text.
_UNQUOTED_VALUE_TAIL = re.compile(r"=\s*[^\s\"'>]*$")

# _markupbase marked-section handling: name token, then cdata/include/
# ignore/rcdata/temp close with ']]>', the MS-conditional keywords with
# ']>'; an unknown/missing keyword raises in HTMLParser (the collector's
# try/except then keeps only already-flushed blocks) — mirrored by _ABORT.
_MARKED_NAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*")
_MARKED_KEYWORDS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_KEYWORDS = frozenset({"if", "else", "endif"})
_MARKED_CLOSE = re.compile(r"\]\s*\]\s*>")
_MS_MARKED_CLOSE = re.compile(r"\]\s*>")

# HTMLParser's CDATA_CONTENT_ELEMENTS: content is raw (no entity decode, no
# tag events) until a close tag whose NAME equals the element — the
# lookahead rejects '</scriptx' (HTMLParser parses the full end-tag name
# and stays in CDATA mode on mismatch, emitting it as data).
_RAWTEXT = ("script", "style")
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}(?![-.a-zA-Z0-9:_])", re.IGNORECASE)
    for t in _RAWTEXT
}

# HTMLParser's comment close is '--\s*>' (whitespace allowed), not the
# literal '-->'
_COMMENT_CLOSE = re.compile(r"--\s*>")

# events: 0=start 1=end 2=startend 3=data 4=abort (HTMLParser raised: the
# collector's try/except keeps only already-flushed blocks, no final flush)
_START, _END, _STARTEND, _DATA, _ABORT = 0, 1, 2, 3, 4


def _iter_events(html: str):
    """Yield (event, payload) reproducing HTMLParser(convert_charrefs=True)
    on the collector's event surface. One compiled-regex match per
    construct instead of a char-at-a-time state machine."""
    pos, n = 0, len(html)
    find, match = html.find, _TAG_RE.match
    # Anti-quadratic memo: every construct except '<!--'/'<![' needs a '>'
    # to match, and '>'-lessness is a suffix property — once a failed
    # match discovers there is no '>' from some index on, every later '<'
    # can skip the regex (whose attrs run scans to end-of-string before
    # failing: '<a ' * N was O(N²), a one-row CPU DoS in the extraction
    # task) and the comment/marked close searches (which also need '>').
    # Output is byte-identical; only the scan cost changes.
    no_gt = None  # index from which html provably contains no '>'
    gt_hint = -1  # memoized find('>') result to keep the probe itself linear
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = html[pos:]
            yield (_DATA, unescape(chunk) if "&" in chunk else chunk)
            return
        if lt > pos:
            chunk = html[pos:lt]
            yield (_DATA, unescape(chunk) if "&" in chunk else chunk)
        if no_gt is not None and lt >= no_gt:
            # no '>' anywhere ahead: replicate each branch's outcome
            # without scanning to end-of-string
            if html.startswith("!--", lt + 1):
                # comment opener, close unreachable → goahead fallback
                pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            if html.startswith("![", lt + 1):
                nm = _MARKED_NAME.match(html, lt + 3)
                kw = nm.group(0).lower() if nm else ""
                if kw not in _MARKED_KEYWORDS and kw not in _MS_KEYWORDS:
                    yield (_ABORT, None)
                    return
                pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            # every other construct needs '>': literal '<' data
            yield (_DATA, "<")
            pos = lt + 1
            continue
        m = match(html, lt)
        if m is None:
            # '<' not opening any construct: literal text (HTMLParser
            # emits it as data and moves one char)
            if no_gt is None:
                if gt_hint < lt:
                    gt_hint = find(">", lt)
                if gt_hint < lt:  # find returned -1: no '>' from lt on
                    no_gt = lt
            yield (_DATA, "<")
            pos = lt + 1
            continue
        # dispatch on the LAST participating group (one lookup instead of
        # probing every named group): a start tag always ends with the
        # (possibly empty) attrs group
        g = m.lastgroup
        if g == "attrs":
            name = m.group("start").lower()
            attrs = m.group("attrs")
            pos = m.end()
            if attrs.endswith("/") and not _UNQUOTED_VALUE_TAIL.search(attrs):
                yield (_STARTEND, name)
                continue
            yield (_START, name)
            if name in _RAWTEXT:
                # content mode: raw data until the matching close tag
                mm = _RAWTEXT_CLOSE[name].search(html, pos)
                stop = mm.start() if mm else n
                if stop > pos:
                    yield (_DATA, html[pos:stop])  # raw: no entity decode
                pos = stop  # the close tag itself parses on the next loop
            continue
        if g == "end":
            yield (_END, m.group("end").lower())
            pos = m.end()
            continue
        if g == "comment":
            mm = _COMMENT_CLOSE.search(html, m.end())
            if mm is None:
                # incomplete construct at EOF: goahead(1)'s fallback emits
                # the RAW slice up to the next '>' (or '<', or one char)
                # and resumes parsing after it. Probe the no-'>' memo here
                # too: '<!-- ' spam with no '>' would otherwise rescan the
                # suffix per opener (close search + fallback probe)
                if no_gt is None:
                    if gt_hint < lt:
                        gt_hint = find(">", lt)
                    if gt_hint < lt:
                        no_gt = lt
                pos = yield from _incomplete(html, lt, know_no_gt=no_gt is not None)
                continue
            pos = mm.end()
            continue
        if g == "marked":
            # <![keyword ... : _markupbase semantics — ']]>' close for
            # cdata-family, ']>' for MS conditionals, raise on anything
            # else (mirrored as abort)
            nm = _MARKED_NAME.match(html, m.end())
            kw = nm.group(0).lower() if nm else ""
            if kw in _MARKED_KEYWORDS:
                closer = _MARKED_CLOSE
            elif kw in _MS_KEYWORDS:
                closer = _MS_MARKED_CLOSE
            else:
                yield (_ABORT, None)
                return
            mm = closer.search(html, m.end())
            if mm is None:
                if no_gt is None:
                    if gt_hint < lt:
                        gt_hint = find(">", lt)
                    if gt_hint < lt:
                        no_gt = lt
                pos = yield from _incomplete(html, lt, know_no_gt=no_gt is not None)
                continue
            pos = mm.end()
            continue
        # decl / pi / endbogus: swallowed whole
        pos = m.end()


def _incomplete(html: str, lt: int, know_no_gt: bool = False):
    """HTMLParser goahead(end=1) fallback for a construct that never
    terminates: emit the slice through the next '>', else through the next
    '<', else one char — parsing then resumes.  goahead applies
    ``unescape`` to this slice when convert_charrefs is on (CPython
    ``if self.convert_charrefs and not self.cdata_elem:
    self.handle_data(unescape(rawdata[i:k]))``), so charrefs inside an
    unterminated comment/decl/marked section ARE decoded.
    ``know_no_gt`` skips the '>' probe when the caller already proved the
    suffix has none (the anti-quadratic memo in ``_iter_events``)."""
    gt = -1 if know_no_gt else html.find(">", lt + 1)
    if gt >= 0:
        k = gt + 1
    else:
        k = html.find("<", lt + 1)
        if k < 0:
            k = lt + 1
    chunk = html[lt:k]
    yield (_DATA, unescape(chunk) if "&" in chunk else chunk)
    return k


def flatten_blocks(html: str) -> list[dict]:
    """Flatten a document into block records in document order."""
    blocks: list[dict] = []
    drop_depth = 0
    boiler_depth = 0
    link_depth = 0
    article_depth = 0
    cur_parts: list[str] = []
    cur_link_chars = 0
    cur_tag = "body"

    def flush():
        nonlocal cur_parts, cur_link_chars
        raw = "".join(cur_parts)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            blocks.append(
                {
                    "tag": cur_tag,
                    "text": text,
                    "link_chars": min(cur_link_chars, len(text)),
                    "boiler": boiler_depth > 0,
                    "in_article": article_depth > 0,
                }
            )
        cur_parts = []
        cur_link_chars = 0

    head_drop = 0  # open <head> drops, implicitly closable at <body>

    def on_start(tag):
        nonlocal drop_depth, boiler_depth, article_depth, link_depth
        nonlocal cur_tag, head_drop
        if head_drop and tag not in HEAD_CONTENT_TAGS:
            # HTML5 tag omission: any non-head-content start tag (<body>,
            # <p>, <div>, ...) implies </head> — without this a document
            # omitting </head> drops its entire body, and one omitting
            # <body> too would extract as empty
            drop_depth = max(0, drop_depth - head_drop)
            head_drop = 0
        if tag in DROP_TAGS:
            drop_depth += 1
            if tag == "head":
                head_drop += 1
            return
        if drop_depth:
            return
        if tag == "br":
            cur_parts.append(" ")  # line break, not a block boundary
            return
        if tag in BLOCK_TAGS:
            flush()
            cur_tag = tag
        if tag in BOILER_TAGS:
            # boiler containers are block boundaries too: pending OUTER
            # text must flush before the depth rises, or bare text inside
            # nav/footer (no inner block tag) would be attributed to
            # whatever flush comes after the container closes and escape
            # the boilerplate filter
            flush()
            boiler_depth += 1
        if tag in ("article", "main"):
            article_depth += 1
        if tag == "a":
            link_depth += 1

    def on_end(tag):
        nonlocal drop_depth, boiler_depth, article_depth, link_depth
        nonlocal cur_tag, head_drop
        if tag in DROP_TAGS:
            drop_depth = max(0, drop_depth - 1)
            if tag == "head" and head_drop:
                head_drop -= 1
            return
        if drop_depth:
            return
        if tag in BLOCK_TAGS:
            flush()
            # text AFTER a closing block tag belongs to the enclosing
            # context, not the closed tag — without this reset, junk
            # after </h1> would inherit the heading's keep-exemption
            cur_tag = "body"
        if tag in BOILER_TAGS:
            flush()  # text inside the container flushes while boiler > 0
            boiler_depth = max(0, boiler_depth - 1)
        if tag in ("article", "main"):
            article_depth = max(0, article_depth - 1)
        if tag == "a":
            link_depth = max(0, link_depth - 1)

    for event, payload in _iter_events(html):
        if event == _DATA:
            if drop_depth or not payload:
                continue
            cur_parts.append(payload)
            if link_depth:
                cur_link_chars += len(_WS_RE.sub(" ", payload).strip())
        elif event == _ABORT:
            # HTMLParser raised mid-parse: collected blocks survive, the
            # pending partial block does not (close() never ran)
            return blocks
        elif event == _START:
            on_start(payload)
        elif event == _END:
            on_end(payload)
        else:  # _STARTEND: HTMLParser's default is starttag-then-endtag;
            # <br/> stays a plain space like <br>
            if payload == "br":
                if not drop_depth:
                    cur_parts.append(" ")
            else:
                on_start(payload)
                on_end(payload)
    flush()
    return blocks


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
