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


# Start/end tags are parsed with VENDORED copies of CPython html.parser's
# tolerant regexes (post-CVE-2025-6069 3.11 versions) plus a code mirror
# of parse_starttag / check_for_whole_start_tag / parse_endtag under
# goahead(end=1): a hand-rolled single-regex approximation diverged on
# malformed pages (a bare quote in attribute-NAME position opened a bogus
# quoted span that could swallow whole document chunks; '</ p junk>'
# emitted an end event where HTMLParser parses a bogus comment; '\x00'
# was accepted in tag names).
#
# Vendored, NOT imported from the installed stdlib: the mirror's control
# flow (full-close rawtext pattern, the _locate_end piecewise scan that
# must stay byte-consistent with _LOCATE_START, _NEXT_INCOMPLETE
# handling) pins ONE patch level of html.parser, and extraction output
# must be identical on every executor — a cluster mixing Python builds
# with pre-/post-backport parser patterns would otherwise produce
# per-node output drift from an import that "succeeds" everywhere.
# tests/test_htmlfast.py asserts the vendored patterns behave identically
# to the installed stdlib's, so drift in a future interpreter surfaces as
# a loud test failure instead of silent output change.
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_LOCATE_START = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")

# check_for_whole_start_tag: these next-chars after the locate match mean
# "end of input in or before attribute value" → incomplete (-1), which
# under goahead(end=1) is the raw-slice fallback — possibly through a
# LATER '>' (e.g. one sitting inside an unterminated quoted value).
_NEXT_INCOMPLETE = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=")

# Piecewise mirror of _LOCATE_START for _locate_end: the pattern is
# "<name [\s/]* (attr)* \s*" where one attr iteration is position-pure
# (lookbehind + fixed charsets, nothing before it can backtrack into it
# and nothing mandatory follows), so the end of the attr chain from a
# position is a pure function of that position — memoizable across the
# overlapping scans that made quoted-'>' spam quadratic (see _locate_end).
_LOCATE_NAME = re.compile(r"<[a-zA-Z][^\t\n\r\f />\x00]*")
_SEP_RUN = re.compile(r"[\s/]*")
_ATTR_ITER = re.compile(
    r"(?<=['\"\s/])[^\s/>][^\s/=>]*"  # attribute name
    r"(?:\s*=+\s*"  # value indicator
    r"(?:'[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*)"  # quoted / bare value
    r"\s*)?(?:\s|/(?!>))*"  # separators
)


def _locate_end(html: str, lt: int, memo: dict[int, int]) -> int:
    """``_LOCATE_START.match(html, lt).end()`` in amortized linear time.

    The tolerant locate regex consumes quoted attribute values, and a
    ``>`` inside quotes pairs quotes up across what a human reads as
    separate tags — so on ``'<a b="x>y" ' * N`` each incomplete start tag
    re-scanned the ENTIRE suffix while ``pos`` advanced one unit: O(N²),
    the one-row CPU-DoS class the no-'>' memo already closed for
    unquoted spam (a crafted ~1 MB payload pinned an extraction task for
    hours). The attr loop never backtracks across iterations and each
    iteration's match is position-pure, so the chain end from any
    attr-start position is memoized: overlapping scans from later ``<``
    openers merge into already-computed chains and every position is
    matched at most once per document. Byte-identical end positions
    (differential-tested against the stdlib regex in
    tests/test_htmlfast.py); only the scan cost changes.
    """
    k = _SEP_RUN.match(html, _LOCATE_NAME.match(html, lt).end()).end()
    path = []
    while k not in memo:
        am = _ATTR_ITER.match(html, k)
        if am is None or am.end() == k:
            memo[k] = k
            break
        path.append(k)
        k = am.end()
    end = memo[k]
    for p in path:
        memo[p] = end
    return end

# Fast-accept for the overwhelmingly common well-formed start tag: ASCII
# alnum name, whitespace-separated attrs with simple names and quoted
# (no '<'/'>'/'`' inside) or safe-charset bare values, optional '/'. On
# its match domain this is equivalent to the full mirror below — every
# charset is a strict subset of what locate/attrfind consume at the same
# position and the construct ends at a real '>' — so the expensive
# locate+attr loop only runs for unusual tags. No match ⇒ fall through;
# never a wrong accept (validated by the differential fuzz).
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>`]*\"|'[^'<>`]*'|[-a-zA-Z0-9_./:;+#%&?=~,@!]+))?)*"
    r"\s*(/?)>"
)

# Bogus declarations / processing instructions: swallowed through the
# first '>' (parse_html_declaration's doctype branch and
# parse_bogus_comment both land on the first '>'; parse_pi likewise).
_DECL_RE = re.compile(r"<![^>]*>")
_PI_RE = re.compile(r"<\?[^>]*>")

# _markupbase marked-section handling: name token, then cdata/include/
# ignore/rcdata/temp close with ']]>', the MS-conditional keywords with
# ']>'; an unknown/missing keyword raises in HTMLParser (the collector's
# try/except then keeps only already-flushed blocks) — mirrored by _ABORT.
# EXCEPT when the name run (incl. trailing whitespace, exactly
# _markupbase._declname_match) touches end of buffer: _scan_name returns
# (None, -1) BEFORE the keyword check, so goahead(1) treats the construct
# as incomplete (raw-slice fallback) even for an unknown keyword.
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKED_KEYWORDS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_KEYWORDS = frozenset({"if", "else", "endif"})
_MARKED_CLOSE = re.compile(r"\]\s*\]\s*>")
_MS_MARKED_CLOSE = re.compile(r"\]\s*>")

_MARKED_AT_EOF = object()  # sentinel: name run reached end of buffer


def _marked_kind(html: str, lt: int):
    """Classify '<![' at ``lt``: the close-pattern regex to search for,
    ``None`` for HTMLParser's unknown-keyword error (abort), or
    ``_MARKED_AT_EOF`` when _scan_name would report end-of-buffer
    (incomplete construct, goahead fallback)."""
    i = lt + 3
    if i == len(html):
        return _MARKED_AT_EOF
    nm = _DECLNAME.match(html, i)
    if nm is not None and nm.end() == len(html):
        return _MARKED_AT_EOF
    kw = nm.group(0).strip().lower() if nm else ""
    if kw in _MARKED_KEYWORDS:
        return _MARKED_CLOSE
    if kw in _MS_KEYWORDS:
        return _MS_MARKED_CLOSE
    return None

# HTMLParser's CDATA_CONTENT_ELEMENTS: content is raw (no entity decode,
# no tag events) until set_cdata_mode's "interesting" pattern — the FULL
# close form r'</\s*<elem>\s*>' (Python 3.11 html/parser.py) — matches.
# A junk candidate ('</scriptx>', '</script junk>') is NOT a close and
# NOT special: goahead's interesting.search never stops at it, so it is
# part of the raw data run. When no full close pattern exists ahead, the
# cdata branch breaks without emitting and the final flush is gated on
# ``not self.cdata_elem`` — the ENTIRE remainder (even content before a
# junk candidate) is swallowed: '<script>var x</scri' contributes no text.
_RAWTEXT = ("script", "style")
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _RAWTEXT
}


def _rawtext_events(html: str, name: str, pos: int, n: int):
    """CDATA-mode mirror (goahead + parse_endtag with cdata_elem set).
    Yields raw _DATA/_END events; returns the resume position.

    On a full-close match, parse_endtag's endtagfind necessarily matches
    the same span with the same element name (nothing but '\\s' and name
    chars precede the '>'), so the close is always the clean
    handle_endtag + clear_cdata_mode path — one raw data chunk, one end
    event."""
    mm = _RAWTEXT_CLOSE[name].search(html, pos)
    if mm is None:
        return n  # unterminated: remaining content is dropped
    if mm.start() > pos:
        yield (_DATA, html[pos : mm.start()])
    yield (_END, name)
    return mm.end()

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
    find = html.find
    # Anti-quadratic memo: almost every construct needs a '>' somewhere
    # ahead, and '>'-lessness is a suffix property — once a probe
    # discovers there is no '>' from some index on, every later '<' can
    # skip the full scans (locate's attr run and the comment/marked close
    # searches otherwise rescan to end-of-string per opener: '<a ' * N
    # was O(N²), a one-row CPU DoS in the extraction task). Output is
    # byte-identical; only the scan cost changes.
    no_gt = None  # index from which html provably contains no '>'
    gt_hint = -1  # memoized find('>') result to keep the probe itself linear
    # same trick for the comment/marked close patterns: a failed
    # closer.search is a suffix property too — '<!--x>' spam would
    # otherwise rescan the tail per opener (stdlib HTMLParser is
    # quadratic there; the fallback jump to the next '>' advances only
    # one unit per O(suffix) search)
    no_close: set[int] = set()  # id(closer) whose search already failed
    attr_memo: dict[int, int] = {}  # _locate_end chain memo (same trick)

    def closer_search(closer, start):
        key = id(closer)
        if key in no_close:
            return None
        mm = closer.search(html, start)
        if mm is None:
            no_close.add(key)
        return mm

    def note_no_gt():
        # probe once whether any '>' remains after lt; gt_hint keeps the
        # probe itself linear across calls
        nonlocal no_gt, gt_hint
        if no_gt is None:
            if gt_hint < lt:
                gt_hint = find(">", lt)
            if gt_hint < lt:  # find returned -1: no '>' from lt on
                no_gt = lt

    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = html[pos:]
            yield (_DATA, unescape(chunk) if "&" in chunk else chunk)
            return
        if lt > pos:
            chunk = html[pos:lt]
            yield (_DATA, unescape(chunk) if "&" in chunk else chunk)
        c = html[lt + 1 : lt + 2]
        is_letter = ("a" <= c <= "z") or ("A" <= c <= "Z")
        if no_gt is not None and lt >= no_gt:
            # no '>' anywhere ahead: replicate each branch's outcome
            # without scanning to end-of-string
            if is_letter:
                # start tag that can never complete: either check_for_
                # whole_start_tag's bogus-input stop (a '\x00' directly
                # after the tag name, not preceded by a quote — the only
                # reachable bogus stop in a '>'-less suffix) emitting the
                # RAW name slice, or the incomplete fallback
                km = _TAGFIND.match(html, lt + 1)
                j0 = lt + 1 + len(km.group(1))
                if j0 < n and html[j0] == "\x00" and html[j0 - 1] not in "'\"":
                    yield (_DATA, html[lt:j0])
                    pos = j0
                else:
                    pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            if html.startswith("!--", lt + 1):
                # comment opener, close unreachable → goahead fallback
                pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            if html.startswith("![", lt + 1):
                if _marked_kind(html, lt) is None:
                    yield (_ABORT, None)
                    return
                # valid keyword (close unreachable without '>') or name at
                # EOF: both are goahead's incomplete fallback
                pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            # end tag / decl / pi without '>', or a bare '<': all reduce
            # to the fallback's text, which splits as '<' + data here
            yield (_DATA, "<")
            pos = lt + 1
            continue
        if is_letter:
            # -- start tag: parse_starttag + check_for_whole_start_tag --
            sm = _SIMPLE_START.match(html, lt)
            if sm is not None:
                name = sm.group(1).lower()
                pos = sm.end()
                if sm.group(2):
                    yield (_STARTEND, name)
                else:
                    yield (_START, name)
                    if name in _RAWTEXT:
                        pos = yield from _rawtext_events(html, name, pos, n)
                continue
            j = _locate_end(html, lt, attr_memo)
            nxt = html[j : j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/":
                if html.startswith("/>", j):
                    endpos = j + 2
                else:
                    note_no_gt()
                    pos = yield from _incomplete(html, lt, know_no_gt=no_gt is not None)
                    continue
            elif nxt == "" or nxt in _NEXT_INCOMPLETE:
                # probe the memo: when the locate scan died because the
                # suffix has no '>' at all ('<a ' spam), later openers
                # must skip the O(suffix) rescan
                note_no_gt()
                pos = yield from _incomplete(html, lt, know_no_gt=no_gt is not None)
                continue
            else:
                endpos = j  # bogus input: raw-data fallback below
            km = _TAGFIND.match(html, lt + 1)
            k = km.end()
            while k < endpos:
                am = _ATTRFIND.match(html, k)
                if am is None:
                    break
                k = am.end()
            tail = html[k:endpos].strip()
            if tail not in (">", "/>"):
                # parse_starttag's direct handle_data: RAW slice (no
                # unescape), resume at endpos
                yield (_DATA, html[lt:endpos])
                pos = endpos
                continue
            name = km.group(1).lower()
            pos = endpos
            if tail == "/>":
                yield (_STARTEND, name)
            else:
                yield (_START, name)
                if name in _RAWTEXT:
                    pos = yield from _rawtext_events(html, name, pos, n)
            continue
        if c == "/":
            # -- end tag: parse_endtag (tolerant) --
            gt2 = find(">", lt + 1)
            if gt2 < 0:
                note_no_gt()
                pos = yield from _incomplete(html, lt, know_no_gt=True)
                continue
            em = _ENDTAGFIND.match(html, lt)
            if em is not None:
                yield (_END, em.group(1).lower())
                pos = gt2 + 1
                continue
            nm2 = _TAGFIND.match(html, lt + 2)
            if nm2 is not None:
                # junk between the name and '>' is consumed and ignored
                yield (_END, nm2.group(1).lower())
                pos = gt2 + 1
                continue
            if html.startswith("</>", lt):
                pos = lt + 3
                continue
            pos = gt2 + 1  # bogus comment: swallowed through the first '>'
            continue
        if c == "!":
            if html.startswith("--", lt + 2):
                mm = closer_search(_COMMENT_CLOSE, lt + 4)
                if mm is None:
                    # incomplete construct: goahead(1)'s fallback emits
                    # the slice up to the next '>' (or '<', or one char),
                    # unescaped, and resumes after it. Probe the no-'>'
                    # memo too: '<!-- ' spam with no '>' would otherwise
                    # rescan the suffix per opener
                    note_no_gt()
                    pos = yield from _incomplete(
                        html, lt, know_no_gt=no_gt is not None
                    )
                    continue
                pos = mm.end()
                continue
            if html[lt + 2 : lt + 3] == "[":
                # <![keyword ... : _markupbase semantics — ']]>' close for
                # cdata-family, ']>' for MS conditionals, abort on
                # anything else, incomplete fallback when the name
                # touches EOF
                closer = _marked_kind(html, lt)
                if closer is None:
                    yield (_ABORT, None)
                    return
                mm = (
                    None
                    if closer is _MARKED_AT_EOF
                    else closer_search(closer, lt + 3)
                )
                if mm is None:
                    note_no_gt()
                    pos = yield from _incomplete(
                        html, lt, know_no_gt=no_gt is not None
                    )
                    continue
                pos = mm.end()
                continue
            dm = _DECL_RE.match(html, lt)
            if dm is not None:
                pos = dm.end()  # doctype / bogus decl: swallowed whole
                continue
            note_no_gt()
            yield (_DATA, "<")
            pos = lt + 1
            continue
        if c == "?":
            pm = _PI_RE.match(html, lt)
            if pm is not None:
                pos = pm.end()  # processing instruction: swallowed whole
                continue
            note_no_gt()
            yield (_DATA, "<")
            pos = lt + 1
            continue
        # '<' not opening any construct: literal text (HTMLParser emits
        # it as data and moves one char)
        yield (_DATA, "<")
        pos = lt + 1


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
    after_head = False  # between an (implicit or explicit) </head> and <body>
    title_drop = 0  # <title> drops opened by the after-head rule below

    def on_start(tag):
        nonlocal drop_depth, boiler_depth, article_depth, link_depth
        nonlocal cur_tag, head_drop, after_head, title_drop
        if head_drop and drop_depth == head_drop and tag not in HEAD_CONTENT_TAGS:
            # HTML5 tag omission: any non-head-content start tag (<body>,
            # <p>, <div>, ...) implies </head> — without this a document
            # omitting </head> drops its entire body, and one omitting
            # <body> too would extract as empty. Only when head is the
            # sole open drop: a tag nested inside another drop container
            # (<noscript><img> tracking pixels are common in <head>) must
            # not end the head and leak <title> text into the main text.
            drop_depth = 0
            head_drop = 0
            after_head = True
        if tag in DROP_TAGS:
            drop_depth += 1
            if tag == "head":
                head_drop += 1
                after_head = False
            return
        if tag == "title" and after_head and not drop_depth:
            # HTML5 "after head" mode routes title/meta/link/script/style
            # back through the in-head rules: a <title> that follows the
            # implicit (or explicit) </head> — common when a custom
            # element or tracking <img> in <head> triggered the release
            # above — is still metadata, never rendered text. Of that
            # tag list only <title> carries text and is not already in
            # DROP_TAGS, so it gets its own drop scope here; <body>
            # clears the mode below.
            drop_depth += 1
            title_drop += 1
            return
        if tag == "body":
            after_head = False
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
        nonlocal cur_tag, head_drop, after_head, title_drop
        if tag in DROP_TAGS:
            if head_drop and drop_depth == head_drop and tag != "head":
                # stray close of an unopened drop container (</iframe>
                # with only <head> scopes open): browsers IGNORE an
                # unmatched end tag — decrementing here would cancel the
                # head drop and leak <title>/metadata text into the main
                # text (the start side guards the same class with the
                # drop_depth == head_drop check)
                return
            drop_depth = max(0, drop_depth - 1)
            if tag == "head" and head_drop:
                head_drop -= 1
                if not head_drop:
                    after_head = True  # explicit </head>: same after-head
                    # mode as the implicit release (spec parity for a
                    # stray <title> between </head> and <body>)
            return
        if tag == "title" and title_drop:
            drop_depth = max(0, drop_depth - 1)
            title_drop -= 1
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
