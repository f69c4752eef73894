"""Deterministic synthetic transcripts generator (FIXTURES.md, seed=42).

Produces the input table ``(conv_id, turn_idx, role, text, tool, ts)`` with
payload grammars per FIXTURES.md §2 — grounding marker soups covering every
pinned reference behavior, HTML boilerplate pages, shuffled PDF span JSON,
markdown with tables, plain text — written in a deterministic shuffled row
order so stable ``(conv_id, turn_idx)`` ordering is actually exercised.

Pure pyarrow writer (no Spark needed to generate fixtures).
"""

from __future__ import annotations

import datetime as dt
import json
import random

import pyarrow as pa
import pyarrow.parquet as pq

EOS = "<｜end▁of▁sentence｜>"
REF = "<|ref|>{}<|/ref|><|det|>{}<|/det|>"

ROLES = ["user", "assistant", "tool"]
TOOLS = ["grounding", "html", "pdfspans", "markdown", "plain"]

T0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


# --------------------------------------------------------------------------
# grounding payloads: the 15 must-include cases (FIXTURES.md §2.1)
# --------------------------------------------------------------------------

def _g_case(i: int, rng: random.Random) -> str:
    filler = f"Paragraph {rng.randrange(1000)} body text. "
    cases = [
        lambda: "Intro. " + REF.format("title", "[[12,34,567,89]]") + " Heading text\n"
        + filler + REF.format("image", "[[100,200,300,400]]") + " after image." + EOS,
        lambda: ("dup " + REF.format("image", "[[1,2,3,4]]")) * 2 + " done" + EOS,
        lambda: REF.format("table", "[[0,0,999,999],[100,200,300,400],[50,60,70,80]]")
        + " multi-box" + EOS,
        lambda: "nl-label " + REF.format("multi\nline label", "[[5,6,7,8]]") + EOS,
        lambda: "bad " + REF.format("figure", "[[10,20,") + " coords" + EOS,
        lambda: "runaway no eos " + filler,  # case 6: missing eos
        lambda: "x \\coloneqq y and z \\eqqcolon w" + EOS,
        lambda: "f: \\[x = y \\quad (1.23)\\] and \\[a+b\\]" + EOS,
        lambda: "a\n\n\n\nb\n\n\nc" + EOS,
        lambda: "<center>centered title</center> rest" + EOS,
        lambda: "<table><tr>" + "<td>cell</td>" * 8 + "</tr></table>" + EOS,
        lambda: ("tok " * 35) * 4,  # case 12: 30-gram repeat, no eos
        lambda: "中文文本 🙂 emoji " + REF.format("图表", "[[9,9,99,99]]") + " 结束" + EOS,
        lambda: REF.format("text", "[[0,0,999,999]]") + " extremes" + EOS,
        lambda: str(
            {
                "Line": {
                    "line": ["(0,0) -- (5,5)", "(1,2) -- (3,4)"],
                    "line_type": ["--", "-"],
                    "line_endpoint": ["A: (0,0)", "B: (5,5)"],
                },
                "Circle": {"circle_center": ["O: (1,1)"], "radius": [2]},
            }
        )
        + EOS,
    ]
    return cases[i % len(cases)]()


# --------------------------------------------------------------------------
# html payloads: 6 parameterized templates (FIXTURES.md §2.2)
# --------------------------------------------------------------------------

def _html_case(i: int, rng: random.Random) -> str:
    para = (
        f"This is substantial article paragraph {rng.randrange(1000)} with enough "
        "characters of running prose to clear the density threshold easily."
    )
    nav = '<nav><a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a></nav>'
    footer = "<footer>© 2026 Example — <a href='/tos'>Terms</a></footer>"
    linkfarm = "<div>" + " ".join(f'<a href="/l{k}">link {k}</a>' for k in range(8)) + "</div>"
    script = "<script>var x = 1 < 2 && 3 > 2;</script><style>p{color:red}</style>"
    templates = [
        f"<html><head><title>T</title></head><body>{nav}<article><h1>Headline {i}</h1>"
        f"<p>{para}</p><p>{para} Second.</p></article>{footer}</body></html>",
        f"<html><body>{script}{nav}<div id=main><p>{para}</p>{linkfarm}<p>{para}</p></div>"
        f"{footer}</body></html>",
        f"<html><body><header>{nav}</header><main><h2>Section</h2><p>{para} &amp; more "
        f"&#x4e2d;文</p></main>{footer}</body></html>",
        f"<html><body><article><p>{para} <b>bold</b> and <a href='/x'>a link</a> inline."
        f"</p><p>{para}</p></article>{linkfarm}</body></html>",
        f"<html><body><aside>{linkfarm}</aside><section><p>{para}</p><ul><li>{para}</li>"
        f"<li>short</li></ul></section></body></html>",
        # unclosed tag case
        f"<html><body><div><p>{para}<p>{para} unclosed {footer}</body>",
    ]
    return templates[i % len(templates)]


def _pdf_case(i: int, rng: random.Random) -> str:
    spans = []
    n_rows = 2 + (i % 3)
    for r in range(n_rows):
        y = 40 + 120 * r + rng.randrange(4)  # same quantum row ± jitter
        for c in range(2):
            x = 30 + 470 * c
            spans.append(
                {"t": f"row{r} col{c} words {rng.randrange(100)}", "bbox": [x, y, x + 400, y + 30]}
            )
    if i % 4 == 0:
        spans.append({"t": "", "bbox": [10, 5, 20, 15]})  # empty span text
    if i % 5 == 0:
        spans.append({"t": "overlap", "bbox": [500, 45, 900, 70]})  # overlapping row
    rng.shuffle(spans)  # shuffled out of reading order
    return json.dumps({"page": i % 3, "spans": spans}, ensure_ascii=False)


def _md_case(i: int, rng: random.Random) -> str:
    table = "| a | b |\n|---|---|\n| 1 | two |\n| 3 | four |"
    htmltab = "<table><tr><td>h1</td><td>h2</td></tr><tr><td>v1</td><td>v2</td></tr></table>"
    code = "```python\nprint('hi')\n```"
    latex = "\\[E = mc^2\\]"
    return (
        f"# Title {i}\n\n\nSome text {rng.randrange(100)}.\n\n{table}\n\n"
        f"{htmltab}\n\n{code}\n\n{latex}\n\n\n\ntail   \n"
    )


def _plain_case(i: int, rng: random.Random) -> str:
    cases = [
        f"  plain text {rng.randrange(1000)} with whitespace  \n",
        "",
        "   \n\t  ",
        f"多语言 plain 🙂 {rng.randrange(100)}",
        f"line1\nline2 {rng.randrange(100)}\n",
    ]
    return cases[i % len(cases)]


_PAYLOAD = {
    "grounding": _g_case,
    "html": _html_case,
    "pdfspans": _pdf_case,
    "markdown": _md_case,
    "plain": _plain_case,
}

PROFILES = {
    # name: (n_convs, min_turns, max_turns, skew_conv_turns)
    "tiny": (24, 1, 8, 0),
    "small": (500, 1, 40, 0),
    "bench": (2000, 10, 90, 100_000),
}

# Multi-file profiles: (n_convs, min_turns, max_turns, skew_conv_turns,
# n_files). Written as a DIRECTORY of parquet files so the scan itself has
# enough splits for full map-stage parallelism without a repartition shuffle
# — the shape a 100 TB table actually has (thousands of files). Row
# generation is per-conv seeded, so any file is reproducible independently.
DIR_PROFILES = {
    "bench_lg": (20_000, 10, 90, 100_000, 128),
    # 4x bench_lg: the Amdahl probe input for the scaling protocol — the
    # corpus job's serial constant (driver pacing across its ~20 stages)
    # is fixed while parallel work scales with rows, so efficiency at 4x
    # rows separates "job too small" from "DAG doesn't scale"
    "bench_xl": (80_000, 10, 90, 100_000, 128),
}


def generate_rows(profile: str = "tiny", seed: int = 42):
    n_convs, lo, hi, skew = PROFILES[profile]
    rng = random.Random(seed)
    rows = []
    g_row = 0
    # per-tool sequence counters so every payload case cycles regardless of
    # how the tool column is assigned (a shared index would alias mod 5)
    seq = {tool: 0 for tool in TOOLS}
    for c in range(n_convs):
        conv_id = f"conv_{c:06d}"
        n_turns = rng.randint(lo, hi)
        # fix the tool per turn deterministically; tiny profile cycles all
        for t in range(n_turns):
            tool = TOOLS[(c + t) % len(TOOLS)]
            text = _PAYLOAD[tool](seq[tool], rng)
            seq[tool] += 1
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ROLES[t % 3],
                    "text": text,
                    "tool": tool,
                    "ts": T0 + dt.timedelta(seconds=137 * g_row),
                }
            )
            g_row += 1
    if skew:
        conv_id = f"conv_{n_convs:06d}"
        for t in range(skew):
            tool = TOOLS[t % len(TOOLS)]
            text = _PAYLOAD[tool](seq[tool], rng)
            seq[tool] += 1
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ROLES[t % 3],
                    "text": text,
                    "tool": tool,
                    "ts": T0 + dt.timedelta(seconds=137 * g_row),
                }
            )
            g_row += 1
    # deterministic shuffle so stable ordering is exercised
    random.Random(seed + 1).shuffle(rows)
    return rows


SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
    ]
)


def _gen_conv_rows(c: int, lo: int, hi: int, seed: int) -> list[dict]:
    """One conversation's rows, reproducible from (seed, c) alone."""
    rng = random.Random(f"{seed}:{c}")
    conv_id = f"conv_{c:06d}"
    n_turns = rng.randint(lo, hi)
    rows = []
    for t in range(n_turns):
        tool = TOOLS[(c + t) % len(TOOLS)]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ROLES[t % 3],
                "text": _PAYLOAD[tool](c * 7 + t, rng),
                "tool": tool,
                "ts": T0 + dt.timedelta(seconds=c * 9000 + 137 * t),
            }
        )
    return rows


def _gen_skew_rows(conv_no: int, turns: range, seed: int) -> list[dict]:
    """A slice of the single huge skew conversation; each turn reproducible
    from (seed, t) so the conversation can be generated file-by-file."""
    conv_id = f"conv_{conv_no:06d}"
    rows = []
    for t in turns:
        tool = TOOLS[t % len(TOOLS)]
        rng = random.Random(f"{seed}:skew:{t}")
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ROLES[t % 3],
                "text": _PAYLOAD[tool](t, rng),
                "tool": tool,
                "ts": T0 + dt.timedelta(seconds=conv_no * 9000 + 137 * t),
            }
        )
    return rows


def _write_table(rows: list[dict], path: str) -> None:
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    table = pa.Table.from_pydict(cols, schema=SCHEMA)
    # small row groups so Spark can split within a file too
    pq.write_table(table, path, row_group_size=8192)


def write_transcripts_dir(path: str, profile: str, seed: int = 42) -> int:
    """Write a DIR_PROFILES dataset as a directory of parquet files.

    File i holds convs c ≡ i (mod n_files) plus skew turns t ≡ i (mod
    n_files) — the skew conversation's rows are scattered over every file,
    as they would be in a real ingested table, so assembly has to shuffle
    them back together.

    Generation is ATOMIC: files land in a sibling temp dir renamed into
    place only when complete. Both benchmark harnesses treat an existing
    path as a complete dataset, so a generation interrupted mid-way must
    never leave a partial directory behind — it would silently benchmark a
    fraction of the rows with a truncated skew conversation forever."""
    import os
    import shutil

    n_convs, lo, hi, skew, n_files = DIR_PROFILES[profile]
    tmp = path.rstrip("/") + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    total = 0
    for i in range(n_files):
        rows: list[dict] = []
        for c in range(i, n_convs, n_files):
            rows.extend(_gen_conv_rows(c, lo, hi, seed))
        if skew:
            rows.extend(_gen_skew_rows(n_convs, range(i, skew, n_files), seed))
        random.Random(f"{seed + 1}:{i}").shuffle(rows)
        _write_table(rows, os.path.join(tmp, f"part-{i:05d}.parquet"))
        total += len(rows)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return total


def write_transcripts(path: str, profile: str = "tiny", seed: int = 42) -> int:
    if profile in DIR_PROFILES:
        return write_transcripts_dir(path, profile, seed)
    rows = generate_rows(profile, seed)
    _write_table(rows, path)
    return len(rows)


if __name__ == "__main__":
    import sys

    profile = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"data/transcripts_{profile}.parquet"
    import os

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    n = write_transcripts(out, profile)
    print(f"wrote {n} rows → {out}")
