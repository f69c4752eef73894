"""Property tests for the round-1 extension operators: as-of join vs a
brute-force model, chunking roundtrip, pdfspans reading-order invariants."""

import datetime as dt
import json
import random

from hypothesis import given, settings, strategies as st

from sparkocr.textproc import pdfspans


# ---------------------------------------------------------------------------
# pdfspans: pure-python invariants under random span soups
# ---------------------------------------------------------------------------

spans_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "t": st.text(alphabet="abcxyz ", max_size=8),
            "bbox": st.tuples(
                st.integers(0, 999), st.integers(0, 999),
                st.integers(0, 999), st.integers(0, 999),
            ).map(list),
        }
    ),
    max_size=12,
)


@settings(max_examples=120, deadline=None)
@given(spans=spans_strategy, page=st.integers(0, 3))
def test_pdfspans_invariants(spans, page):
    payload = json.dumps({"page": page, "spans": spans})
    text, out_spans, err = pdfspans.extract_pdf_spans(payload)
    assert err is None
    # every input span appears exactly once, offsets index its text
    assert len(out_spans) == len(spans)
    for s in out_spans:
        assert 0 <= s["start"] <= s["end"] <= len(text)
    # offsets are non-overlapping and ordered (reading order is a sort)
    bounds = sorted((s["start"], s["end"]) for s in out_spans)
    for (a1, b1), (a2, b2) in zip(bounds, bounds[1:]):
        assert b1 <= a2
    # every offset pair slices to exactly one input span's text (multiset
    # of SLICE STRINGS, not characters — a per-char multiset would pass
    # swapped or shifted per-span offsets)
    slices = [text[s["start"] : s["end"]] for s in out_spans]
    assert sorted(slices) == sorted(s["t"] for s in spans)


def test_chunk_turns_matches_python_slicing_unicode(spark):
    """The REAL chunk_turns vs Python codepoint slicing over unicode that
    stresses the length/substring semantics (astral-plane emoji, CJK,
    combining marks): Spark's UTF8String functions count codepoints like
    Python len(), and this pins it — the earlier version of this test
    modeled the slicing in Python on both sides and could not catch any
    divergence in the Spark arithmetic at all."""
    from sparkocr.textproc.chunking import chunk_turns

    texts = [
        "", "abc", "😀" * 7 + "x", "𝕏y" * 5, "中文字符串测试" * 3,
        "é" * 9, "a" * 10, "ab" * 6 + "c", "🙂🙃" * 4 + "🙂",
    ]
    k = 5
    df = spark.createDataFrame(
        [(f"c{i:02d}", 0, t) for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, text string",
    )
    by_conv: dict[str, list] = {}
    for r in chunk_turns(df, max_chars=k).collect():
        by_conv.setdefault(r.conv_id, []).append(r)
    for i, t in enumerate(texts):
        got = sorted(by_conv[f"c{i:02d}"], key=lambda r: r.chunk_idx)
        n_chunks = max((len(t) + k - 1) // k, 1)
        want = [t[j * k : (j + 1) * k] for j in range(n_chunks)]
        assert [r.chunk_text for r in got] == want, t
        assert all(r.n_chunks == n_chunks for r in got), t


# ---------------------------------------------------------------------------
# as-of join vs brute-force model on random interleaved data (Spark)
# ---------------------------------------------------------------------------


def test_asof_join_matches_bruteforce_model(spark):
    from sparkocr.pipeline.relational_ext import asof_join

    rng = random.Random(7)
    base = dt.datetime(2026, 1, 1)
    keys = ["a", "b", "c"]
    lrows = [
        (rng.choice(keys), base + dt.timedelta(hours=rng.randrange(200)), f"L{i}")
        for i in range(60)
    ]
    rrows = [
        (rng.choice(keys), base + dt.timedelta(hours=rng.randrange(200)), f"R{i}", i)
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "k string, t timestamp, lid string")
    right = spark.createDataFrame(rrows, "k string, rt timestamp, rid string, tb int")

    got = {
        r.lid: r.rid_asof
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "tb"], right_tiebreak="tb",
        ).collect()
    }

    # brute force: max (rt, tb) among right rows with same key, rt <= t
    want = {}
    for k, t, lid in lrows:
        cands = [(rt, tb, rid) for (rk, rt, rid, tb) in rrows if rk == k and rt <= t]
        want[lid] = max(cands)[2] if cands else None
    assert got == want

    # the chunked two-phase plan is semantically identical at every chunk
    # width — including widths smaller than the data span (many boundary
    # carries) and much larger (single chunk degenerates to phase 1 only)
    for cs in (1800, 3600, 86400, 365 * 86400):
        chunked = {
            r.lid: r.rid_asof
            for r in asof_join(
                left, right, key="k", left_time="t", right_time="rt",
                right_cols=["rid", "tb"], right_tiebreak="tb",
                chunk_seconds=cs,
            ).collect()
        }
        assert chunked == want, cs


def test_asof_chunked_null_tiebreak_boundary(spark):
    """Boundary carry (max_by over a struct key) must rank a NULL tiebreak
    below every real value — same as the window path's asc_nulls_first —
    and drop null right-times, when the deciding rows sit in an EARLIER
    chunk than the left row (the phase-2 carry path)."""
    from sparkocr.pipeline.relational_ext import asof_join

    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("k", t0 + dt.timedelta(days=10), 1)], "k string, t timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k", t0, "null_tb", None), ("k", t0, "real_tb", 5),
         ("k", None, "null_time", 9)],
        "k string, rt timestamp, rid string, tb int",
    )
    for cs in (None, 86400):
        r = asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "tb"], right_tiebreak="tb", chunk_seconds=cs,
        ).collect()
        assert (r[0].rid_asof, r[0].tb_asof) == ("real_tb", 5), cs


def test_asof_chunked_null_keys_match_unchunked(spark):
    """Window partitionBy groups NULL keys together (they DO match each
    other); the chunked phase-2 carry join must be null-safe or null-key
    left rows silently lose cross-chunk matches (code-review finding)."""
    from sparkocr.pipeline.relational_ext import asof_join

    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [(None, t0 + dt.timedelta(days=40), 1),  # cross-chunk null-key
         (None, t0 + dt.timedelta(hours=1), 2),  # same-chunk null-key
         ("k", t0 + dt.timedelta(days=40), 3),
         (None, None, 4)],                       # null key AND null time
        "k string, t timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(None, t0, "r_null", 1), ("k", t0, "r_k", 2)],
        "k string, rt timestamp, rid string, tb int",
    )
    kw = dict(key="k", left_time="t", right_time="rt",
              right_cols=["rid", "tb"], right_tiebreak="tb")
    want = {r.lid: r.rid_asof for r in asof_join(left, right, **kw).collect()}
    got = {r.lid: r.rid_asof
           for r in asof_join(left, right, chunk_seconds=30 * 86400, **kw).collect()}
    assert want == {1: "r_null", 2: "r_null", 3: "r_k", 4: None}
    assert got == want


def test_session_counts_chunked_matches_model(spark):
    """Chunked sessionization == unchunked == brute-force model, on data
    crafted to hit exact-threshold gaps (==gap never splits; >gap does)
    and equal-time ties, including gaps that straddle chunk boundaries."""
    from sparkocr.pipeline.relational_ext import session_counts

    rng = random.Random(11)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in ("a", "b", "c"):
        t = 0.0
        for _ in range(200):
            # steps sampled around the 1800s threshold: exactly equal,
            # just over, just under, zero (tie), and huge
            t += rng.choice([0.0, 1.0, 1799.0, 1800.0, 1800.5, 1801.0, 90000.0])
            rows.append((u, base + dt.timedelta(seconds=t)))
    df = spark.createDataFrame(rows, "u string, ts timestamp")

    want = {}
    by_u = {}
    for u, ts in rows:
        by_u.setdefault(u, []).append(ts.timestamp())
    for u, v in by_u.items():
        v.sort()
        breaks = sum(1 for x, y in zip(v, v[1:]) if y - x > 1800)
        want[u] = (breaks + 1, len(v))

    for cs in (None, 1800, 3600, 86400, 10**9):
        got = {
            r.u: (r.n_sessions, r.n_events)
            for r in session_counts(
                df, key="u", time="ts", gap_seconds=1800, chunk_seconds=cs
            ).collect()
        }
        assert got == want, cs


def test_asof_chunked_microsecond_boundary_times(spark):
    """Timestamps with microsecond fractions landing exactly ON and ±1 µs
    around chunk boundaries: the chunk index derives from fractional-epoch
    division, so an off-by-one there moves a row into the wrong chunk and
    the boundary carry silently changes matches (the round-2 bug class was
    exactly fractional-epoch time math). Offline 12-trial fuzz over random
    seeds/widths/null mixes found no divergence; this pins one crafted
    trial of it in CI."""
    from sparkocr.pipeline.relational_ext import asof_join, session_counts

    rng = random.Random(1003)  # the trial shape with cs=7 (many carries)
    base = dt.datetime(2026, 1, 1)
    cs = 7
    span = cs * 18

    def ts():
        if rng.randrange(2):
            k = rng.randrange(span // cs + 1)
            return base + dt.timedelta(
                seconds=k * cs + rng.choice([-0.000001, 0.0, 0.000001])
            )
        return base + dt.timedelta(seconds=rng.uniform(0, span))

    lrows = [(rng.choice(["a", "b", None]), ts(), f"L{i}") for i in range(60)]
    rrows = [
        (rng.choice(["a", "b", None]), None if rng.random() < 0.05 else ts(),
         f"R{i}", rng.choice([None, 0, 1]))
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "k string, t timestamp, lid string")
    right = spark.createDataFrame(rrows, "k string, rt timestamp, rid string, tb int")
    kw = dict(key="k", left_time="t", right_time="rt",
              right_cols=["rid", "tb"], right_tiebreak="tb")

    # model: null keys match null keys (window partitioning semantics),
    # null tiebreak ranks below every real value, null right-times dropped
    model = {}
    for k, t, lid in lrows:
        cands = [
            (rt.timestamp(), (tb is not None, tb or 0), rid)
            for (rk, rt, rid, tb) in rrows
            if rk == k and rt is not None and rt <= t
        ]
        model[lid] = max(cands)[2] if cands else None

    assert {r.lid: r.rid_asof for r in asof_join(left, right, **kw).collect()} == model
    assert {
        r.lid: r.rid_asof
        for r in asof_join(left, right, chunk_seconds=cs, **kw).collect()
    } == model

    srows = [(k, t) for (k, t, _) in lrows if k is not None]
    df = spark.createDataFrame(srows, "u string, ts timestamp")
    by_u = {}
    for u, t in srows:
        by_u.setdefault(u, []).append(t.timestamp())
    smodel = {}
    for u, v in by_u.items():
        v.sort()
        smodel[u] = (1 + sum(1 for x, y in zip(v, v[1:]) if y - x > 3.5), len(v))
    for chunk in (None, cs):
        got = {
            r.u: (r.n_sessions, r.n_events)
            for r in session_counts(
                df, key="u", time="ts", gap_seconds=3.5, chunk_seconds=chunk
            ).collect()
        }
        assert got == smodel, chunk
