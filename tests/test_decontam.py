"""Benchmark decontamination: flags match a pure-Python n-gram oracle,
the clean corpus removes exactly the flagged docs, and the plan never
shuffles the exploded corpus-side n-gram table (broadcast probe)."""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"
N = 5  # small n so fixture texts actually overlap


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "doc_id", "text"
    )


def _norm(text):
    if text is None:
        return []
    cleaned = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def _grams(text, n):
    toks = _norm(text)
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.fixture(scope="module")
def bench(spark, docs):
    """Benchmark items: mid-document slices of a handful of corpus docs
    (the realistic contamination shape) plus one novel item."""
    rows = [r for r in docs.filter("doc_id in (3, 17, 40)").collect()]
    items = []
    for r in rows:
        toks = _norm(r.text)
        if len(toks) >= N + 4:
            items.append((" ".join(toks[2 : 2 + N + 2]),))
    items.append(("completely novel benchmark question nothing shares",))
    assert len(items) >= 3
    return spark.createDataFrame(items, "text string")


def test_flags_match_python_oracle(spark, docs, bench):
    from sparkocr.pipeline.decontam import contamination_flags

    bench_set = set()
    for b in bench.collect():
        bench_set.update(_grams(b.text, N))
    want = {}
    for r in docs.collect():
        hits = sum(1 for g in _grams(r.text, N) if g in bench_set)
        if hits:
            want[r.doc_id] = hits
    got = {
        r.doc_id: r.n_hits
        for r in contamination_flags(docs, bench, n=N).collect()
    }
    assert got == want and len(got) >= 3  # the sliced docs are flagged


def test_decontaminate_removes_exactly_flagged(spark, docs, bench):
    from sparkocr.pipeline.decontam import contamination_flags, decontaminate

    flagged = {
        r.doc_id for r in contamination_flags(docs, bench, n=N).collect()
    }
    clean = decontaminate(docs, bench, n=N)
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert clean_ids == all_ids - flagged
    assert set(clean.columns) == set(docs.columns)  # every column kept


def test_corpus_ngrams_are_never_shuffled(spark, docs, bench):
    """The scale contract: the exploded corpus n-gram table probes a
    BROADCAST benchmark set — no hashpartitioning Exchange may sit
    between the corpus scan/explode and the semi-join; only the tiny
    matched-rows aggregation shuffles."""
    from sparkocr.pipeline.decontam import contamination_flags

    plan = (
        contamination_flags(docs, bench, n=N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # ancestor walk from the corpus scan (textual plans indent children
    # under parents): no Exchange may sit between the documents scan and
    # the broadcast semi-join — the benchmark side's distinct() Exchange
    # is benchmark-sized and allowed
    lines = plan.splitlines()

    def _indent(s):
        return len(s) - len(s.lstrip(" +-:*"))

    scans = [
        i for i, ln in enumerate(lines)
        if "FileScan" in ln and "documents" in ln
    ]
    assert scans, plan
    for i in scans:
        cur = _indent(lines[i])
        for j in range(i - 1, -1, -1):
            pj = lines[j]
            if not pj.strip():
                continue
            pind = _indent(pj)
            if pind >= cur:
                continue  # sibling subtree
            cur = pind
            assert "Exchange" not in pj, f"corpus side shuffled:\n{pj}"
            if "BroadcastHashJoin" in pj:
                break  # reached the probe without a shuffle


def test_short_and_poison_docs_are_safe(spark, bench):
    from sparkocr.pipeline.decontam import contamination_flags, decontaminate

    weird = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, ""), (4, "!!! ??? ..."),
         (5, "completely novel benchmark question nothing shares")],
        "doc_id long, text string",
    )
    flags = {
        r.doc_id: r.n_hits
        for r in contamination_flags(weird, bench, n=N).collect()
    }
    assert set(flags) == {5}  # only the verbatim benchmark copy
    assert {r.doc_id for r in decontaminate(weird, bench, n=N).collect()} == {
        1, 2, 3, 4,
    }
    with pytest.raises(ValueError, match="n must be positive"):
        contamination_flags(weird, bench, n=0)


def test_preprobe_is_result_identical(spark, docs, bench):
    """The prefix pre-probe is a pure pruning step: flags with the
    probe on (default), with a 1-token prefix, and fully disabled must
    be identical — including the poison/short-doc edges."""
    from sparkocr.pipeline.decontam import contamination_flags

    weird = spark.createDataFrame(
        [(1001, "tiny"), (1002, None), (1003, ""), (1004, "!!! ??? ..."),
         (1005, "completely novel benchmark question nothing shares")],
        "doc_id long, text string",
    )
    both = docs.unionByName(weird)
    base = {
        (r.doc_id, r.n_hits)
        for r in contamination_flags(both, bench, n=N, prefix_probe=0).collect()
    }
    for k in (1, 2, 3):
        got = {
            (r.doc_id, r.n_hits)
            for r in contamination_flags(
                both, bench, n=N, prefix_probe=k
            ).collect()
        }
        assert got == base, f"prefix_probe={k} diverged"
    assert base  # the fixture actually flags something


def test_preprobe_prunes_exploded_rows(spark, docs, bench):
    """The point of the pre-probe: on a mostly-clean corpus the
    prefix-filtered n-gram table is a fraction of the full explode."""
    from sparkocr.pipeline.decontam import (
        _bench_prefix_set, _doc_gram_table,
    )

    full = _doc_gram_table(docs, N, 0, None).count()
    vals = _bench_prefix_set(bench, N, 2, 100_000)
    pruned = _doc_gram_table(docs, N, 2, vals).count()
    assert pruned < full * 0.2, (pruned, full)
    assert pruned > 0  # the contaminated slices survive the filter


def test_preprobe_empty_benchmark_and_cap_fallback(spark, docs):
    from sparkocr.pipeline.decontam import contamination_flags

    # benchmark with no n-grams at all (every item shorter than n)
    tiny_bench = spark.createDataFrame([("one two",), (None,)], "text string")
    assert contamination_flags(docs, tiny_bench, n=N).count() == 0

    # prefix set past the cap: loud warning + identical (fallback) result
    import warnings as _w

    big_bench = docs.limit(20)  # plenty of distinct 2-token prefixes
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        capped = {
            (r.doc_id, r.n_hits)
            for r in contamination_flags(
                docs, big_bench, n=N, probe_cap=5
            ).collect()
        }
    assert any("pre-probe disabled" in str(c.message) for c in caught)
    want = {
        (r.doc_id, r.n_hits)
        for r in contamination_flags(
            docs, big_bench, n=N, prefix_probe=0
        ).collect()
    }
    assert capped == want


def test_null_doc_id_fails_closed(spark, bench):
    """A contaminated doc whose doc_id is null must NOT leak into the
    clean corpus (a plain anti-join never matches null keys); when no
    null-id doc is contaminated they all survive."""
    from sparkocr.pipeline.decontam import contamination_flags, decontaminate

    dirty = spark.createDataFrame(
        [(None, "completely novel benchmark question nothing shares"),
         (None, "an innocent null id document with plenty of words here"),
         (1, "another innocent doc")],
        "doc_id long, text string",
    )
    flags = contamination_flags(dirty, bench, n=N).collect()
    # the 6-token verbatim copy holds two 5-grams, both contaminated
    assert [(r.doc_id, r.n_hits) for r in flags] == [(None, 2)]
    clean = decontaminate(dirty, bench, n=N).collect()
    # fail closed: BOTH null-id docs removed (they cannot be told apart)
    assert [r.doc_id for r in clean] == [1]

    ok = spark.createDataFrame(
        [(None, "an innocent null id document with plenty of words here"),
         (1, "another innocent doc")],
        "doc_id long, text string",
    )
    kept = sorted(
        (r.doc_id is None, r.doc_id) for r in decontaminate(ok, bench, n=N).collect()
    )
    assert len(kept) == 2  # nothing flagged → null-id docs survive
