"""Pins for the affine minhash family (dedup.minhash_signatures) and the
linear shingle formulation it rides on.

The oracle-parity tests (test_queries doc_minhash / doc_lsh_pairs) check
VALUES against DuckDB's closed-form replay; these pin the properties the
docstrings claim — multibyte-exact linear shingling, prefix-cap
semantics, deterministic RNG-free constants — which a value check over
ASCII fixture text would not exercise.
"""

from __future__ import annotations

import pytest

from sparkocr.pipeline import caching
from sparkocr.pipeline.dedup import (
    MH_PRIME,
    _shingle_rows,
    lsh_candidate_pairs,
    mh_affine_params,
    minhash_signatures,
)

# multibyte soup: emoji (4-byte UTF-8), CJK (3-byte), combining accent
# (2-byte sequence as two code points), plus ASCII — the texts where a
# byte-offset bug in the split/slice/array_join pipeline would show
MB_TEXTS = [
    "café naïve \U0001f600\U0001f680 end",
    "漢字テスト mixed ascii tail",
    "áb́ć combining marks",
    "short",
    "",
    "exactly8",  # == k boundary: exactly one shingle at k=8
]


def _naive_shingles(text: str, k: int) -> list[str]:
    """Reference multiset semantics: every k-char window, CODE POINTS not
    bytes (Python str slicing is the spec)."""
    if len(text) < k:
        return []
    return [text[i : i + k] for i in range(len(text) - k + 1)]


def test_shingle_rows_matches_naive_substr_multibyte(spark):
    k = 8
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(MB_TEXTS)], ["doc_id", "text"]
    )
    got: dict[str, list[str]] = {}
    for r in _shingle_rows(docs, k).collect():
        got.setdefault(r.doc_id, []).append(r.sh)
    for i, t in enumerate(MB_TEXTS):
        assert sorted(got.get(f"d{i}", [])) == sorted(_naive_shingles(t, k)), t


def test_shingle_rows_max_chars_is_codepoint_prefix(spark):
    # the cap must count CODE POINTS (Python-slice semantics), not bytes:
    # a multibyte prefix capped at 6 chars shingles text[:6] exactly
    t = "\U0001f600漢caféxyz"
    docs = spark.createDataFrame([("d", t)], ["doc_id", "text"])
    got = sorted(r.sh for r in _shingle_rows(docs, 3, max_chars=6).collect())
    assert got == sorted(_naive_shingles(t[:6], 3))


def test_mh_affine_params_deterministic_and_in_range():
    p1 = mh_affine_params(64)
    assert p1 == mh_affine_params(64)  # no RNG anywhere
    assert len(set(p1)) == 64  # distinct hash functions
    for a, b in p1:
        assert 0 < a < MH_PRIME  # a=0 would make h_i constant
        assert 0 <= b < MH_PRIME


def test_signatures_within_modulus_and_cap_noop_on_short_docs(spark):
    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"],
    )
    capped = {r.doc_id: r.asDict() for r in
              minhash_signatures(docs, n_perm=8).collect()}
    uncapped = {r.doc_id: r.asDict() for r in
                minhash_signatures(docs, n_perm=8, max_chars=None).collect()}
    assert capped == uncapped  # docs far below the cap: identical sigs
    for row in capped.values():
        for c, v in row.items():
            if c.startswith("mh_"):
                assert 0 <= v < MH_PRIME


def test_prefix_cap_collapses_only_past_cap_divergence(spark):
    # same first 400 chars, divergent tails: capped at 400 they are the
    # SAME document (est 1.0 — the conservative direction for dedup);
    # uncapped the long divergent tails dominate and no pair survives
    shared = "shared prefix words " * 20  # 400 chars
    docs = spark.createDataFrame(
        [("a", shared + "tail one entirely different " * 30),
         ("b", shared + "other ending text disjoint " * 30)],
        ["doc_id", "text"],
    )
    try:
        capped = lsh_candidate_pairs(docs, n_perm=4, band_rows=2,
                                     max_chars=400).collect()
        assert [(r.id1, r.id2, r.est_jaccard) for r in capped] == [
            ("a", "b", 1.0)
        ]
        uncapped = lsh_candidate_pairs(docs, n_perm=4, band_rows=2,
                                       max_chars=None).collect()
        assert uncapped == []
    finally:
        caching.release_all()


def test_min_band_matches_bound_is_safe_and_tight():
    """Brute-force the pigeonhole bound: with m matching bands the max
    agreement is m*r + (B-m)*(r-1); the bound must (a) never exclude an
    m that can pass the rounded estimate filter (safety — the operator
    relies on this for result-identity) and (b) be achievable when
    <= n_bands (tightness — otherwise the prune is weaker than
    documented)."""
    from sparkocr.pipeline.dedup import min_band_matches

    for n_perm, r in [(12, 3), (4, 2), (8, 2), (16, 4), (6, 1)]:
        n_bands = n_perm // r
        for t in [0.25, 0.5, 0.75, 0.8, 0.9, 1.0,
                  # exact k/n_perm boundaries incl. rounding edges
                  *[k / n_perm for k in range(1, n_perm + 1)]]:
            bound = min_band_matches(n_perm, r, t)
            passing = [
                m for m in range(n_bands + 1)
                if round((m * r + (n_bands - m) * (r - 1)) / n_perm, 6) >= t
            ]
            # safety: every m that CAN pass is >= bound (no m < bound
            # passes), except m=0 which the clamp maps under bound=1 —
            # a candidate pair has >= 1 matching band by construction
            for m in passing:
                if m >= 1:
                    assert m >= bound, (n_perm, r, t, m, bound)
            # near-tightness: the 5e-7 rounding slack may admit at most
            # ONE extra m below the true minimum (thresholds that are
            # not 6-dp representable, e.g. 10/12); never more
            real = [m for m in passing if m >= 1]
            if real:
                assert 0 <= min(real) - bound <= 1, (n_perm, r, t, bound, real)


def test_min_est_output_equals_filtered_default(spark):
    """min_est must be result-identical to thresholding the default
    output — the prune may only remove pairs the estimate filter would
    drop anyway. Fixture: a template family with seeded small mutations
    so pairs span the est range (single-band collisions included)."""
    import random

    rng = random.Random(42)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = []
    for i in range(30):
        words = base.split()
        for _ in range(rng.randrange(0, 6)):
            words[rng.randrange(len(words))] = rng.choice(
                ["cat", "mat", "hat", "bat", "rat"]
            )
        rows.append((f"d{i:02d}", " ".join(words)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    try:
        default = {
            (r.id1, r.id2): r.est_jaccard
            for r in lsh_candidate_pairs(docs, n_perm=4, band_rows=2).collect()
        }
        assert default, "fixture produced no candidate pairs"
        for t in [0.5, 0.75, 1.0]:
            pruned = {
                (r.id1, r.id2): r.est_jaccard
                for r in lsh_candidate_pairs(
                    docs, n_perm=4, band_rows=2, min_est=t
                ).collect()
            }
            expect = {p: e for p, e in default.items() if e >= t}
            assert pruned == expect, t
    finally:
        caching.release_all()


def test_min_est_exact_when_cap_hides_collisions(spark, monkeypatch):
    """A pair matching in a CAPPED band and a kept band shows only one
    observed collision; the prune must not drop it (the default path
    keeps it via the surviving bucket and its est clears the
    threshold). Signatures are monkeypatched so the band layout is
    engineered: A,B identical (both bands match, est 1.0); ten fillers
    share A's band-0 bucket only, pushing it past bucket_max."""
    import sparkocr.pipeline.dedup as dedup_mod

    rows = [("A", 1, 1, 2, 2), ("B", 1, 1, 2, 2)]
    rows += [(f"F{i:02d}", 1, 1, 100 + i, 200 + i) for i in range(10)]
    sig = spark.createDataFrame(rows, ["doc_id", "mh_0", "mh_1", "mh_2", "mh_3"])
    monkeypatch.setattr(dedup_mod, "minhash_signatures", lambda *a, **k: sig)
    docs = sig.select("doc_id")
    try:
        kw = dict(n_perm=4, band_rows=2, bucket_max=10)
        default = {
            (r.id1, r.id2): r.est_jaccard
            for r in lsh_candidate_pairs(docs, **kw).collect()
            if r.est_jaccard >= 1.0
        }
        # fixture sanity: band 0 (12 members) capped, (A, B) survives
        # via band 1 alone on the default path
        assert default == {("A", "B"): 1.0}
        pruned = {
            (r.id1, r.id2): r.est_jaccard
            for r in lsh_candidate_pairs(docs, **kw, min_est=1.0).collect()
        }
        assert pruned == default
    finally:
        caching.release_all()


def test_lsh_store_append_replays_build_cap(spark):
    """A store built with max_chars=400 must signature its increments at
    400 too — otherwise the same long doc gets different signatures per
    append and cross-increment near-dups silently vanish."""
    from sparkocr.pipeline.lsh_store import (
        build_lsh_store,
        incremental_lsh_pairs,
        read_store_meta,
    )

    shared = "shared prefix words " * 20
    base = spark.createDataFrame(
        [("old", shared + "tail one entirely different " * 30)],
        ["doc_id", "text"],
    )
    inc = spark.createDataFrame(
        [("new", shared + "other ending text disjoint " * 30)],
        ["doc_id", "text"],
    )
    name = "lsh_store_capreplay"
    try:
        build_lsh_store(base, name, n_perm=4, band_rows=2, n_buckets=2,
                        max_chars=400)
        assert read_store_meta(spark, name)["max_chars"] == 400
        pairs = incremental_lsh_pairs(inc, name).collect()
        # found ONLY because the increment replayed the 400-char cap
        assert [(r.id1, r.id2) for r in pairs] == [("new", "old")] or \
               [(r.id1, r.id2) for r in pairs] == [("old", "new")]
    finally:
        caching.release_all()
        for t in (f"{name}_sigs", f"{name}_bands", f"{name}_meta",
                  f"{name}_commits"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
