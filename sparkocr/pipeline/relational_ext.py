"""Relational operators Spark lacks as primitives: as-of join, range join.

Both are implemented as compositions of built-in DataFrame ops (the
preferred strategy for custom operators — no UDFs, fully Catalyst-visible):

- **as-of join**: for each left row, the single most recent right row with
  the same key and right_time <= left_time. Union the two sides tagged,
  sort within key by (time, side-order), and carry the last right row
  forward with a window `last(..., ignorenulls)` — one shuffle on the key,
  no cross product, skew-safe under AQE. At 10^12 rows this beats the
  naive `join + row_number` (which materializes every candidate pair).
- **range join**: equi-key + interval containment. Expressed as an equi
  join on (key, coarse time bucket) with the precise range predicate on
  top, so Catalyst gets a shuffle-hash/broadcast join on the bucket key
  instead of a banded nested loop; each left row probes its own and the
  preceding bucket (intervals bounded by `max_span`).
- **sessionization**: per-key session counts under a max-gap rule.

Skew note (the 100 TB story): a window partitioned on a bare key puts a
hot key's entire history into ONE sort task — AQE skew-splitting does not
apply inside window partitions. `asof_join` and `session_counts` therefore
take ``chunk_seconds``: when set, phase 1 runs the window per
(key, time-chunk) — a hot key's 10^9 rows become #chunks independent
tasks — and phase 2 carries boundary state between chunks over ONE summary
row per (key, chunk), the same two-phase trick `assemble.py` uses for
concat skew. Semantics are identical (property-tested against the
single-window path). Engagement on the catalog queries: as-of dispatches
ADAPTIVELY (``chunk_min_key_rows`` — a measured-skew probe picks the
plan, so balanced inputs skip the two-phase constant), sessionization
stays unconditionally chunked so the chunked branch remains
oracle-checked every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_s(col):
    """Fractional epoch seconds. ``unix_timestamp()`` truncates to whole
    seconds, which shifts bucket/validation arithmetic for sub-second
    timestamps; timestamp→double keeps microseconds (dates go via
    timestamp — Spark forbids a direct date→double cast)."""
    return F.col(col).cast("timestamp").cast("double")


#: Per-frame file-count cap for the footer shortcut: reading this many
#: parquet footers driver-side stays in the low milliseconds; a frame
#: backed by more files is large enough that the honest probe is the
#: right tool anyway.
_FOOTER_MAX_FILES = 256


#: Logical-plan node names under which file-footer row counts remain an
#: UPPER bound on the frame's rows: projections, filters, limits, sorts
#: and aliases never add rows. Anything else (Join, Generate/explode,
#: Union, Aggregate, ...) can multiply rows past the footer total, so
#: its presence disables the metadata shortcut.
_ROW_BOUND_SAFE_NODES = frozenset({
    "Project", "Filter", "Relation", "LogicalRelation", "SubqueryAlias",
    "GlobalLimit", "LocalLimit", "Sort", "Repartition",
    "RepartitionByExpression",
})


def _plan_is_scan_shaped(df: DataFrame) -> bool:
    """True iff ``df``'s analyzed plan contains only row-non-increasing
    nodes over file relations — the precondition for the footer bound.
    Parsed from the plan's treeString (first token per line after the
    tree art); unknown shapes fail closed."""
    try:
        tree = df._jdf.queryExecution().analyzed().treeString()
    except Exception:
        return False
    for line in tree.splitlines():
        name = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0]
        if name and name not in _ROW_BOUND_SAFE_NODES:
            return False
    return True


def _rows_upper_bound(df: DataFrame) -> int | None:
    """Driver-side UPPER BOUND on ``df``'s row count, read from its
    parquet file footers — NO Spark job. Returns ``None`` when unknown
    (non-file source, too many files, non-parquet input, unreadable
    footer) or when the frame's plan could hold MORE rows than its
    input files (joins, explodes, unions — ``_plan_is_scan_shaped``):
    the footers count the files' physical rows, so the bound is safe
    exactly for scan/project/filter-shaped plans, where downstream
    operators only remove rows.

    This exists for the adaptive skew dispatch below: the per-key probe
    is an extra Spark job (~0.25 s of fixed cost at any input size),
    but when the WHOLE input holds fewer rows than the engagement
    threshold, no key can possibly reach it — provable from metadata
    alone, for free."""
    if not _plan_is_scan_shaped(df):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > _FOOTER_MAX_FILES:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            if not f.endswith(".parquet"):
                return None
            path = f
            if path.startswith("file:"):
                # file:///p, file:/p and file://host/p all normalize to /p
                path = path[len("file:"):]
                while path.startswith("//"):
                    path = path[1:]
            total += pq.ParquetFile(path).metadata.num_rows
        return total
    except Exception:
        return None


def _max_key_rows(keys: DataFrame) -> int:
    """Skew probe: the largest per-key row count over a single-column
    frame. Column-pruned to the key alone at the scan and map-side
    partial-aggregated before its (distinct-key-sized) shuffle — the
    cheapest honest answer to "does a hot key exist?". Null keys count
    as one key, matching window partitioning (nulls partition together).
    Eager: one job at call time, the same measured-dispatch discipline
    as ``extract_turns``' byte-skew file listing."""
    row = (
        keys.groupBy(keys.columns[0])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
    )
    return int(row["mx"] or 0)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
    chunk_seconds: int | None = None,
    chunk_min_key_rows: int | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right[key] == left[key] and right[right_time] <= left[left_time]
    (ties: the right row wins — it is 'already known' at that instant;
    among equal-time right rows, max ``right_tiebreak`` wins).
    Left rows with no prior right row keep nulls. Right rows with a NULL
    ``right_time`` are dropped: ``right_time <= left_time`` is never true
    for null (the SQL comparison semantics every oracle uses), but ASC
    ordering puts nulls FIRST, so an unfiltered null-time row would be
    carried to every left row before the first real right row —
    fabricating matches.

    ``chunk_seconds``: when set, the skew-safe two-phase plan (see
    ``_asof_join_plan`` for the mechanics and its one-narrow-rescan cost).
    ``chunk_min_key_rows``: ADAPTIVE engagement — when set alongside
    ``chunk_seconds``, the dispatch first tries a FREE metadata bound
    (``_rows_upper_bound``: parquet-footer row counts, no Spark job —
    if both sides together hold fewer rows than the threshold, no key
    can reach it), then falls back to a cheap probe (one
    key-column-only scan of both inputs, ``_max_key_rows``) that
    measures the hottest key; the
    chunked plan engages only if some key holds at least this many rows;
    below the threshold the single-window single-scan plan runs, so a
    balanced input never pays the two-phase constant (measured ~2.5× at
    sf0.1) just to buy immunity it doesn't need. This is the same
    measured-skew dispatch ``extract_turns`` uses for byte-skewed scans:
    pay one cheap measurement, pick the plan the data actually needs.
    ``None`` (default) keeps ``chunk_seconds`` unconditional — callers
    that KNOW the key is skewed skip the probe scan."""
    if chunk_seconds is not None and chunk_min_key_rows is not None:
        # metadata short-circuit first: when the parquet footers bound
        # BOTH sides' combined rows below the threshold, no key can
        # reach it — the probe job is skipped entirely (zero extra
        # Spark jobs). Unknown bounds (non-file inputs, many files)
        # fall through to the honest probe.
        lb, rb = _rows_upper_bound(left), _rows_upper_bound(right)
        if lb is not None and rb is not None and lb + rb < chunk_min_key_rows:
            chunk_seconds = None
        else:
            # hot-key rows in the window = union of both sides per key
            probe = left.select(F.col(key)).unionByName(
                right.select(F.col(key))
            )
            if _max_key_rows(probe) < chunk_min_key_rows:
                chunk_seconds = None
    return _asof_join_plan(
        left, right, key, left_time, right_time, right_cols,
        suffix, right_tiebreak, chunk_seconds,
    )


def _asof_join_plan(
    left, right, key, left_time, right_time, right_cols,
    suffix, right_tiebreak, chunk_seconds,
) -> DataFrame:
    """The plan builder behind ``asof_join`` (post skew dispatch).

    ``chunk_seconds``: when set, the skew-safe two-phase plan — the
    last-carry window runs per (key, time-chunk) so a hot key's rows
    split across #chunks tasks; cross-chunk carry goes through one
    summary row per (key, chunk) (the per-chunk latest right row,
    last-carried over strictly earlier chunks). Identical results
    (null keys/times included — the carry join is null-safe to match
    window partitioning semantics). Cost trade-off vs the single
    window: the summaries aggregate re-reads both inputs (no exchange
    reuse with the window subtree), but it map-side partial-aggregates
    to one row per (key, chunk) before its shuffle and Catalyst prunes
    it to the key/time/right columns — so the price of skew immunity is
    one narrow re-scan, not a second full shuffle. Use it whenever one
    key can dominate a partition; ``None`` keeps the single-window,
    single-scan plan (fine for bounded keys)."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(right.select(*right_cols).schema).alias("_rrow"),
    )
    r_tag = right.filter(F.col(right_time).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    u = l_tag.unionByName(r_tag)
    order = [F.col("_t"), F.col("_side")]
    if right_tiebreak is not None:
        # deterministic winner among right rows sharing a timestamp: max
        # tiebreak must sort LAST among the rights so last() carries it —
        # and a NULL tiebreak must lose, hence nulls_first (nulls_last
        # would let a null-tiebreak row beat every real value). Left rows'
        # third key is null but _side already orders them after rights.
        order.append(F.col(f"_rrow.{right_tiebreak}").asc_nulls_first())

    def _project(carried: DataFrame, rcol: str) -> DataFrame:
        return carried.filter(F.col("_side") == 1).select(
            "_lrow.*",
            *[F.col(f"{rcol}.{c}").alias(c + suffix) for c in right_cols],
        )

    if chunk_seconds is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return _project(u.withColumn("_r", F.last("_rrow", ignorenulls=True).over(w)), "_r")

    # phase 1: within-chunk last-carry — window keyed on (key, chunk), so a
    # hot key's work is #chunks tasks, not one
    u = u.withColumn("_chunk", F.floor(_epoch_s("_t") / chunk_seconds))
    w_local = (
        Window.partitionBy("_k", "_chunk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_r_local", F.last("_rrow", ignorenulls=True).over(w_local))
    # chunk summaries: the latest right row per (key, chunk) — max_by over
    # (time, tiebreak) among right rows only (left rows get a NULL ordering
    # key, which max_by ignores); chunks with no right rows keep NULL state
    skey = [F.col("_t")]
    if right_tiebreak is not None:
        skey.append(F.col(f"_rrow.{right_tiebreak}"))
    summaries = u.groupBy("_k", "_chunk").agg(
        F.max_by(
            F.col("_rrow"), F.when(F.col("_side") == 0, F.struct(*skey))
        ).alias("_state")
    )
    # phase 2: carry state across chunks — ONE row per (key, chunk), so the
    # per-key window is bounded by #chunks regardless of row skew
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = summaries.select(
        F.col("_k").alias("_pk"),
        F.col("_chunk").alias("_pchunk"),
        F.last("_state", ignorenulls=True).over(w_carry).alias("_r_prev"),
    )
    # null-safe join: the unchunked window PARTITIONS null keys together
    # (they do match each other), and a null left-time lands in a null
    # chunk — a plain equality join would silently drop the cross-chunk
    # carry for exactly those rows while the within-chunk phase kept them
    joined = (
        local.join(
            prev,
            F.col("_k").eqNullSafe(F.col("_pk"))
            & F.col("_chunk").eqNullSafe(F.col("_pchunk")),
            "left",
        )
        .drop("_pk", "_pchunk")
        .withColumn("_r", F.coalesce(F.col("_r_local"), F.col("_r_prev")))
    )
    return _project(joined, "_r")


def session_counts(
    events: DataFrame,
    key: str,
    time: str,
    gap_seconds: float,
    chunk_seconds: int | None = None,
    chunk_min_key_rows: int | None = None,
) -> DataFrame:
    """Per-key sessionization: (key, n_sessions, n_events), where a new
    session starts at any gap > ``gap_seconds`` between consecutive events
    (ordered by time; equal-time events never open a gap, so no tiebreak
    column is needed for counts).

    ``chunk_seconds``: when set, the skew-safe two-phase plan — phase 1
    counts within-chunk session breaks per (key, time-chunk) window and
    reduces each chunk to one summary row (n_breaks, first/last ts,
    n_events); phase 2 adds boundary breaks between consecutive chunk
    summaries (gap from the previous chunk's last event to this chunk's
    first) over a per-key window that sees #chunks rows, not #events.
    total sessions = within breaks + boundary breaks + 1.

    ``chunk_min_key_rows``: adaptive engagement, same contract as
    ``asof_join`` — one key-column probe, chunking only when the hottest
    key holds at least this many events; ``None`` = unconditional."""
    if chunk_seconds is not None and chunk_min_key_rows is not None:
        # same metadata-first dispatch as asof_join: a footer row-count
        # bound below the threshold proves no key can reach it
        ub = _rows_upper_bound(events)
        if ub is not None and ub < chunk_min_key_rows:
            chunk_seconds = None
        elif _max_key_rows(events.select(F.col(key))) < chunk_min_key_rows:
            chunk_seconds = None
    ts = _epoch_s(time)
    e = events.select(F.col(key).alias("_k"), ts.alias("_ts"))
    if chunk_seconds is None:
        w = Window.partitionBy("_k").orderBy("_ts")
        gap = F.col("_ts") - F.lag("_ts").over(w)
        brk = F.when(gap > gap_seconds, 1).otherwise(0)
        return (
            e.withColumn("_brk", brk)
            .groupBy("_k")
            .agg(
                (F.sum("_brk") + F.lit(1)).alias("n_sessions"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(F.col("_k").alias(key), "n_sessions", "n_events")
        )
    e = e.withColumn("_chunk", F.floor(F.col("_ts") / chunk_seconds))
    w_local = Window.partitionBy("_k", "_chunk").orderBy("_ts")
    gap = F.col("_ts") - F.lag("_ts").over(w_local)
    brk = F.when(gap > gap_seconds, 1).otherwise(0)
    per_chunk = (
        e.withColumn("_brk", brk)
        .groupBy("_k", "_chunk")
        .agg(
            F.sum("_brk").alias("_n_breaks"),
            F.min("_ts").alias("_first_ts"),
            F.max("_ts").alias("_last_ts"),
            F.count(F.lit(1)).alias("_n_events"),
        )
    )
    w_carry = Window.partitionBy("_k").orderBy("_chunk")
    bgap = F.col("_first_ts") - F.lag("_last_ts").over(w_carry)
    bbrk = F.when(bgap > gap_seconds, 1).otherwise(0)
    return (
        per_chunk.withColumn("_bbrk", bbrk)
        .groupBy("_k")
        .agg(
            (F.sum("_n_breaks") + F.sum("_bbrk") + F.lit(1)).alias("n_sessions"),
            F.sum("_n_events").alias("n_events"),
        )
        .select(F.col("_k").alias(key), "n_sessions", "n_events")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    right_cols: list[str],
    validate: bool = True,
) -> DataFrame:
    """left rows joined to right intervals containing them:
    right[r_start] <= left[left_time] < right[r_end], same key.
    Intervals must span < ``bucket_seconds`` so each point needs only its
    own and the previous bucket — turning the band predicate into an equi
    join on (key, bucket). ``validate`` enforces that precondition with an
    EAGER aggregate-only pass over the right table at call time (column-
    pruned to the two time columns, but still a full extra scan of the
    right side — at 100 TB that is real I/O per invocation). It stays on
    by default because a longer interval SILENTLY loses matches and no
    lazy check (Observation etc.) can refuse the join before wrong results
    are already consumed; pass ``validate=False`` at scale call sites
    where the span bound is guaranteed by construction (schema contract,
    upstream clamp) and the scan would dominate."""
    if validate:
        # cast("double") = fractional epoch seconds; unix_timestamp()
        # truncates to whole seconds, so a span of bucket_seconds - 0.5 s
        # would pass validation yet straddle three buckets
        mx = right.agg(
            F.max(_epoch_s(r_end) - _epoch_s(r_start)).alias("mx")
        ).first()["mx"]
        if mx is not None and mx >= bucket_seconds:
            raise ValueError(
                f"range_join: max interval span {mx}s >= bucket_seconds "
                f"{bucket_seconds}s — two-bucket registration would drop matches"
            )
    lb = left.withColumn(
        "_bkt", F.floor(_epoch_s(left_time) / bucket_seconds)
    )
    rb = right.withColumn(
        "_bkt0", F.floor(_epoch_s(r_start) / bucket_seconds)
    )
    # each interval is registered in its start bucket and the next one
    rexp = rb.select(
        F.col(key).alias("_rk"),
        F.explode(F.array(F.col("_bkt0"), F.col("_bkt0") + 1)).alias("_bkt"),
        *[F.col(c) for c in {r_start, r_end, *right_cols}],
    )
    cond = (
        (lb[key] == rexp["_rk"])
        & (lb["_bkt"] == rexp["_bkt"])
        & (rexp[r_start] <= lb[left_time])
        & (lb[left_time] < rexp[r_end])
    )
    return lb.join(rexp, cond, "inner").select(
        *[lb[c] for c in left.columns],
        *[rexp[c] for c in right_cols],
    )
