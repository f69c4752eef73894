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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_s(col):
    """Fractional epoch seconds. ``unix_timestamp()`` truncates to whole
    seconds, which shifts bucket/validation arithmetic for sub-second
    timestamps; timestamp→double keeps microseconds (dates go via
    timestamp — Spark forbids a direct date→double cast)."""
    return F.col(col).cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
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
    fabricating matches."""
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
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_r", F.last("_rrow", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col(f"_r.{c}").alias(c + suffix) for c in right_cols],
    )
    return out


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
    join on (key, bucket). ``validate`` enforces that precondition with one
    cheap aggregate (a longer interval would silently lose matches);
    disable it only when the bound is guaranteed by construction."""
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
