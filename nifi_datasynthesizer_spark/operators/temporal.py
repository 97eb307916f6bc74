"""Temporal join operators: as-of (point-in-time) and range joins.

Spark has no native ASOF JOIN (DuckDB and kdb do); the scalable
re-expression here is the union-and-window trick: tag both sides,
union them, and carry the latest right-side attributes forward with a
window ordered by time within each key.  One shuffle on (key), no
inequality join, no cartesian blowup — the classic way to do
point-in-time correctness (e.g. joining events to the dimension
snapshot that was current WHEN the event happened) at 100 TB.

Range joins (event time ∈ [start, end)) bucket both sides to
fixed-width time buckets, join on (key?, bucket) equality, and
post-filter the interval predicate — turning an inequality join that
Spark would plan as BroadcastNestedLoop/cartesian into an equi-join
whose shuffle key is uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the latest right row with the same
    ``on`` key and right.ts <= left.ts (strictly the most recent
    snapshot at or before the event).

    Plan: union of tagged rows → window(last over key ORDER BY ts,
    tag) → keep left rows.  The only exchange is one hash partition on
    ``on``; both sides are sorted once within partitions.  Rows with no
    prior snapshot keep NULLs.

    Tie rule: a right snapshot AT the same timestamp as the event is
    visible to it (right sorts before left on equal ts via the tag).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    lhs = left.select(
        F.col(on), F.col(ts),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in (on, ts)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}")
          for c in rcols])
    rhs = right.select(
        F.col(on), F.col(ts),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in (on, ts)],
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols])
    u = lhs.unionByName(rhs)
    # right rows (tag 0) sort before left rows (tag 1) at equal ts, so
    # last_value(..., ignorenulls) sees same-instant snapshots
    w = (Window.partitionBy(on).orderBy(ts, "__is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        "*", *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
               .alias(f"__f_{c}") for c in rcols])
    return (filled.filter(F.col("__is_left") == 1)
            .select(F.col(on), F.col(ts),
                    *[F.col(c) for c in left.columns if c not in (on, ts)],
                    *[F.col(f"__f_{c}").alias(f"{c}{suffix}")
                      for c in rcols]))


def range_join(left: DataFrame, right: DataFrame, ts: str,
               start: str, end: str, bucket_width: int,
               on: str | None = None) -> DataFrame:
    """Join left rows (point ``ts``, a numeric epoch) to right rows
    (interval [start, end), same units) with equality on the optional
    ``on`` key.

    Scalable shape: right intervals explode to every ``bucket_width``
    bucket they cover (sequence → explode — intervals spanning B
    buckets emit B rows, so pick the width near the median interval
    length); left rows compute one bucket.  The join is then a pure
    equi-join on (bucket[, on]) with the interval predicate as a
    post-filter — no inequality-join cartesian fallback.
    """
    b = F.lit(bucket_width)
    lkey = [F.floor(F.col(ts) / b).alias("__bucket")] + \
        ([F.col(on)] if on else [])
    l = left.select("*", *lkey)
    r = right.select(
        "*",
        F.explode(F.sequence(F.floor(F.col(start) / b),
                             F.floor((F.col(end) - 1) / b))).alias("__bucket"))
    keys = ["__bucket"] + ([on] if on else [])
    out = (l.join(r, keys)
           .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
           .drop("__bucket"))
    return out
