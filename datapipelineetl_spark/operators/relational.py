"""Relational operator compositions (SURVEY.md §2.5–2.7).

The reference has no DataFrame joins/aggregations/windows — its only
join-like computation is the per-measInfo measType position→name lookup done
with a Python dict (dags/Dag2.py:103-106,129 — C10). The engine exposes the
full relational surface via Spark built-ins; this module adds the named
compositions the north star needs, each shaped for scale:

- lookups broadcast the small side explicitly,
- top-k per group uses window + row_number (one shuffle, no global sort),
- EAV→wide pivot passes explicit pivot values when known (avoids the extra
  distinct-collect job Spark otherwise runs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    value_col: str,
    out: str,
    default=None,
    how: str = "left",
) -> DataFrame:
    """C10 generalized: join a small lookup table with a miss-default.

    Reference semantics (dags/Dag2.py:103-106,129): KPI position code ``p``
    → KPI name via the per-measInfo measType dict; a missing key yields
    ``UNKNOWN_{p}``. Expressed as a broadcast hash join (dim side is tiny) +
    ``coalesce`` for the miss case — no shuffle on the 100 TB fact side.
    """
    joined = facts.join(F.broadcast(dim), on=list(on), how=how)
    if default is not None:
        joined = joined.withColumn(out, F.coalesce(F.col(value_col), default))
        if value_col != out:
            joined = joined.drop(value_col)
    elif value_col != out:
        joined = joined.withColumnRenamed(value_col, out)
    return joined


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col,
    k: int,
    ascending: bool = False,
    rank_col: str = "rn",
    keep_rank: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows per group: Window.partitionBy + row_number ≤ k.

    One hash shuffle on the group keys; no global sort. ``tiebreak`` columns
    make row_number deterministic (required for oracle comparison).
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def pivot_eav(
    df: DataFrame,
    key_cols: Sequence[str],
    name_col: str,
    value_col: str,
    names: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """EAV (long) → wide pivot — what Kibana does with the reference's
    long-format KPI records (SURVEY.md §2.6).

    Passing ``names`` explicitly skips Spark's extra distinct-scan job to
    discover pivot values — at 100 TB that scan is a full pass over the
    fact table, so callers should always pass the known KPI list.
    """
    aggf = {"first": F.first, "sum": F.sum, "avg": F.avg, "max": F.max, "min": F.min}[agg]
    p = df.groupBy(*key_cols).pivot(name_col, list(names) if names else None)
    return p.agg(aggf(value_col))


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    name_col: str = "name",
    value_col: str = "value",
) -> DataFrame:
    """Wide → EAV via the built-in ``unpivot`` (narrow, no shuffle)."""
    return df.unpivot(list(id_cols), list(value_cols), name_col, value_col)


def dedupe_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup: hash-shuffle on the subset columns, keep one row each.

    ``dropDuplicates`` compiles to a partial+final aggregate (map-side
    combine first), so the shuffle carries only distinct keys per partition.
    """
    return df.dropDuplicates(list(subset) if subset else None)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction="backward"), or the earliest with
    ``right_ts >= left_ts`` (direction="forward"), per key — the
    time-series join Spark lacks natively (pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN``).

    Implemented as the scalable union-and-window pattern, not a range
    cross-join: tag both sides, union, single shuffle on (keys), sort by
    time within partition, then ``last(right_col, ignorenulls=True)`` over
    rows-unbounded-preceding carries the most recent right value onto each
    left row. O(n log n) per key group, one exchange total — survives a
    100× scale-up where a naive range join (O(|L|×|R|) per key) dies.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rcols = list(right_cols)
    rt = (
        right.withColumn("__ts", F.col(right_ts)).withColumn("__side", F.lit(0))
    )
    lt_all = lt
    for c in rcols:
        lt_all = lt_all.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    keep_left = [c for c in left.columns]
    rt_all = rt.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in list(on) else F.col(c)
            for c in keep_left
        ],
        *[F.col(c) for c in rcols],
        "__ts",
        "__side",
    )
    unioned = lt_all.select(*keep_left, *rcols, "__ts", "__side").unionByName(rt_all)
    # right rows sort before left rows at equal timestamps so an exact-tie
    # right value is visible to the left row (ASOF <=/>= semantics);
    # forward = the same carry over the reversed time order
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in rcols:
        carried = carried.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).drop("__ts", "__side")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (large, skewed) left side into
    ``buckets`` sub-keys and replicate the right side once per salt value,
    so a hot key's rows spread over ``buckets`` tasks instead of one.

    Use when AQE's skew-join split isn't enough (single key ≫ partition
    target) and the right side is small enough to replicate ``buckets``×.
    Result is row-identical to the plain join (salt is an internal column,
    dropped on output). Supports inner/left joins (the replicated side
    must be the lookup side).

    Salt = row-id mod buckets: deterministic within a run, uniform, and —
    unlike hashing the join key — actually varies *within* a hot key group,
    which is the whole point.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join replicates the right side: inner/left only")
    lt = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), buckets).cast("int")
    )
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lt.join(rt, [*on, "__salt"], how).drop("__salt")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Sessionization: lag(ts) per user + cumulative sum over gap>threshold.

    Single shuffle on ``user_col`` reused by both window functions
    (identical partitioning/ordering ⇒ one Window exchange in the plan).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap_sec.isNull() | (gap_sec > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(session_col, F.sum(is_new).over(w))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_days: int = 7,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Point-in-interval range join: each ``points`` row matches every
    ``intervals`` row with ``start_ts <= point_ts < end_ts`` (closed-open,
    the calendar-window convention) — the second time-series join Spark
    lacks natively (OSS Spark compiles a pure inequality join to
    BroadcastNestedLoopJoin: O(|P|×|I|) pair evaluations and a broadcast
    of a whole side; DuckDB/pg execute it as a native range join).

    Implemented as the standard bucketization rewrite: time is cut into
    ``bucket_days``-wide buckets, each interval is exploded to the buckets
    it covers, each point gets its single containing bucket, and the join
    becomes an EQUI-join on the bucket plus an exact containment filter.
    Each (point, interval) match is produced exactly once (a point lives
    in exactly one bucket), so no dedup is needed.

    Scale: shuffle volume O(|P| + |I| × span/bucket_days) and the
    pairwise work is confined to per-bucket groups — survives sides that
    are BOTH fact-sized, where the nested-loop form needs one side to fit
    in a broadcast and still evaluates every pair. Pick ``bucket_days``
    near the typical interval length (spans ≈ 2 buckets); too small
    explodes interval replicas, too large degrades bucket selectivity.
    Day resolution via ``datediff`` day numbers keeps the bucketing
    engine-portable (and NTZ-safe — NOTES.md). For SUB-DAY windows
    (minute-scale event intervals — the first thing a time-series user
    asks of a range join) pass ``bucket_seconds``: the bucket key becomes
    ``floor(unix_seconds / bucket_seconds)``, same plan shape, same
    exactly-once match guarantee. The bucket function only needs to be
    monotone and consistent WITHIN the engine — the exact containment
    filter uses the original timestamps — so unix-seconds portability
    across engines is not a correctness concern. Pick it near the typical
    interval length, same trade-off as ``bucket_days``.

    Column names must be disjoint between the two inputs (standard
    pre-join hygiene; rename upstream).
    """
    if bucket_seconds is not None:
        if bucket_seconds < 1:
            raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
        bucket = lambda c: F.floor(F.unix_timestamp(c) / bucket_seconds)  # noqa: E731
    else:
        if bucket_days < 1:
            raise ValueError(f"bucket_days must be >= 1, got {bucket_days}")
        epoch = F.lit("1970-01-01")
        bucket = lambda c: F.floor(F.datediff(c, epoch) / bucket_days)  # noqa: E731
    p = points.withColumn("__rj_bucket", bucket(F.col(point_ts)))
    iv = intervals.filter(F.col(start_ts) <= F.col(end_ts)).withColumn(
        "__rj_bucket",
        F.explode(F.sequence(bucket(F.col(start_ts)), bucket(F.col(end_ts)))),
    )
    return (
        p.join(iv, "__rj_bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__rj_bucket")
    )
