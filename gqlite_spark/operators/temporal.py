"""Temporal joins for event streams: as-of join (point-in-time lookup).

The as-of join — "for each left row, the latest right row at or before its
timestamp, per key" — is the workhorse of feature attribution and
point-in-time-correct training-data assembly.  Spark has no built-in;
the naive formulations both fail at scale:

- inequality theta-join + row_number: Catalyst plans a broadcast-nested-
  loop or cartesian range join, quadratic per key;
- per-key ``applyInPandas`` merge: Python in the hot path.

This implementation uses the UNION + ORDERED WINDOW technique (the classic
distributed as-of algorithm): tag both sides, union them into one event
sequence, and carry the most recent right payload forward with
``last(..., ignorenulls=True)`` over a (key)-partitioned, time-ordered
window.  Cost: ONE shuffle on the key (same as any keyed join) + a per-key
sort — no range join, no Python, no per-key quadratic blowup.  AQE's skew
handling applies to the single exchange, and whole-stage codegen covers
the window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def epoch_micros(df: DataFrame, ts_col: str):
    """Event time as epoch microseconds (bigint), from any of the ts
    encodings the test parquet may carry: TimestampType / TimestampNTZType
    (parquet TIMESTAMP(MICROS) — the shipped encoding at every sf) or long
    nanoseconds (parquet TIMESTAMP(NANOS) read with
    spark.sql.legacy.parquet.nanosAsLong).  NTZ needs an explicit cast to
    TimestampType before unix_micros; callers must run with session
    TZ=UTC (sources.testdata.load sets it) for the epoch to be stable."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"{ts_col} div 1000")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame,
              on: str, by: list[str] | str,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              strict: bool = False,
              tolerance: int | None = None) -> DataFrame:
    """Point-in-time join: for each ``left`` row, attach the latest
    ``right`` row with ``right.on <= left.on`` (direction="backward";
    "forward" gives the earliest right row at-or-after), matching on the
    ``by`` key(s).  Left rows with no eligible right row keep nulls
    (left-outer semantics).

    on         time column name, present in both sides, totally ordered
               (numeric or timestamp).
    right_cols right columns to attach (default: all non-key, non-time);
               attached under their own names — alias beforehand if they
               collide with left columns.
    strict     exclude right rows at exactly the same time (< instead of <=).
    tolerance  max |left.on - right.on| (same units as ``on``); matches
               farther than this come back as nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != on]

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    r = right.select(*keys, F.col(on).alias("_t"), payload,
                     F.lit(0).alias("_side"))
    l = left.select("*", F.col(on).alias("_t"),
                    F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
                    F.lit(1).alias("_side"))
    # column-order-align the two sides for unionByName
    merged = l.unionByName(r, allowMissingColumns=True)

    asc = direction == "backward"
    # at equal _t the right row must sort BEFORE the left row so it is
    # visible to the window (inclusive join); strict mode reverses that
    side_first = F.col("_side").asc() if not strict else F.col("_side").desc()
    order = [F.col("_t").asc() if asc else F.col("_t").desc(), side_first]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # both carried values in ONE projection → a single Window node over the
    # shared (key-partitioned, time-sorted) frame
    matched = (merged
               .select("*",
                       F.last("_r", ignorenulls=True).over(w).alias("_m"),
                       F.last(F.when(F.col("_side") == 0, F.col("_t")),
                              ignorenulls=True).over(w).alias("_mt"))
               .filter(F.col("_side") == 1))
    if strict:
        # right rows at the same _t sorted after left → a match at equal
        # time can never be picked up; nothing more to do
        pass
    if tolerance is not None:
        in_tol = F.abs(F.col("_t") - F.col("_mt")) <= tolerance
        matched = (matched
                   .withColumn("_m", F.when(in_tol, F.col("_m")))
                   .withColumn("_mt", F.when(in_tol, F.col("_mt"))))
    out = matched.withColumn("_match_time", F.col("_mt"))
    for c in right_cols:
        out = out.withColumn(c, F.col("_m")[c])
    return out.drop("_r", "_side", "_t", "_m", "_mt")


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts",
           within_micros: "int | None" = None) -> DataFrame:
    """Ordered conversion funnel: for each user, the earliest time they
    complete step k AFTER having completed step k-1 (strictly ordered
    first-touch attribution).  ``within_micros`` additionally requires
    step k within that many microseconds of the user's step k-1 time
    (conversion-window semantics).  Returns one row per step:
    (step_idx 1-based, step, n_users) with n_users monotonically
    non-increasing down the funnel.

    Scale shape: one filtered aggregate per step, each keyed on the user
    (map-side partial min), chained by broadcast-joining the previous
    step's per-user completion time when it is dimension-sized, else a
    keyed join — never a window over the raw event stream, and each pass
    scans only that step's events (predicate pushed to the source).
    k steps → k keyed aggregates; state is O(users reaching the step)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = epoch_micros(events, ts_col)
    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("t"), us.alias("e"))
    prev = None          # DataFrame (u, reach_k) — per-user completion time
    out_rows = []
    for idx, step in enumerate(steps, start=1):
        mine = ev.filter(F.col("t") == step)
        if prev is None:
            reach = mine.groupBy("u").agg(F.min("e").alias("r"))
        else:
            cond = F.col("e") >= F.col("r_prev")
            if within_micros is not None:
                cond = cond & (F.col("e") <= F.col("r_prev")
                               + F.lit(int(within_micros)))
            reach = (mine.join(prev, "u")
                     .filter(cond)
                     .groupBy("u").agg(F.min("e").alias("r")))
        # each reach table feeds BOTH its count row and the next step's
        # join; a LAZY checkpoint materializes it once per action and
        # truncates lineage, so step k doesn't re-scan steps 1..k-1
        # (k steps → k source scans, not k(k+1)/2) while query
        # construction stays job-free.  Strategy (executor-local vs
        # reliable-dir, for lossy clusters) per session conf — ckpt.py.
        from .ckpt import materialize
        reach = materialize(reach, eager=False, coalesce=False)
        prev = reach.select("u", F.col("r").alias("r_prev"))
        out_rows.append(reach.agg(
            F.lit(idx).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("n_users")))
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionByName(r)
    return res


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_seconds: int = 86400) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the bucket of their
    FIRST event; each later active bucket contributes to that cohort's
    retention curve.  Returns (cohort_bucket, bucket_offset, n_active)
    with bucket epochs in whole ``bucket_seconds`` units — all-integer
    arithmetic, engine-exact.

    Scale shape: one per-user min aggregate (the cohort assignment,
    user-keyed shuffle), one distinct over (user, bucket) fused with the
    join back, one final count keyed on the (cohort, offset) pair —
    state bounded by users + active (user, bucket) pairs, never raw
    events."""
    from .windows import epoch_seconds
    es = epoch_seconds(events, ts_col)
    b = (es - es % bucket_seconds) / bucket_seconds
    ev = events.select(F.col(user_col).alias("u"),
                       b.cast("long").alias("b")).distinct()
    first = ev.groupBy("u").agg(F.min("b").alias("cohort"))
    return (ev.join(first, "u")
            .groupBy(F.col("cohort").alias("cohort_bucket"),
                     (F.col("b") - F.col("cohort")).alias("bucket_offset"))
            .agg(F.count("*").cast("long").alias("n_active")))
