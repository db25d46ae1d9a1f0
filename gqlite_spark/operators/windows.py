"""Event-time window aggregations over the ``events`` table — batch
DataFrame forms (the Structured Streaming forms live in
gqlite_spark.streaming; these batch analogs are the oracle-checkable
semantics: same windows, same aggregates).

No streaming exists in the reference (SURVEY §2.10) — this is the
beyond-reference capability layer.  All outputs use epoch-second window
starts (bigint) so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_seconds(df: DataFrame, ts_col: str):
    """Event time as epoch seconds (bigint) from a TimestampType /
    TimestampNTZType column (events.ts is parquet TIMESTAMP(MICROS) →
    NTZ; the cast makes unix_timestamp legal on it, TZ=UTC assumed) or a
    long-nanoseconds column (parquet TIMESTAMP(NANOS) read with
    spark.sql.legacy.parquet.nanosAsLong)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"{ts_col} div 1000000000")
    return F.unix_timestamp(F.col(ts_col).cast("timestamp"))


def tumbling(df: DataFrame, ts_col: str = "ts", every: str = "hour",
             keys: list[str] | None = None) -> DataFrame:
    """Tumbling window aggregation: (window_start, *keys, n_events,
    sum_value, avg_value)."""
    keys = keys or []
    step = {"hour": 3600, "day": 86400, "minute": 60}[every]
    es = epoch_seconds(df, ts_col)
    win = ((es - es % step)).alias("window_start")
    return (df.groupBy(win, *keys)
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.round(F.avg("value"), 4).alias("avg_value")))


def sliding(df: DataFrame, ts_col: str = "ts",
            width_hours: int = 2, slide_hours: int = 1) -> DataFrame:
    """Sliding windows (width 2h, slide 1h by default): each event lands in
    width/slide windows — expressed as an explode over window starts, the
    batch-equivalent of Structured Streaming's ``window()``."""
    slide_s = slide_hours * 3600
    width_s = width_hours * 3600
    ev = df.withColumn("_es", epoch_seconds(df, ts_col))
    n = width_s // slide_s
    starts = F.array(*[
        (F.floor(F.col("_es") / slide_s) - i) * slide_s for i in range(n)])
    return (ev.withColumn("window_start", F.explode(starts))
            .filter((F.col("_es") >= F.col("window_start")) &
                    (F.col("_es") < F.col("window_start") + width_s))
            .groupBy("window_start")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def sessionize(df: DataFrame, ts_col: str = "ts", user_col: str = "user_id",
               gap_minutes: int = 30) -> DataFrame:
    """Session windows per user with a max-gap rule (gaps-and-islands):
    a session breaks when consecutive events are > gap apart.
    Returns (user_id, session_start, n_events, duration_s).

    One shuffle on user_id (window function), then the session groupBy
    reuses the same partitioning — AQE keeps this a two-stage plan.
    """
    gap_s = gap_minutes * 60
    es = epoch_seconds(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(es, "event_id")
    ev = (df.withColumn("_es", es)
          .withColumn("_prev", F.lag("_es").over(w))
          .withColumn("_new", F.when(
              F.col("_prev").isNull() |
              (F.col("_es") - F.col("_prev") > gap_s), 1).otherwise(0))
          .withColumn("_sess", F.sum("_new").over(
              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (ev.groupBy(user_col, "_sess")
            .agg(F.min("_es").alias("session_start"),
                 F.count("*").alias("n_events"),
                 (F.max("_es") - F.min("_es")).alias("duration_s"))
            .select(user_col, "session_start", "n_events", "duration_s"))


def interval_join(df: DataFrame, trigger_type: str = "click",
                  effect_type: str = "purchase",
                  interval_seconds: int = 3600, ts_col: str = "ts",
                  user_col: str = "user_id") -> DataFrame:
    """Event-time interval (range) join: every ``effect_type`` event within
    ``interval_seconds`` AFTER a ``trigger_type`` event by the same user
    (classic attribution join).  Returns (user_id, trigger_id, effect_id,
    trigger_es, effect_es, lag_s).

    Batch twin of streaming.events.interval_join_stream — identical
    semantics by construction, oracle-checkable here.  The equality key
    (user) drives the shuffle; the range condition is a post-join filter,
    so the plan is a plain hash join on user_id — no cartesian stage.
    """
    es = epoch_seconds(df, ts_col)
    base = df.select(F.col(user_col).alias("user_id"),
                     F.col("event_id"), F.col("event_type"),
                     es.alias("es"))
    trig = (base.where(F.col("event_type") == trigger_type)
            .select("user_id", F.col("event_id").alias("trigger_id"),
                    F.col("es").alias("trigger_es")))
    eff = (base.where(F.col("event_type") == effect_type)
           .select(F.col("user_id").alias("e_user"),
                   F.col("event_id").alias("effect_id"),
                   F.col("es").alias("effect_es")))
    return (trig.join(eff, (F.col("user_id") == F.col("e_user")) &
                      (F.col("effect_es") >= F.col("trigger_es")) &
                      (F.col("effect_es") <= F.col("trigger_es")
                       + F.lit(interval_seconds)))
            .select("user_id", "trigger_id", "effect_id",
                    "trigger_es", "effect_es",
                    (F.col("effect_es") - F.col("trigger_es"))
                    .alias("lag_s")))
