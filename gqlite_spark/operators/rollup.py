"""Incremental time-bucket rollup — the continuous-aggregate lifecycle.

A 100 TB event history answers "per-hour revenue by type" the same way
every day; recomputing it from raw events re-reads the whole table.
This module maintains the rollup INCREMENTALLY, the at-rest analogue of
a TimescaleDB continuous aggregate / materialized windowed view:

- ``save_rollup`` aggregates the initial history ONCE into mergeable
  per-bucket partials (count / sum / min / max per metric) and writes
  them with a sidecar spec;
- ``append_rollup`` folds a new ingest batch in by aggregating ONLY the
  batch (one scan of the new data), unioning with the existing partial
  rows — a table of buckets, not events, typically millions of times
  smaller than the history — and re-aggregating.  Late events just land
  in their (old) bucket: partials merge associatively, so arrival order
  is irrelevant;
- ``read_rollup`` serves the finished view (avg derived as sum/count).

The write is rewrite-then-swap via two FS renames (same recovery
contract as :func:`gqlite_spark.sources.clustered.recluster`): a crash
leaves either the old or the new COMPLETE rollup, never a mix.

Only MERGEABLE aggregates are accepted — count, sum, min, max (avg
derives from sum/count).  Non-mergeable aggregates (exact distinct,
median) are rejected up front: maintaining them incrementally requires
a sketch (see ``stats.kmv_sketch`` for distinct) or a raw re-read, and
pretending otherwise silently corrupts the view.

Buckets are epoch-second starts (``floor(epoch / every) * every``,
bigint) — engine-portable, same convention as operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsio
from .windows import epoch_seconds

SPEC_FILE = "_rollup_spec.json"
_MERGEABLE = ("sum", "min", "max")


def _partials(df: DataFrame, ts_col: str, every: int,
              dims: "list[str]", metrics: "dict[str, list[str]]",
              ) -> DataFrame:
    """Per-(bucket, dims) mergeable partials of one batch of raw events:
    one shuffle, map-side combined."""
    bucket = ((epoch_seconds(df, ts_col) / every).cast("long")
              * every).alias("bucket_start")
    aggs = [F.count("*").alias("n")]
    for c, fns in metrics.items():
        for fn in fns:
            if fn not in _MERGEABLE:
                raise ValueError(
                    f"rollup metric {fn}({c}) is not mergeable; "
                    f"supported: {', '.join(_MERGEABLE)} (+ count, and "
                    "avg at read time via sum/count)")
            aggs.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
    return df.select(bucket, *dims, *metrics.keys()).groupBy(
        "bucket_start", *dims).agg(*aggs)


def _merge(parts: DataFrame, dims: "list[str]",
           metrics: "dict[str, list[str]]") -> DataFrame:
    """Re-aggregate unioned partial rows: sums and counts add, mins and
    maxes nest — the associativity that makes the lifecycle correct."""
    aggs = [F.sum("n").alias("n")]
    for c, fns in metrics.items():
        for fn in fns:
            combine = F.sum if fn == "sum" else getattr(F, fn)
            aggs.append(combine(f"{fn}_{c}").alias(f"{fn}_{c}"))
    return parts.groupBy("bucket_start", *dims).agg(*aggs)


def save_rollup(df: DataFrame, path: str, ts_col: str, every: int,
                dims: "list[str] | None" = None,
                metrics: "dict[str, list[str]] | None" = None) -> None:
    """Aggregate the full history once and write the rollup + spec."""
    dims = list(dims or [])
    metrics = dict(metrics or {})
    spark = df.sparkSession
    _partials(df, ts_col, every, dims, metrics).write.mode(
        "overwrite").parquet(path)
    fsio.write_json(spark, fsio.join(path, SPEC_FILE), {
        "ts_col": ts_col, "every": int(every), "dims": dims,
        "metrics": metrics, "batches": 0})


def append_rollup(batch: DataFrame, path: str) -> None:
    """Fold one ingest batch into the rollup: scan ONLY the batch,
    merge with the existing partial rows, swap atomically.  Idempotence
    is the caller's contract (replaying a batch double-counts — pair
    with exactly-once ingest or dedup the batch first)."""
    spark = batch.sparkSession
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    dims, metrics = spec["dims"], spec["metrics"]
    new = _partials(batch, spec["ts_col"], int(spec["every"]),
                    dims, metrics)
    old = spark.read.parquet(path)
    merged = _merge(old.unionByName(new), dims, metrics)

    tmp = path.rstrip("/") + ".rollup_tmp"
    bak = path.rstrip("/") + ".rollup_old"
    fsio.delete(spark, tmp)
    fsio.delete(spark, bak)
    merged.write.parquet(tmp)
    spec["batches"] = int(spec.get("batches", 0)) + 1
    fsio.write_json(spark, fsio.join(tmp, SPEC_FILE), spec)
    fsio.rename(spark, path, bak)
    fsio.rename(spark, tmp, path)
    fsio.delete(spark, bak)


def read_rollup(spark: SparkSession, path: str,
                avg_of: "list[str] | None" = None) -> DataFrame:
    """The finished view.  ``avg_of`` derives ``avg_<c>`` = sum/count
    for metrics whose sum is maintained."""
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    df = spark.read.parquet(path)
    for c in avg_of or []:
        if f"sum_{c}" not in df.columns:
            raise ValueError(f"avg_of '{c}' needs sum in the rollup "
                             f"metrics (have: {spec['metrics']})")
        df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n"))
    return df
