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
leaves either the old or the new COMPLETE rollup, never a mix — a
crash BETWEEN the renames parks the old table at ``path.rollup_old``,
and every entry point heals that back into place on its next touch.
With ``epoch_id`` (recorded in the sidecar that swaps atomically with
the data) replayed batches are detected and skipped, so streaming
ingestion via foreachBatch is exactly-once end-to-end.

Only MERGEABLE aggregates are accepted — count, sum, min, max (avg
derives from sum/non-null-count), plus the three bounded sketches that
merge associatively: ``kmv`` (per-bucket distinct estimate, see
``stats.kmv_sketch``), ``hist`` (per-bucket bin counts →
``rollup_quantiles``) and ``cms`` (per-bucket count-min counters →
``rollup_keycounts``).  Truly non-mergeable aggregates (exact
distinct, exact median) are rejected up front: pretending otherwise
silently corrupts the view.

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


def _bucket(df: DataFrame, ts_col: str, every: int):
    # F.floor, not cast('long'): the cast truncates toward zero, which
    # would collapse pre-1970 timestamps into the wrong (later) bucket
    return (F.floor(epoch_seconds(df, ts_col) / every)
            * every).cast("long").alias("bucket_start")


def _partials(df: DataFrame, ts_col: str, every: int,
              dims: "list[str]", metrics: "dict[str, list[str]]",
              kmv_k: int = 256,
              hist_params: "dict | None" = None,
              cms_params: "dict | None" = None) -> DataFrame:
    """Per-(bucket, dims) mergeable partials of one batch of raw events:
    one map-side-combined shuffle for the scalar aggregates, plus one
    bounded pass per sketch metric — ``kmv`` (per-bucket KMV distinct
    sketch, sorted ≤kmv_k-element array), ``hist`` (per-bucket sparse
    bin-count map over the fixed (lo, hi, bins) binning from
    ``hist_params[col]``) and ``cms`` (per-bucket count-min counter
    map over the fixed (d, w) from ``cms_params[col]``, keyed
    row·w+slot — same map lattice as hist, so it merges through the
    identical bin-wise sum)."""
    bucket = _bucket(df, ts_col, every)
    hist_params = hist_params or {}
    cms_params = cms_params or {}
    scalar_cols = []
    sketch = []  # (kind, col)
    aggs = [F.count("*").alias("n")]
    for c, fns in metrics.items():
        for fn in fns:
            if fn == "kmv":
                sketch.append(("kmv", c))
                continue
            if fn == "hist":
                if c not in hist_params:
                    raise ValueError(
                        f"rollup metric hist({c}) needs hist_params"
                        f"[{c!r}] = (lo, hi, bins)")
                sketch.append(("hist", c))
                continue
            if fn == "cms":
                if c not in cms_params:
                    raise ValueError(
                        f"rollup metric cms({c}) needs cms_params"
                        f"[{c!r}] = (d, w)")
                sketch.append(("cms", c))
                continue
            if fn not in _MERGEABLE:
                raise ValueError(
                    f"rollup metric {fn}({c}) is not mergeable; "
                    f"supported: {', '.join(_MERGEABLE)}, kmv "
                    "(distinct sketch), hist (bin-count sketch), cms "
                    "(per-key count sketch; "
                    "+ count always, avg at read time via sum/count)")
            scalar_cols.append(c)
            aggs.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
        if "sum" in fns:
            # non-null count rides along so the read-time average has
            # SQL AVG semantics (sum ignores nulls; count(*) must not
            # be its denominator)
            aggs.append(F.count(c).alias(f"cnt_{c}"))
    out = df.select(bucket, *dims, *set(scalar_cols)).groupBy(
        "bucket_start", *dims).agg(*aggs)
    from .stats import (_eq_nullsafe, _kmv_hash, _min_k, cms_sketch,
                        hist_sketch)
    for kind, c in sketch:
        if kind == "kmv":
            hashed = (df.select(bucket, *dims,
                                _kmv_hash(F.col(c)).alias("h"))
                      .filter(F.col("h").isNotNull()))
            topk = _min_k(hashed, kmv_k, ["bucket_start"] + dims)
            arr = (topk.groupBy("bucket_start", *dims)
                   .agg(F.array_sort(F.collect_list("h"))
                        .alias(f"kmv_{c}")))
            name, empty = f"kmv_{c}", F.array().cast("array<long>")
        elif kind == "cms":
            dd, ww = cms_params[c]
            counted = cms_sketch(df.select(bucket, *dims, c), c,
                                 int(dd), int(ww),
                                 by=["bucket_start"] + dims)
            key = (F.col("row").cast("bigint") * int(ww)
                   + F.col("slot")).alias("k")
            arr = (counted.groupBy("bucket_start", *dims)
                   .agg(F.map_from_entries(
                        F.collect_list(F.struct(key, F.col("n"))))
                        .alias(f"cms_{c}")))
            name, empty = (f"cms_{c}",
                           F.create_map().cast("map<bigint,bigint>"))
        else:
            lo, hi, bins = hist_params[c]
            binned = hist_sketch(df.select(bucket, *dims, c), c,
                                 lo, hi, int(bins),
                                 by=["bucket_start"] + dims)
            arr = (binned.groupBy("bucket_start", *dims)
                   .agg(F.map_from_entries(
                        F.collect_list(F.struct("bin", "n")))
                        .alias(f"hist_{c}")))
            name, empty = (f"hist_{c}",
                           F.create_map().cast("map<bigint,bigint>"))
        # null-safe join: a NULL dim value is a real group and must
        # keep its sketch (a key-list join would drop it to empty)
        out = (out.join(arr,
                        _eq_nullsafe(out, arr, ["bucket_start"] + dims),
                        "left")
               .select(*[out[x] for x in out.columns],
                       F.coalesce(arr[name], empty).alias(name)))
    return out


def _merge(parts: DataFrame, dims: "list[str]",
           metrics: "dict[str, list[str]]",
           kmv_k: int = 256) -> DataFrame:
    """Re-aggregate unioned partial rows: sums and counts add, mins and
    maxes nest, KMV arrays union-dedup-retopk — the associativity that
    makes the lifecycle correct.  Each (bucket, dims) sees a handful of
    ≤kmv_k arrays, so the sketch merge is bounded per group."""
    aggs = [F.sum("n").alias("n")]
    for c, fns in metrics.items():
        for fn in fns:
            if fn == "kmv":
                aggs.append(
                    F.slice(F.array_sort(F.array_distinct(
                        F.flatten(F.collect_list(f"kmv_{c}")))),
                        1, kmv_k).alias(f"kmv_{c}"))
                continue
            if fn in ("hist", "cms"):
                # bin-wise / counter-wise sum over the handful of
                # partial maps — the identical merge lattice
                aggs.append(F.aggregate(
                    F.collect_list(f"{fn}_{c}"),
                    F.create_map().cast("map<bigint,bigint>"),
                    lambda acc, m: F.map_zip_with(
                        acc, m,
                        lambda k, a, b: (F.coalesce(a, F.lit(0))
                                         + F.coalesce(b, F.lit(0)))),
                ).alias(f"{fn}_{c}"))
                continue
            combine = F.sum if fn == "sum" else getattr(F, fn)
            aggs.append(combine(f"{fn}_{c}").alias(f"{fn}_{c}"))
        if "sum" in fns:
            aggs.append(F.sum(f"cnt_{c}").alias(f"cnt_{c}"))
    return parts.groupBy("bucket_start", *dims).agg(*aggs)


def save_rollup(df: DataFrame, path: str, ts_col: str, every: int,
                dims: "list[str] | None" = None,
                metrics: "dict[str, list[str]] | None" = None,
                kmv_k: int = 256,
                hist_params: "dict | None" = None,
                cms_params: "dict | None" = None) -> None:
    """Aggregate the full history once and write the rollup + spec.
    Metric functions: sum/min/max (scalar), plus three sketches that
    merge through the same lifecycle — ``kmv`` (per-bucket distinct,
    served by :func:`read_rollup` as ``distinct_<col>``, exact below
    kmv_k), ``hist`` (per-bucket bin counts over the fixed
    ``hist_params[col] = (lo, hi, bins)`` binning; quantiles served by
    :func:`rollup_quantiles`) and ``cms`` (per-bucket count-min
    counters over the fixed ``cms_params[col] = (d, w)``; per-key
    count estimates served by :func:`rollup_keycounts`) — all without
    rescanning any history."""
    dims = list(dims or [])
    metrics = dict(metrics or {})
    hist_params = {c: [float(v[0]), float(v[1]), int(v[2])]
                   for c, v in (hist_params or {}).items()}
    cms_params = {c: [int(v[0]), int(v[1])]
                  for c, v in (cms_params or {}).items()}
    for fn, params in (("hist", hist_params), ("cms", cms_params)):
        orphans = [c for c in params
                   if fn not in (metrics.get(c) or [])]
        if orphans:
            raise ValueError(
                f"{fn}_params given for {orphans} but their metrics "
                f"lists lack '{fn}' — add it (or drop the params); an "
                "unused param would only fail later, at read time")
    spark = df.sparkSession
    _partials(df, ts_col, every, dims, metrics, kmv_k,
              hist_params, cms_params).write.mode("overwrite") \
        .parquet(path)
    fsio.write_json(spark, fsio.join(path, SPEC_FILE), {
        "ts_col": ts_col, "every": int(every), "dims": dims,
        "metrics": metrics, "kmv_k": int(kmv_k),
        "hist_params": hist_params, "cms_params": cms_params,
        "batches": 0})


def _heal(spark, path: str) -> None:
    """Torn-swap recovery (shared contract: fsio.heal_swap)."""
    fsio.heal_swap(spark, path, "rollup")


def append_rollup(batch: DataFrame, path: str,
                  epoch_id: "int | None" = None) -> bool:
    """Fold one ingest batch into the rollup: scan ONLY the batch,
    merge with the existing partial rows, swap atomically.

    ``epoch_id`` makes replays idempotent: the id is recorded in the
    spec sidecar that swaps atomically WITH the bucket table, so a
    batch re-delivered with an id ≤ the recorded one is skipped
    (returns False) instead of double-counted.  Ids must be monotonic
    per rollup — Structured Streaming's foreachBatch batch_id under a
    checkpointLocation is exactly that (see streaming.stream_rollup).
    Without ``epoch_id``, exactly-once is the caller's contract.

    SINGLE WRITER per rollup path: the swap is guarded by an atomic
    FS lease (``<path>.rollup_lock``), so a second concurrent appender
    raises :class:`gqlite_spark.fsio.ConcurrentWriterError` cleanly —
    point at most one stream/appender at a rollup path.  Readers are
    unaffected."""
    spark = batch.sparkSession
    _heal(spark, path)
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    if epoch_id is not None and spec.get("last_epoch") is not None \
            and epoch_id <= int(spec["last_epoch"]):
        return False
    dims, metrics = spec["dims"], spec["metrics"]
    kmv_k = int(spec.get("kmv_k", 256))
    hist_params = {c: tuple(v) for c, v in
                   (spec.get("hist_params") or {}).items()}
    cms_params = {c: tuple(v) for c, v in
                  (spec.get("cms_params") or {}).items()}
    new = _partials(batch, spec["ts_col"], int(spec["every"]),
                    dims, metrics, kmv_k, hist_params, cms_params)
    old = spark.read.parquet(path)
    merged = _merge(old.unionByName(new), dims, metrics, kmv_k)

    spec["batches"] = int(spec.get("batches", 0)) + 1
    if epoch_id is not None:
        spec["last_epoch"] = int(epoch_id)

    def _write(tmp: str) -> None:
        merged.write.parquet(tmp)
        fsio.write_json(spark, fsio.join(tmp, SPEC_FILE), spec)

    fsio.swap_in(spark, path, "rollup", _write)
    return True


def read_rollup(spark: SparkSession, path: str,
                avg_of: "list[str] | None" = None) -> DataFrame:
    """The finished view.  ``avg_of`` derives ``avg_<c>`` = sum/count
    for metrics whose sum is maintained; every ``kmv`` metric gets a
    ``distinct_<c>`` estimate column (exact below kmv_k, else the KMV
    estimator over the stored sketch array)."""
    _heal(spark, path)
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    df = spark.read.parquet(path)
    for c in avg_of or []:
        if f"sum_{c}" not in df.columns:
            raise ValueError(f"avg_of '{c}' needs sum in the rollup "
                             f"metrics (have: {spec['metrics']})")
        # sum/cnt (non-null count), not sum/n: SQL AVG semantics when
        # the metric column has nulls
        denom = (F.col(f"cnt_{c}") if f"cnt_{c}" in df.columns
                 else F.col("n"))
        df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / denom)
    kmv_k = int(spec.get("kmv_k", 256))
    from .stats import KMV_HASH_SPACE
    for c, fns in (spec.get("metrics") or {}).items():
        if "kmv" in fns and f"kmv_{c}" in df.columns:
            arr = F.col(f"kmv_{c}")
            est = F.when(
                F.size(arr) < kmv_k, F.size(arr).cast("double")
            ).otherwise(F.lit(float(kmv_k - 1)) * F.lit(KMV_HASH_SPACE)
                        / F.element_at(arr, kmv_k))
            df = df.withColumn(
                f"distinct_{c}",
                F.floor(est + F.lit(0.5)).cast("long"))
    return df


def coarsen_rollup(spark: SparkSession, path: str, out_path: str,
                   every: int) -> None:
    """Derive a coarser rollup (hour → day → month) from a finer one —
    no history scan: buckets re-label onto the coarser grid and the
    partials re-merge, which is EXACT for every supported metric
    (sums/counts add, min/max nest, kmv arrays re-topk, hist maps
    bin-wise-sum — the binning is bucket-independent).  The classic
    hierarchical continuous-aggregate cascade: keep hours hot, roll
    them into days/months whose cost is the bucket table, not the
    events."""
    if out_path.rstrip("/") == path.rstrip("/"):
        # the coarse write would truncate the same directory the lazy
        # source read streams from (data loss or job failure) — and a
        # rollup can't be coarsened in place anyway (the fine buckets
        # are its contents)
        raise ValueError(
            f"coarsen_rollup out_path must differ from the source path "
            f"({path!r}); write the coarser grid to its own table")
    _heal(spark, path)
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    fine = int(spec["every"])
    if every % fine != 0 or every <= fine:
        raise ValueError(
            f"coarsen_rollup needs a multiple of the source bucket "
            f"size (source every={fine}, requested {every})")
    df = spark.read.parquet(path).withColumn(
        "bucket_start",
        (F.floor(F.col("bucket_start") / every) * every).cast("long"))
    merged = _merge(df, list(spec["dims"]), spec["metrics"],
                    int(spec.get("kmv_k", 256)))
    out_spec = dict(spec)
    out_spec["every"] = int(every)
    out_spec.pop("last_epoch", None)  # epoch ids belong to the source

    def _write(tmp: str) -> None:
        merged.write.parquet(tmp)
        fsio.write_json(spark, fsio.join(tmp, SPEC_FILE), out_spec)

    if fsio.exists(spark, out_path):
        # refresh an existing coarse table under the same crash
        # contract as append_rollup: rewrite-then-swap, never a mix
        fsio.swap_in(spark, out_path, "rollup", _write)
    else:
        tmp = out_path.rstrip("/") + ".rollup_tmp"
        fsio.delete(spark, tmp)
        _write(tmp)
        fsio.rename(spark, tmp, out_path)


def rollup_keycounts(spark: SparkSession, path: str, col: str,
                     keys: "list") -> DataFrame:
    """Per-(bucket, dims) count-min ESTIMATES of the given literal
    ``keys`` of a ``cms`` metric, from the stored counter maps alone —
    (bucket_start, dims..., key, count_est).  The per-hour "how often
    did THIS user/domain appear" report, incrementally maintained:
    estimates never undercount, overcount bounded by eN/w per row
    (stats.cms_sketch).  A key a bucket never saw estimates 0 unless
    it collides on all d rows; buckets whose metric column was
    all-NULL (empty map) report 0 too — the true count.  The probe is
    (buckets x dims x keys x d) rows — rollup-sized, never
    event-sized."""
    from .stats import _cms_slot, _eq_nullsafe
    _heal(spark, path)
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    cp = (spec.get("cms_params") or {}).get(col)
    if cp is None:
        raise ValueError(f"rollup has no cms metric for '{col}' "
                         f"(cms_params: {spec.get('cms_params')})")
    d, w = int(cp[0]), int(cp[1])
    dims = list(spec["dims"])
    stored = spark.read.parquet(path)
    counters = stored.select(
        "bucket_start", *dims,
        F.explode(F.col(f"cms_{col}")).alias("k", "n"))
    kdf = spark.createDataFrame([(k,) for k in keys], ["key"])
    probe = kdf.select(
        "key",
        F.posexplode(F.array(*[
            (F.lit(i) * w + _cms_slot(F.col("key"), i, w))
            .cast("bigint") for i in range(d)])).alias("_i", "k"))
    groups = stored.select("bucket_start", *dims)
    combos = groups.crossJoin(probe)
    joined = combos.join(
        counters,
        _eq_nullsafe(combos, counters,
                     ["bucket_start"] + dims) & (combos["k"]
                                                 == counters["k"]),
        "left")
    return (joined.groupBy(*[combos[c] for c in
                             ["bucket_start"] + dims], combos["key"])
            .agg(F.min(F.coalesce(counters["n"], F.lit(0)))
                 .alias("count_est")))


def rollup_quantiles(spark: SparkSession, path: str, col: str,
                     qs: "list[float]") -> DataFrame:
    """Per-(bucket, dims) quantiles of a ``hist`` metric from the
    stored bin maps — (bucket_start, dims..., q, value) with error ≤
    one bin width, computed from the rollup alone (no history scan).
    The per-hour p99 latency report, incrementally maintained.  A
    group whose metric column was all-NULL (empty bin map) appears
    with value NULL rather than being silently dropped."""
    from .stats import _eq_nullsafe, hist_quantiles
    _heal(spark, path)
    spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
    hp = (spec.get("hist_params") or {}).get(col)
    if hp is None:
        raise ValueError(f"rollup has no hist metric for '{col}' "
                         f"(hist_params: {spec.get('hist_params')})")
    lo, hi, bins = float(hp[0]), float(hp[1]), int(hp[2])
    dims = list(spec["dims"])
    stored = spark.read.parquet(path)
    rows = stored.select(
        "bucket_start", *dims,
        F.explode(F.col(f"hist_{col}")).alias("bin", "n"))
    got = hist_quantiles(rows, qs, lo, hi, bins,
                         by=["bucket_start"] + dims)
    # explode over an empty map emits nothing — reinstate those
    # groups with value NULL so the report covers every bucket
    want = None
    for q in qs:
        part = stored.select("bucket_start", *dims,
                             F.lit(float(q)).alias("q"))
        want = part if want is None else want.unionByName(part)
    missing = (want.join(got, _eq_nullsafe(want, got,
                                           ["bucket_start"] + dims
                                           + ["q"]), "left_anti")
               .withColumn("value", F.lit(None).cast("double")))
    return got.unionByName(missing)
