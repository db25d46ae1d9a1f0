"""Sort-clustered (range / z-order) table layout — data skipping at rest.

The scan-side complement to :mod:`gqlite_spark.sources.bucketed` (which
co-locates JOIN keys): clustering sorts the data so that each parquet
file covers a NARROW range of the clustering columns, and every later
scan with a predicate on those columns skips the files (and row groups)
whose min/max stats can't match.  At 100 TB this is the first-order I/O
reducer for selective scans — a predicate touching 1 % of the key space
reads ~1 % of the files instead of all of them, with zero index
structures to maintain: the parquet footer stats ARE the index.  The
reference's analogue is its key-ordered mdbx tables, where a range read
walks only the matching B-tree slice (StorageEngine.cpp:132-181).

Two layouts, one writer:

- ``save_clustered(df, path, [col])`` — RANGE layout: global sort by
  one column (``repartitionByRange`` + ``sortWithinPartitions``).
  Perfect skipping on that column, none on any other.
- ``save_clustered(df, path, [a, b, ...])`` — Z-ORDER layout: each
  column is min/max-normalized into ``2**bits`` uniform bins and the
  bin bits are INTERLEAVED into one z-value; sorting by the z-value
  gives every clustering column locality, so predicates on ANY of them
  skip files.  The classic multi-dimensional tradeoff: per-column
  skipping is weaker than a dedicated single-column sort, but one
  layout serves all the columns' predicates.

Scale notes (100 TB):
- ``n_files`` is the skipping granularity: more files = finer skipping
  but more footer reads / task overhead.  Target file sizes of
  ~128 MB–1 GB (e.g. 100 TB / 262144 files ≈ 400 MB each).
- uniform binning (``width_bucket`` on min/max) keeps the z-value a
  pure scalar expression — zero extra shuffles, no sampling pass.
  Heavily SKEWED columns degrade bin balance (most rows land in few
  bins) and with it skip selectivity — rows per file stay balanced
  regardless (``repartitionByRange`` samples the z-value itself), the
  layout just skips less.  For skewed keys, pre-transform (e.g.
  ``log``) or use the range layout on the dominant column.
- the writer is one extra shuffle at write time, amortized over every
  later scan — the same pay-once economics as bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsio

SPEC_FILE = "_cluster_spec.json"

# bits per column in the z-value.  12 bits = 4096 bins per column is
# far finer than any realistic file count (skipping granularity is the
# FILE, so bins only need to outnumber files); 2 cols x 12 bits = a
# 24-bit z — small expressions, no 64-bit overflow risk up to 5 cols.
DEFAULT_BITS = 12


def zvalue_col(cols: "list[str]", ranges: "list[tuple]",
               bits: int = DEFAULT_BITS) -> Column:
    """The interleaved z-value as a pure scalar Column.

    Each column is binned uniformly over its ``(min, max)`` range into
    ``2**bits`` bins (``width_bucket`` — one built-in call), then bit i
    of column j lands at z-bit ``i * n_cols + j`` (highest bits first
    across columns, the standard Morton interleave).  Everything stays
    inside whole-stage codegen: ~``bits * n_cols`` small bitwise terms,
    no UDF, no shuffle."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"z-value would need {n * bits} bits; "
                         f"reduce bits (n_cols={n})")
    nbins = 2 ** bits
    bins = []
    for c, (lo, hi) in zip(cols, ranges):
        lo_f, hi_f = float(lo), float(hi)
        if hi_f <= lo_f:
            hi_f = lo_f + 1.0
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo_f),
                           F.lit(hi_f), F.lit(nbins))
        # width_bucket: 0 for < min, nbins+1 for > max -> clamp to
        # [1, nbins] then shift to [0, nbins-1]
        bins.append(F.greatest(F.least(b, F.lit(nbins)), F.lit(1))
                    - F.lit(1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bins):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, i * n + j)
    return z


def save_clustered(df: DataFrame, path: str, cols: "list[str]",
                   n_files: int = 16, bits: int = DEFAULT_BITS) -> None:
    """Write ``df`` to ``path`` clustered on ``cols``: range layout for
    one column, z-order for several.  One shuffle
    (``repartitionByRange`` with an EXPLICIT file count — AQE does not
    coalesce user-numbered repartitions, so n_files is honored), sorted
    within each file so row-group stats are narrow too.  Records the
    layout spec in a ``_cluster_spec.json`` fsio sidecar (cluster-
    portable) so pipelines can discover / re-cluster the table."""
    spark = df.sparkSession
    if len(cols) == 1:
        out = (df.repartitionByRange(n_files, F.col(cols[0]))
               .sortWithinPartitions(cols[0]))
        ranges = None
    else:
        from pyspark.sql import types as T
        for c in cols:
            if not isinstance(df.schema[c].dataType, T.NumericType):
                raise ValueError(
                    f"z-order clustering needs numeric columns; "
                    f"'{c}' is {df.schema[c].dataType.simpleString()} "
                    "(single-column range layout works for any "
                    "orderable type)")
        row = df.agg(*[f(F.col(c).cast("double")).alias(f"{w}_{c}")
                       for c in cols
                       for w, f in (("lo", F.min), ("hi", F.max))]
                     ).collect()[0]
        ranges = [(row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols]
        z = zvalue_col(cols, ranges, bits)
        out = (df.withColumn("_z", z)
               .repartitionByRange(n_files, F.col("_z"))
               .sortWithinPartitions("_z")
               .drop("_z"))
    out.write.mode("overwrite").parquet(path)
    fsio.write_json(spark, fsio.join(path, SPEC_FILE), {
        "cols": list(cols), "n_files": int(n_files), "bits": int(bits),
        "ranges": [[float(a), float(b)] for a, b in ranges]
        if ranges else None})


def file_stats(path: str, col: str) -> "list[tuple]":
    """Per-file (min, max) of ``col`` from the parquet footers — the
    exact metadata a scan's file/row-group skipping reads.  Local-path
    helper for tests and layout audits (production engines read footers
    through the FS; here pyarrow over the local files is enough)."""
    import glob
    import pyarrow.parquet as pq
    out = []
    for f in sorted(glob.glob(path.rstrip("/") + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            out.append((f, min(los), max(his)))
    return out


def overlap_fraction(stats: "list[tuple]", lo, hi) -> float:
    """Fraction of files whose [min, max] intersects [lo, hi] — i.e.
    the fraction a stats-pruned scan must READ.  1.0 = no skipping."""
    if not stats:
        return 1.0
    touch = sum(1 for _, mn, mx in stats if not (mx < lo or mn > hi))
    return touch / len(stats)


def append_clustered(df: DataFrame, path: str, n_files: int = 1,
                     epoch_id: "int | None" = None) -> bool:
    """Append a batch to a clustered table WITHOUT a full rewrite: the
    batch is sorted by the table's spec (z-values reuse the STORED bin
    ranges so old and new rows bin identically) and written as its own
    ``n_files`` file(s) — default 1, since an ingest batch is typically
    ≪ the table.  A single-file batch spans the whole key range at FILE
    granularity, but because it is sorted its ROW-GROUP stats stay
    narrow, so scans still skip within it; file-level skipping degrades
    gradually as batches accumulate — a predicate touches its slice of
    every batch — never catastrophically.  Audit the drift with
    :func:`overlap_fraction`; restore the write-time layout with
    :func:`recluster`.  This is the daily-ingest lifecycle at 100 TB:
    appends are cheap and sorted, re-clustering is a scheduled rewrite.

    ``epoch_id`` makes replays idempotent — the same
    :func:`fsio.guarded_append` protocol as ``append_bucketed``
    (single-writer fenced lease, torn-append marker repair, sidecar
    epoch commit); see ``streaming.stream_append_clustered`` for the
    exactly-once streaming twin.  Returns False on a skipped replay."""
    spark = df.sparkSession
    _heal(spark, path)

    def _write(spec):
        cols, bits = spec["cols"], int(spec.get("bits", DEFAULT_BITS))
        if len(cols) == 1:
            out = (df.repartitionByRange(n_files, F.col(cols[0]))
                   .sortWithinPartitions(cols[0]))
        else:
            ranges = [tuple(r) for r in spec["ranges"]]
            z = zvalue_col(cols, ranges, bits)
            out = (df.withColumn("_z", z)
                   .repartitionByRange(n_files, F.col("_z"))
                   .sortWithinPartitions("_z")
                   .drop("_z"))
        out.write.mode("append").parquet(path)

    return fsio.guarded_append(spark, path, "maintain", SPEC_FILE,
                               epoch_id, _write)


def _heal(spark, path: str) -> None:
    """Torn-swap recovery (shared contract: fsio.heal_swap)."""
    fsio.heal_swap(spark, path, "recluster", lock_kind="maintain")


def recluster(spark: SparkSession, path: str,
              n_files: "int | None" = None) -> None:
    """Rewrite the table freshly clustered per its sidecar spec —
    rewrite-then-swap: cluster into a ``<path>.recluster_tmp`` sibling,
    then two FS renames (old table out, new table in).  A crash mid-
    swap can leave ``path`` momentarily empty with the complete old
    table at ``path.recluster_old``; every lifecycle entry point heals
    that (renames it back), so the caller always sees either the old or
    the new COMPLETE table — never a partial mix.  Ranges are
    recomputed from current data (appends may have widened them).  Run
    after append batches drift the layout (:func:`overlap_fraction` on
    the clustering columns is the trigger metric)."""
    _heal(spark, path)

    def _write(tmp: str) -> None:
        # under the shared maintain lease: a torn APPEND must be
        # repaired before the rewrite reads the files (or its
        # uncommitted orphan files get absorbed into the new table and
        # the replayed batch then double-appends them), and the spec
        # must be read HERE — reading it before the lease could carry
        # a last_epoch that a just-committed append superseded
        fsio.repair_torn_append(spark, path, SPEC_FILE)
        spec = fsio.read_json(spark, fsio.join(path, SPEC_FILE))
        save_clustered(spark.read.parquet(path), tmp, spec["cols"],
                       n_files=int(n_files or spec["n_files"]),
                       bits=int(spec.get("bits", DEFAULT_BITS)))
        # the batch counter resets (files are fresh) but last_epoch is
        # CARRIED FORWARD — a recluster between streaming batches must
        # not reopen the exactly-once window
        if spec.get("last_epoch") is not None:
            fresh = fsio.read_json(spark, fsio.join(tmp, SPEC_FILE))
            fresh["last_epoch"] = int(spec["last_epoch"])
            fsio.write_json(spark, fsio.join(tmp, SPEC_FILE), fresh)

    fsio.swap_in(spark, path, "recluster", _write, lock_kind="maintain")
