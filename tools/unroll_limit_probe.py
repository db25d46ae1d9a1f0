"""Sweep the unrolled-vs-HOF vector kernel tradeoff (NEGATIVE RESULT).

Self-contained companion to tools/dot_kernel_probe.py: sweeps (a)
single-pair cosine by dim and (b) the struct-min IVF assignment by
nlist x 64d, comparing the higher-order-function (aggregate/zip_with)
form against an unrolled element_at chain, and flagging codegen compile
failures (probed strictly via spark.sql.codegen.fallback=false, where a
Janino failure RAISES instead of silently falling back to interpreted).

Measured on this box (local[16], 200k rows, min of 2 warm runs):

    == single-pair cosine: lambda vs unrolled, by dim ==
    dim=  32 folds=   96 lambda=0.41s unrolled=0.38s compiles=True
    dim=  64 folds=  192 lambda=0.45s unrolled=0.58s compiles=True
    dim= 128 folds=  384 lambda=0.67s unrolled=1.17s compiles=True
    dim= 256 folds=  768 lambda=1.34s unrolled=2.66s compiles=False
    dim= 512 folds= 1536 lambda=2.34s unrolled=6.72s compiles=False
    == IVF struct-min assignment: HOF vs unrolled, nlist x 64d ==
    nlist=  4 folds=  256 hof=0.56s unrolled= 0.75s compiles=True
    nlist=  8 folds=  512 hof=1.14s unrolled= 1.39s compiles=True
    nlist= 16 folds= 1024 hof=1.68s unrolled= 2.96s compiles=False
    nlist= 32 folds= 2048 hof=3.42s unrolled= 6.04s compiles=False
    nlist= 64 folds= 4096 hof=7.39s unrolled=17.25s compiles=False

Conclusions (why gqlite_spark keeps aggregate/zip_with everywhere):
- the HOF form wins at EVERY size, even where the unrolled form
  compiles (Spark 4.1's HOF evaluator + the ANSI bounds-check cost of
  each element_at make unrolling a constant-factor LOSS);
- past ~512 total folds the generated method exceeds Janino's 64 KB
  limit -> the WHOLE stage drops to interpreted execution;
- shapes referencing the unrolled tree twice (e.g.
  array_position(dots, array_max(dots))) OOM a 2 GB driver in analysis.

Run:  python tools/unroll_limit_probe.py [n_rows]
"""
import random
import sys
import time

from pyspark.sql import SparkSession, functions as F


def _f17(x: float) -> str:
    return f"cast({float(x)!r} as double)"


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot_u(a, b, dim):
    s = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return s


def _norm2_u(v, dim):
    s = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.element_at(v, i)
        s = s + x * x
    return s


def _d2_sql_u(vec_sql: str, vals) -> str:
    terms = " + ".join(
        f"(element_at({vec_sql}, {i}) - {_f17(x)})"
        f" * (element_at({vec_sql}, {i}) - {_f17(x)})"
        for i, x in enumerate(vals, start=1))
    return f"(cast(0.0 as double) + {terms})"


def _d2_sql_hof(vec_sql: str, vals) -> str:
    return (f"aggregate(zip_with({vec_sql}, "
            "array(" + ", ".join(_f17(x) for x in vals) + "), "
            "(a, b) -> (a - b) * (a - b)), "
            "cast(0.0 as double), (acc, x) -> acc + x)")


def _assign_sql(cents, vec_col, unroll: bool) -> str:
    vsql = f"cast({vec_col} as array<double>)"
    d2 = _d2_sql_u if unroll else _d2_sql_hof
    structs = ", ".join(
        f"named_struct('d', {d2(vsql, cv)}, 'c', {int(cid)}L)"
        for cid, cv in cents)
    return f"array_min(array({structs})).c"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "6g")
             .appName("unroll_limit_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def mkvecs(dim):
        def mk(salt):
            return F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.pmod(F.xxhash64(F.col("id") * salt + i),
                                  F.lit(1000))
                           .cast("double") / 500.0 - 1.0))
        d = (spark.range(n)
             .select("id", mk(3).alias("v"), mk(7).alias("qv")).persist())
        d.count()
        return d

    def timed(df, col, strict):
        spark.conf.set("spark.sql.codegen.fallback", str(not strict).lower())
        try:
            t0 = time.time()
            df.select(F.sum(col).alias("s")).collect()
            return time.time() - t0, True
        except Exception:
            return float("nan"), False
        finally:
            spark.conf.set("spark.sql.codegen.fallback", "true")

    print("== single-pair cosine: lambda vs unrolled, by dim ==")
    for dim in (32, 64, 128, 256, 512):
        d = mkvecs(dim)
        lam = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v"))
                                               * _norm(F.col("qv")))
        unr = (_dot_u(F.col("v"), F.col("qv"), dim)
               / (F.sqrt(_norm2_u(F.col("v"), dim))
                  * F.sqrt(_norm2_u(F.col("qv"), dim))))
        _, compiled = timed(d.limit(1000), unr, strict=True)
        tl = min(timed(d, lam, False)[0], timed(d, lam, False)[0])
        tu = min(timed(d, unr, False)[0], timed(d, unr, False)[0])
        print(f"dim={dim:4d} folds={3*dim:5d} lambda={tl:6.2f}s "
              f"unrolled={tu:6.2f}s compiles={compiled}", flush=True)
        d.unpersist()

    print("== IVF struct-min assignment: HOF vs unrolled, nlist x 64d ==")
    rng = random.Random(7)
    for nlist in (4, 8, 16, 32, 64):
        dim = 64
        d = mkvecs(dim)
        cents = [(i, [rng.uniform(-1, 1) for _ in range(dim)])
                 for i in range(nlist)]
        unr = F.expr(_assign_sql(cents, "v", True)).cast("double")
        hof = F.expr(_assign_sql(cents, "v", False)).cast("double")
        _, compiled = timed(d.limit(1000), unr, strict=True)
        th = min(timed(d, hof, False)[0], timed(d, hof, False)[0])
        tu = min(timed(d, unr, False)[0], timed(d, unr, False)[0])
        print(f"nlist={nlist:4d} folds={nlist*dim:6d} hof={th:6.2f}s "
              f"unrolled={tu:6.2f}s compiles={compiled}", flush=True)
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
