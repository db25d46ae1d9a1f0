"""NEGATIVE RESULT record: unrolled element_at dot/cosine kernels LOSE
to the higher-order-function (aggregate/zip_with) form on Spark 4.1.

Hypothesis tested: HOFs are interpreted-per-element, so an unrolled
left-assoc chain of `element_at(a,i)*element_at(b,i)` additions (which
whole-stage-codegen compiles) should win big on pair-scored joins.

Measured (this box, local[32], 500k pairs x 64d, min of 3):
    lambda   0.52 s        unrolled   1.35 s   -> HOF wins 2.6x
And tools/unroll_limit_probe.py sweeps dims 32..512: the HOF form wins
at EVERY dim, and above ~512 total folds the unrolled expression fails
Janino compilation ("Code grows beyond 64 KB") so the whole stage falls
back to fully INTERPRETED execution — strictly worse than the HOF plan
it replaced.  A third failure mode: shapes that reference the unrolled
tree twice (array_position(dots, array_max(dots))) OOM a 2 GB driver
during analysis.  Conclusion: keep aggregate/zip_with for all vector
kernels; Spark 4.1's HOF evaluator is not the bottleneck the hypothesis
assumed.  (Both forms are bit-exact: same left-assoc fold order.)

Run:  python tools/dot_kernel_probe.py [n_pairs] [dim]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F


def lambda_cosine(v, qv):
    dot = F.aggregate(F.zip_with(v, qv, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    nq = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (nv * nq)


def unrolled_cosine(v, qv, dim):
    dot = F.lit(0.0)
    n1 = F.lit(0.0)
    n2 = F.lit(0.0)
    for i in range(1, dim + 1):
        a = F.element_at(v, i)
        b = F.element_at(qv, i)
        dot = dot + a * b
        n1 = n1 + a * a
        n2 = n2 + b * b
    return dot / (F.sqrt(n1) * F.sqrt(n2))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("dot_kernel_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    mk = F.transform(F.sequence(F.lit(1), F.lit(dim)),
                     lambda i: (F.pmod(F.xxhash64(F.col("id") * i), F.lit(1000))
                                .cast("double") / 500.0 - 1.0))
    pairs = (spark.range(n)
             .select("id", mk.alias("v"),
                     F.transform(F.sequence(F.lit(1), F.lit(dim)),
                                 lambda i: (F.pmod(F.xxhash64(F.col("id") + i * 7),
                                                   F.lit(1000))
                                            .cast("double") / 500.0 - 1.0))
                     .alias("qv"))
             .persist())
    pairs.count()

    def bench(label, col):
        for trial in range(3):
            t0 = time.time()
            res = pairs.select(F.sum(col).alias("s")).collect()[0]["s"]
            print(f"  {label} trial{trial}: {time.time()-t0:.2f}s sum={res:.6f}")

    print(f"pairs={n} dim={dim}")
    bench("lambda  ", lambda_cosine(F.col("v"), F.col("qv")))
    bench("unrolled", unrolled_cosine(F.col("v"), F.col("qv"), dim))

    # bit-exactness: compare per-row on a sample
    chk = (pairs.limit(50_000)
           .select((lambda_cosine(F.col("v"), F.col("qv"))
                    == unrolled_cosine(F.col("v"), F.col("qv"), dim))
                   .alias("eq"))
           .agg(F.sum(F.when(F.col("eq"), 0).otherwise(1)).alias("bad"))
           .collect()[0]["bad"])
    print(f"bit-exact mismatches on 50k sample: {chk}")
    spark.stop()


if __name__ == "__main__":
    main()
