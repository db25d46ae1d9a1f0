"""Per-query bench profiler for the optimization rounds (guide §1).

For each named queries() entry (default: the full bench set):
  - builds the DataFrame and materializes it through the noop sink
    (cold), then N more times (warm walls, min + all samples reported);
  - captures .explain("formatted") to plans/<tag>/<query>_<suffix>.txt;
  - summarizes plan shape: Exchange count, join strategies,
    BatchEvalPython/ArrowEvalPython nodes, PushedFilters presence.

Usage:
    python tools/bench_profile.py [--plans-dir plans/r14] [--suffix before]
                                  [--runs 3] [--sf-dir DIR] [query ...]

Prints one JSON line per query:
    {"q": name, "cold": s, "warm": [s, ...], "exchanges": n, ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan))),
        "python": sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)\b", plan))),
        "generates": len(re.findall(r"\bGenerate\b", plan)),
        "aggregates": len(re.findall(r"\bHashAggregate\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "has_pushed_filters": "PushedFilters: [" in plan
                              and not re.search(r"PushedFilters: \[\]", plan),
    }


def main() -> None:
    argv = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--plans-dir":
            plans_dir = argv[i + 1]; i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]; i += 2
        elif a == "--runs":
            runs = int(argv[i + 1]); i += 2
        elif a == "--sf-dir":
            sf_dir = argv[i + 1]; i += 2
        else:
            names.append(a); i += 1

    from gqlite_spark.session import get_spark
    import __spark_entry__ as entry
    import bench

    spark = get_spark(app_name="gqlite-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from gqlite_spark.sources import testdata
    testdata.load(spark, sf_dir, "lineitem").count()
    entry._gql_db(spark, sf_dir)

    qs = entry.queries()
    if not names:
        names = bench.HEADLINE + bench.DIAGNOSTIC_QUERIES

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        warm = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm.append(round(time.time() - t0, 3))
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(plan)
        out = {"q": name, "cold": cold, "warm": warm,
               "warm_min": min(warm)}
        out.update(plan_summary(plan))
        print(json.dumps(out), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
