"""Record the self-golden expected output for tests/goldens/corpus.gql.

Replays the corpus through the engine and writes corpus.expect in the
statement-indexed format `[i]:\t` + status/error + row lines.  The
committed expect file is the regression contract: any change to parser,
executor, formatting, ordering, or error texts that alters engine-visible
output fails tests/test_goldens.py until re-recorded DELIBERATELY with:

    python tools/record_goldens.py

Review the diff of corpus.expect before committing a re-record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def render(results) -> str:
    out = []
    for i, res in enumerate(results):
        out.append(f"[{i}]:\t")
        if res.error is not None:
            out.append(res.error)
        else:
            for row in res.rows:
                out.append(row)
            out.append(res.status)
    return "\n".join(out) + "\n"


def render_sorted(results) -> str:
    """Like :func:`render` but rows are sorted WITHIN each statement:
    the pipeline statements ({dedup}/{similar}/{chunk}/{funnel}/{cohort}/
    {sample}) return DataFrame results whose row order is not part of
    their contract (no ORDER BY semantics), so their golden compares
    order-insensitively per statement — content, statuses, and error
    texts stay byte-exact."""
    out = []
    for i, res in enumerate(results):
        out.append(f"[{i}]:\t")
        if res.error is not None:
            out.append(res.error)
        else:
            out.extend(sorted(str(row) for row in res.rows))
            out.append(res.status)
    return "\n".join(out) + "\n"


def main() -> None:
    from gqlite_spark import GQLite
    from gqlite_spark.session import get_spark

    spark = get_spark(app_name="gqlite-goldens", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    db = GQLite(spark)
    for name, renderer in (("corpus", render), ("pipeline", render_sorted)):
        script = open(os.path.join(GOLDEN_DIR, f"{name}.gql"),
                      encoding="utf-8").read()
        text = renderer(db.exec(script))
        with open(os.path.join(GOLDEN_DIR, f"{name}.expect"), "w",
                  encoding="utf-8") as f:
            f.write(text)
        print(text)
        print(f"wrote {os.path.join(GOLDEN_DIR, f'{name}.expect')}")


if __name__ == "__main__":
    main()
