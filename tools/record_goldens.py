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


def main() -> None:
    from gqlite_spark import GQLite
    from gqlite_spark.session import get_spark

    spark = get_spark(app_name="gqlite-goldens", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    db = GQLite(spark)
    script = open(os.path.join(GOLDEN_DIR, "corpus.gql"),
                  encoding="utf-8").read()
    text = render(db.exec(script))
    with open(os.path.join(GOLDEN_DIR, "corpus.expect"), "w",
              encoding="utf-8") as f:
        f.write(text)
    print(text)
    print(f"wrote {os.path.join(GOLDEN_DIR, 'corpus.expect')}")


if __name__ == "__main__":
    main()
