"""Driver-contract tripwire: every queries() entry must (a) analyze
without exception and (b) agree with its oracle_sql() on column names.

This is the pre-commit form of the two round-3 gate failures:
- `asof_attribution` shipped an AnalysisException (events.ts dtype
  assumption) — caught here by simply building every DataFrame;
- `text_redact_pii` shipped an operator/oracle schema drift (operator
  grew 3 columns, oracle didn't) — caught here by comparing Spark
  column names against the DuckDB oracle's output columns.

The value-level comparison stays in tools/oracle_check.py (it needs
full execution); this test is the cheap every-run guard.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _oracle_columns(con, sql: str) -> list[str]:
    """Output column names of an oracle query without materializing it."""
    try:
        cur = con.execute(f"SELECT * FROM ({sql}) _schema_probe LIMIT 0")
    except duckdb.Error:
        # a few oracle forms don't nest cleanly; fall back to running it
        cur = con.execute(sql)
    return [d[0] for d in cur.description]


def test_every_query_analyzes_and_matches_oracle_schema(spark, entry, duck):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    problems = []
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)   # builds + analyzes the plan (lazy)
            cols = list(df.columns)
        except Exception as e:       # the r3 asof_attribution failure mode
            problems.append(f"{name}: ANALYSIS {type(e).__name__}: "
                            f"{str(e)[:160]}")
            continue
        if name not in oracles:
            continue                 # rows-only entry: (a) is the check
        try:
            ocols = _oracle_columns(duck, oracles[name])
        except Exception as e:
            problems.append(f"{name}: ORACLE-SQL {str(e)[:160]}")
            continue
        if sorted(cols) != sorted(ocols):
            # the r3 text_redact_pii failure mode
            problems.append(f"{name}: SCHEMA spark={sorted(cols)} "
                            f"oracle={sorted(ocols)}")
    assert not problems, "\n".join(problems)


def test_oracle_keys_subset_of_queries(entry):
    """Every oracle must belong to a real queries() entry (a stale oracle
    for a renamed query would silently stop being checked)."""
    extra = set(entry.oracle_sql()) - set(entry.queries())
    assert not extra, f"oracles without a queries() entry: {sorted(extra)}"


def test_entry_contract(spark, entry):
    """entry(spark) must return a non-collected DataFrame with rows."""
    df = entry.entry(spark)
    assert df.columns, "entry() returned no columns"
    assert df.count() >= 0
