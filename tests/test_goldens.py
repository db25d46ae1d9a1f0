"""Self-golden regression harness: replays tests/goldens/corpus.gql and
compares the engine's full rendered output byte-for-byte with the
committed tests/goldens/corpus.expect.

Unlike tests/test_reference_goldens.py (parity vs the reference's own
corpora, skipped when /root/reference is absent), this harness is fully
standalone: the corpus and its expected output live in THIS repo, so any
change to parser, executor, row formatting, ordering, or error texts is
caught even without the reference checkout.  Re-record deliberately with
`python tools/record_goldens.py` and review the diff.
"""

import difflib
import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_corpus_replay_matches_committed_golden(db):
    """Also asserts determinism: two replays in the same session render
    identically (ordering and formatting carry no partition- or
    time-dependence).  Folded into the golden-match test (r15) so the
    suite replays the corpus twice, not three times — the second replay
    serves both assertions."""
    from tools.record_goldens import render
    script = open(os.path.join(GOLDEN_DIR, "corpus.gql"),
                  encoding="utf-8").read()
    got = render(db.exec(script))
    assert got == render(db.exec(script))     # deterministic replay
    expect = open(os.path.join(GOLDEN_DIR, "corpus.expect"),
                  encoding="utf-8").read()
    if got != expect:
        diff = "\n".join(difflib.unified_diff(
            expect.splitlines(), got.splitlines(),
            "corpus.expect", "engine output", lineterm=""))
        raise AssertionError(
            f"golden mismatch (re-record with tools/record_goldens.py "
            f"if deliberate):\n{diff}")


def test_pipeline_corpus_replay_matches_committed_golden(db):
    """Pipeline-statement golden (VERDICT r5 #8): the {dedup}/{similar}/
    {chunk}/{funnel}/{cohort}/{sample} surface replays byte-for-byte
    (rows order-insensitive within a statement — DataFrame results carry
    no ORDER BY contract; statuses and error texts exact).  Also asserts
    determinism across two replays (folded, r15 — see the corpus twin)."""
    from tools.record_goldens import render_sorted
    script = open(os.path.join(GOLDEN_DIR, "pipeline.gql"),
                  encoding="utf-8").read()
    got = render_sorted(db.exec(script))
    assert got == render_sorted(db.exec(script))  # deterministic replay
    expect = open(os.path.join(GOLDEN_DIR, "pipeline.expect"),
                  encoding="utf-8").read()
    if got != expect:
        diff = "\n".join(difflib.unified_diff(
            expect.splitlines(), got.splitlines(),
            "pipeline.expect", "engine output", lineterm=""))
        raise AssertionError(
            f"pipeline golden mismatch (re-record with "
            f"tools/record_goldens.py if deliberate):\n{diff}")



