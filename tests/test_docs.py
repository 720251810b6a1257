"""Docs consistency: the measured tables in docs/performance.md are
rendered from the committed bench JSON by tools/gen_performance_doc.py;
this test fails when doc and data drift apart (the round-4 review found
three stale figures from three different rounds in one document)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_performance_doc_matches_bench_json():
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "gen_performance_doc.py"),
         "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, (
        "docs/performance.md is stale vs the committed bench JSON; "
        "run python tools/gen_performance_doc.py\n" + r.stderr)
