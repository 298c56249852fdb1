"""The README performance table must equal the machine-generated render
of the latest driver bench JSON (VERDICT r4 weak #5: hand-maintained
numbers drifting from the JSON of record)."""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools import render_bench  # noqa: E402


def test_readme_bench_table_matches_latest_json():
    table = render_bench.render(render_bench.latest_bench())
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(re.escape(render_bench.START) + r".*?"
                  + re.escape(render_bench.END), text, re.DOTALL)
    assert m, "README.md lost the bench-table marker block"
    assert m.group(0) == table, (
        "README bench table is stale — run python tools/render_bench.py")
