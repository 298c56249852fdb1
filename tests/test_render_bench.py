"""The README performance table must equal the machine-generated render
of the latest driver bench JSON (VERDICT r4 weak #5: hand-maintained
numbers drifting from the JSON of record)."""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools import render_bench  # noqa: E402


def test_readme_bench_table_is_machine_generated():
    """The README table must EQUAL the mechanical render of the bench
    JSON it names (no hand-editing can survive). Freshness against a
    newer driver JSON is the tool's job (`render_bench.py --check`), not
    this test's — the driver drops a new BENCH_r*.json at the END of a
    round, after the README was necessarily written."""
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(re.escape(render_bench.START) + r".*?"
                  + re.escape(render_bench.END), text, re.DOTALL)
    assert m, "README.md lost the bench-table marker block"
    named = re.search(r"Generated from `(BENCH_r\d+\.json)`", m.group(0))
    assert named, "README bench table lost its source-file line"
    src = os.path.join(ROOT, named.group(1))
    assert os.path.exists(src), f"README names a missing bench file {src}"
    assert m.group(0) == render_bench.render(src), (
        "README bench table differs from the mechanical render of "
        f"{named.group(1)} — run python tools/render_bench.py")
