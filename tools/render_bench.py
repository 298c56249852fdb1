"""Regenerate the README performance table from the latest driver bench
(``BENCH_r*.json``) — the table is MACHINE-WRITTEN; never hand-edit it
(VERDICT r4 weak #5: hand-maintained numbers kept drifting from the
driver JSON of record).

Usage: ``python tools/render_bench.py [--check]`` — rewrites the block
between the ``<!-- bench-table:start -->`` / ``<!-- bench-table:end -->``
markers in README.md (``--check`` verifies without writing; the test
``tests/test_render_bench.py`` runs the same check).
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
START = "<!-- bench-table:start -->"
END = "<!-- bench-table:end -->"

ROWS = [
    # (matrix key or None=headline, label, reference_perf denominator key)
    (None, "2022 battery+PV (Pallas whole-episode kernel)",
     "p1_scripted_year"),
    ("c2021_thermal", "2021 thermal: heat pumps + 3 storages "
     "(Pallas whole-episode kernel)", "c2021_scripted_year"),
    ("c2023p1_lstm", "2023 LSTM dynamics, year-long horizon "
     "(Pallas whole-episode kernel)", "c2023_scripted_year"),
    ("evs_chargers_wm", "EVs + chargers + washing machine "
     "(Pallas whole-episode kernel)", "evs_scripted_year"),
    ("eulp_neighborhood", "100-building EULP neighborhood, partial-load "
     "dispatch (Pallas whole-episode kernel)", None),
    ("eval_fast", "user-facing kernel-backed evaluate, full KPI table "
     "(Pallas + KPI assembly)", "p1_scripted_year"),
    ("eval_fast_sharded", "sharded kernel-backed evaluate "
     "(shard_map over district tiles)", "p1_scripted_year"),
    ("sac_train_step", "BatchedSAC fused train step: closed-loop collect "
     "+ replay + update", None),
]


def latest_bench():
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json found")
    return paths[-1]


def _fmt(v):
    if v >= 1e6:
        return f"**{v / 1e6:.2f} M**"
    return f"**{v / 1e3:.0f} k**"


def render(bench_path: str) -> str:
    with open(bench_path) as f:
        bench = json.load(f)
    data = bench.get("parsed", bench)
    matrix = data.get("matrix", {})
    ref_path = os.path.join(ROOT, "tests/golden/reference_perf.json")
    ref = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    name = os.path.basename(bench_path)
    lines = [
        START,
        f"Generated from `{name}` by `tools/render_bench.py` — do not "
        "hand-edit (run `python tools/render_bench.py` after a new bench).",
        "",
        "| Configuration | Districts | Throughput (district-steps/s) "
        "| vs reference (CPU, single env) |",
        "|---|---|---|---|",
    ]
    for key, label, ref_key in ROWS:
        if key is None:
            v = data.get("value")
            d = re.search(r"@ (\d+)", data.get("unit", "")) or None
            d = d.group(1) if d else "?"
        else:
            row = matrix.get(key)
            if not row or "district_steps_per_sec" not in row:
                continue
            v = row["district_steps_per_sec"]
            d = row.get("D", "?")
        den = ref.get(ref_key) if ref_key else None
        vs = f"{v / den:,.0f}x" if den else "-"
        lines.append(f"| {label} | {d} | {_fmt(v)} | {vs} |")
    den = ref.get("p1_scripted_year")
    if den:
        lines.append(f"| reference CityLearn (interpreted Python, "
                     f"scripted year) | 1 | {den:.0f} | 1x |")
    lines.append(END)
    return "\n".join(lines)


def main():
    check = "--check" in sys.argv
    table = render(latest_bench())
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    pattern = re.compile(re.escape(START) + r".*?" + re.escape(END),
                         re.DOTALL)
    if not pattern.search(text):
        raise SystemExit(f"README.md is missing the {START} marker block")
    new = pattern.sub(lambda _: table, text)
    if check:
        if new != text:
            raise SystemExit("README bench table is stale — run "
                             "python tools/render_bench.py")
        print("README bench table up to date")
        return
    with open(readme, "w") as f:
        f.write(new)
    print("README bench table regenerated from", latest_bench())


if __name__ == "__main__":
    main()
