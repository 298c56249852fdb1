"""Synthesize a year-long (8760-step) LSTM-dynamics dataset by tiling a
bundled short-horizon 2023-family dataset's time series (VERDICT r3 #4:
bench the LSTM family on a year-long horizon; no bundled LSTM dataset
ships one). The 720-row phase-1 series are 30 whole days, so tiling keeps
hour/day cycles consistent. Weights (.pth) and schema structure are
copied verbatim; only the simulation range changes."""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YEAR = 8760


def synthesize_year(schema_path: str, out_dir: str = None) -> str:
    import hashlib

    import pandas as pd

    src = os.path.dirname(os.path.abspath(schema_path))
    if out_dir is None:
        # deterministic cache dir keyed by path AND source content
        # (name/mtime/size of every file): repeated bench runs reuse one
        # copy, while edited source CSVs invalidate the stale cache
        h = hashlib.md5(src.encode())
        for name in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, name))
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size}".encode())
        out_dir = os.path.join(tempfile.gettempdir(),
                               f"lstm_year_{h.hexdigest()[:10]}")
        marker = os.path.join(out_dir, "schema.json")
        if os.path.exists(marker):
            return marker
    os.makedirs(out_dir, exist_ok=True)
    with open(schema_path) as f:
        schema = json.load(f)

    schema_name = os.path.basename(schema_path)
    for name in os.listdir(src):
        p = os.path.join(src, name)
        if not os.path.isfile(p) or name == schema_name:
            continue
        if name.endswith(".csv"):
            df = pd.read_csv(p)
            reps = (YEAR + len(df) - 1) // len(df)
            big = pd.concat([df] * reps, ignore_index=True).iloc[:YEAR]
            big.to_csv(os.path.join(out_dir, name), index=False)
        else:
            # auxiliary files (LSTM .pth weights, any non-schema json)
            # copy verbatim
            shutil.copy(p, os.path.join(out_dir, name))

    schema["root_directory"] = out_dir
    schema["simulation_start_time_step"] = 0
    schema["simulation_end_time_step"] = YEAR - 1
    schema["episode_time_steps"] = None
    out_schema = os.path.join(out_dir, "schema.json")
    with open(out_schema, "w") as f:
        json.dump(schema, f)
    return out_schema


if __name__ == "__main__":
    print(synthesize_year(sys.argv[1]))
