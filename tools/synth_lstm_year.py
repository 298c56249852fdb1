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
        # deterministic cache dir: repeated bench runs reuse one copy
        # instead of leaking a fresh multi-MB dataset per run
        tag = hashlib.md5(src.encode()).hexdigest()[:10]
        out_dir = os.path.join(tempfile.gettempdir(), f"lstm_year_{tag}")
        marker = os.path.join(out_dir, "schema.json")
        if os.path.exists(marker):
            return marker
    os.makedirs(out_dir, exist_ok=True)
    with open(schema_path) as f:
        schema = json.load(f)

    for name in os.listdir(src):
        p = os.path.join(src, name)
        if not os.path.isfile(p):
            continue
        if name.endswith(".csv"):
            df = pd.read_csv(p)
            reps = (YEAR + len(df) - 1) // len(df)
            big = pd.concat([df] * reps, ignore_index=True).iloc[:YEAR]
            big.to_csv(os.path.join(out_dir, name), index=False)
        elif name.endswith(".json"):
            continue
        else:
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
