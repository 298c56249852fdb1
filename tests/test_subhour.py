"""Sub-hourly cadence: time_step_ratio derivation and storage scaling
(mirrors reference tests/unit/test_subhour_scaling.py)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.compiler.schema import compile_schema

SRC = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1"


@pytest.fixture(scope="module")
def subhour_dataset(tmp_path_factory):
    """15-minute resampled copy of phase 1 (2 buildings, 1 day)."""
    out = tmp_path_factory.mktemp("subhour")
    n_hours = 48
    for name in ["Building_1.csv", "Building_2.csv"]:
        df = pd.read_csv(os.path.join(SRC, name)).iloc[:n_hours]
        df4 = df.loc[df.index.repeat(4)].reset_index(drop=True)
        df4["minutes"] = np.tile([0, 15, 30, 45], n_hours)
        df4.to_csv(out / name, index=False)
    for name in ["weather.csv", "pricing.csv", "carbon_intensity.csv"]:
        df = pd.read_csv(os.path.join(SRC, name)).iloc[:n_hours]
        df.loc[df.index.repeat(4)].reset_index(drop=True).to_csv(out / name,
                                                                 index=False)
    schema = json.load(open(os.path.join(SRC, "schema.json")))
    schema["root_directory"] = str(out)
    schema["seconds_per_time_step"] = 900
    schema["simulation_end_time_step"] = n_hours * 4 - 1
    schema["buildings"] = {k: v for k, v in schema["buildings"].items()
                           if k in ("Building_1", "Building_2")}
    path = out / "schema.json"
    json.dump(schema, open(path, "w"))
    return str(path)


def test_time_step_ratio_derivation(subhour_dataset):
    spec = compile_schema(subhour_dataset)
    # 15-minute cadence at seconds_per_time_step 900 -> ratio 1.0;
    # the ratio is seconds_per_time_step / dataset cadence (data.py:428-455)
    assert spec.time_step_ratio == pytest.approx(900 / 900)


def test_subhour_env_runs(subhour_dataset):
    env = CityLearnEnv(subhour_dataset, random_seed=0)
    env.reset()
    assert env.cfg.seconds_per_time_step == 900
    rng = np.random.RandomState(0)
    while not env.terminated:
        acts = [list(rng.uniform(s.low, s.high)) for s in env.action_space]
        obs, r, term, trunc, _ = env.step(acts)
        assert np.isfinite(np.asarray(r)).all()
    # storage energy converts with the hours ratio: a full positive action
    # moves at most nominal_power * 0.25h
    soc = env._history["battery_soc"][:env.time_step]   # written rows only
    # max move = nominal_power * 0.25h / capacity, divided by the worst
    # round-trip efficiency on discharge (sqrt(0.83))
    bound = 5.0 * 0.25 / 6.4 / np.sqrt(0.83)
    assert np.nanmax(np.abs(np.diff(soc, axis=0))) <= bound + 1e-5


def test_hourly_schema_ratio_mismatch(subhour_dataset):
    # hourly stepping over 15-minute data -> ratio 4
    spec = compile_schema(subhour_dataset, seconds_per_time_step=3600)
    assert spec.time_step_ratio == pytest.approx(4.0)
