"""Schema-fuzz parity (VERDICT r2 #10): randomized schema mutations —
dropped devices, toggled observations/actions, resized storages, flipped
central_agent, excluded buildings — cross-checked against the LIVE
reference on short scripted traces. Catches compiler edge cases no
hand-picked golden covers (reference ``citylearn.py:1973-2170`` schema
loading + constructor overrides)."""

import copy
import json
import os
import sys

import numpy as np
import pytest

DATASETS = "/root/reference/data/datasets"


def _load_reference():
    import pandas as pd
    sys.path.insert(0, "/root/reference")
    from citylearn.data import DataSet
    DataSet.get_pv_sizing_data = lambda self: pd.DataFrame()
    DataSet.get_battery_sizing_data = lambda self: pd.DataFrame()
    from citylearn.citylearn import CityLearnEnv as RefEnv
    return RefEnv


def _base_schema(name):
    path = f"{DATASETS}/{name}/schema.json"
    with open(path) as f:
        s = json.load(f)
    s["root_directory"] = os.path.dirname(path)
    return s


def _mutate(schema: dict, rng: np.random.RandomState) -> dict:
    """One random mutation bundle (seeded)."""
    s = copy.deepcopy(schema)
    s["central_agent"] = bool(rng.randint(2))
    names = [n for n, b in s["buildings"].items() if b.get("include", True)]

    # exclude one building (keep >= 2)
    if len(names) > 2 and rng.rand() < 0.5:
        s["buildings"][names[rng.randint(len(names))]]["include"] = False
        names = [n for n, b in s["buildings"].items() if b.get("include", True)]

    # toggle a couple of optional observations off
    togglable = [k for k, v in s["observations"].items()
                 if v.get("active") and k not in ("hour",)]
    for k in rng.choice(togglable, size=min(2, len(togglable)), replace=False):
        s["observations"][k]["active"] = False

    for n in names:
        b = s["buildings"][n]
        # resize electrical storage
        es = b.get("electrical_storage")
        if es and rng.rand() < 0.7:
            attrs = es.setdefault("attributes", {})
            if "capacity" in attrs:
                attrs["capacity"] = float(attrs["capacity"]) * float(rng.uniform(0.5, 2.0))
            if "nominal_power" in attrs:
                attrs["nominal_power"] = float(attrs["nominal_power"]) * float(rng.uniform(0.5, 1.5))
        # drop PV
        if "pv" in b and rng.rand() < 0.3:
            b.pop("pv")
        # drop a thermal storage device entirely
        for dev in ("cooling_storage", "dhw_storage"):
            if dev in b and rng.rand() < 0.3:
                b.pop(dev)
        # per-building inactive action
        if rng.rand() < 0.3:
            b.setdefault("inactive_actions", [])
            active = [a for a, v in s["actions"].items() if v.get("active")]
            pick = active[rng.randint(len(active))]
            if pick not in b["inactive_actions"]:
                b["inactive_actions"].append(pick)
    return s


def _rollout(env, steps, seed):
    rng = np.random.RandomState(seed)
    obs, _ = env.reset()
    flat = lambda o: np.concatenate([np.asarray(a, np.float64) for a in o])
    observations, rewards = [flat(obs)], []
    for _ in range(steps):
        acts = [list(rng.uniform(sp.low, sp.high).astype(float))
                for sp in env.action_space]
        obs, r, term, _, _ = env.step(acts)
        observations.append(flat(obs))
        rewards.append(np.asarray(r, np.float64))
        if term:
            break
    return np.asarray(observations), np.asarray(rewards)


@pytest.mark.parametrize("base,seed", [
    ("citylearn_challenge_2022_phase_1", 11),
    ("citylearn_challenge_2022_phase_1", 12),
    ("citylearn_challenge_2022_phase_1", 13),
    ("citylearn_challenge_2021", 21),
    ("citylearn_challenge_2021", 22),
])
def test_fuzzed_schema_trace_matches_reference(base, seed):
    from citylearn_tpu import CityLearnEnv

    RefEnv = _load_reference()
    rng = np.random.RandomState(seed)
    schema = _mutate(_base_schema(base), rng)

    ours = CityLearnEnv(copy.deepcopy(schema), random_seed=0,
                        episode_time_steps=24)
    ref = RefEnv(copy.deepcopy(schema), random_seed=0, episode_time_steps=24)

    # identical spaces first — shape mismatches are compiler bugs
    assert len(ours.action_space) == len(ref.action_space), \
        f"agent count {len(ours.action_space)} vs {len(ref.action_space)}"
    for a, b in zip(ours.action_space, ref.action_space):
        np.testing.assert_allclose(a.low, b.low, atol=1e-5)
        np.testing.assert_allclose(a.high, b.high, atol=1e-5)
    for a, b in zip(ours.observation_space, ref.observation_space):
        assert a.shape == b.shape, f"obs space {a.shape} vs {b.shape}"

    obs_m, rew_m = _rollout(ours, 23, seed=1000 + seed)
    obs_r, rew_r = _rollout(ref, 23, seed=1000 + seed)
    assert obs_m.shape == obs_r.shape
    err = np.abs(obs_m - obs_r) / np.maximum(np.abs(obs_r), 1.0)
    worst = np.unravel_index(np.argmax(err), err.shape)
    assert err.max() < 2e-4, (
        f"obs mismatch at step {worst[0]} col {worst[1]}: "
        f"{obs_m[worst]} vs {obs_r[worst]} (rel {err.max():.2e})")
    rerr = np.abs(rew_m - rew_r) / np.maximum(np.abs(rew_r), 1.0)
    assert rerr.max() < 5e-4, f"reward mismatch (rel {rerr.max():.2e})"
