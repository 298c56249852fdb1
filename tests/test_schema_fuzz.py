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


import contextlib
import random as _stdlib_random


@contextlib.contextmanager
def _midpoint_uniform():
    """Pin stdlib ``random.uniform`` to the midpoint for the duration of
    a reference construction/rollout, then RESTORE it — EVs without a
    schema initial_soc draw ``random.uniform(0, 1)`` (citylearn.py:2564),
    inherently order-dependent otherwise (same convention as
    tools/make_golden.py; our compiler defaults missing EV initial_soc to
    0.5, compiler/schema.py:888-892). The patch must not leak into the
    rest of the pytest process."""
    orig = _stdlib_random.uniform
    _stdlib_random.uniform = lambda a, b: (a + b) / 2
    try:
        yield
    finally:
        _stdlib_random.uniform = orig


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


def _mutate_ev(schema: dict, rng: np.random.RandomState) -> dict:
    """Mutation bundle over the EV/charger/washing-machine schema blocks
    (reference ``citylearn.py:2280-2307``; VERDICT r3 #5): excluded EVs,
    rescaled charger power limits and efficiencies, dropped chargers,
    dropped washing machines, rescaled EV batteries."""
    s = copy.deepcopy(schema)
    evs = [n for n, v in s.get("electric_vehicles_def", {}).items()
           if v.get("include", True)]
    # exclude one EV (keep >= 2)
    if len(evs) > 2 and rng.rand() < 0.7:
        s["electric_vehicles_def"][evs[rng.randint(len(evs))]]["include"] = False
    # rescale one EV battery
    pick = evs[rng.randint(len(evs))]
    bat = s["electric_vehicles_def"][pick]["battery"]["attributes"]
    bat["capacity"] = float(bat["capacity"]) * float(rng.uniform(0.7, 1.5))

    for n, b in s["buildings"].items():
        chargers = b.get("chargers") or {}
        for cn, ch in list(chargers.items()):
            attrs = ch.setdefault("attributes", {})
            r = rng.rand()
            if r < 0.25 and len(chargers) > 1:
                chargers.pop(cn)        # drop a charger entirely
            elif r < 0.6:
                attrs["max_charging_power"] = \
                    float(attrs.get("max_charging_power", 11.0)) \
                    * float(rng.uniform(0.5, 1.5))
                attrs["efficiency"] = float(rng.uniform(0.9, 1.0))
        if b.get("washing_machines") and rng.rand() < 0.5:
            b.pop("washing_machines")   # drop the deferrable load
        es = b.get("electrical_storage")
        if es and rng.rand() < 0.5:
            attrs = es.setdefault("attributes", {})
            if "capacity" in attrs:
                attrs["capacity"] = float(attrs["capacity"]) \
                    * float(rng.uniform(0.6, 1.6))
    return s


def _mutate_2023(schema: dict, rng: np.random.RandomState) -> dict:
    """Mutation bundle over the 2023 LSTM-dynamics/outage blocks
    (reference ``citylearn.py:2216-2271``): outage toggles, rescaled
    partial-load devices, battery resizes, observation toggles."""
    s = copy.deepcopy(schema)
    names = list(s["buildings"])
    # toggle one building's outage simulation off
    pick = s["buildings"][names[rng.randint(len(names))]]
    po = pick.get("power_outage")
    if po and rng.rand() < 0.7:
        po["simulate_power_outage"] = not po.get("simulate_power_outage", False)
    for n, b in s["buildings"].items():
        cd = b.get("cooling_device")
        if cd and rng.rand() < 0.6:
            attrs = cd.setdefault("attributes", {})
            if "nominal_power" in attrs:
                attrs["nominal_power"] = float(attrs["nominal_power"]) \
                    * float(rng.uniform(0.8, 1.5))
        es = b.get("electrical_storage")
        if es and rng.rand() < 0.5:
            attrs = es.setdefault("attributes", {})
            if "capacity" in attrs:
                attrs["capacity"] = float(attrs["capacity"]) \
                    * float(rng.uniform(0.6, 1.6))
    togglable = [k for k, v in s["observations"].items()
                 if v.get("active") and k not in ("hour",)]
    for k in rng.choice(togglable, size=min(2, len(togglable)), replace=False):
        s["observations"][k]["active"] = False
    return s


def _mutate_occ(schema: dict, rng: np.random.RandomState) -> dict:
    """Mutation bundle over the occupant-interaction blocks (reference
    ``building.py:3160-3353``): hold-time changes, device rescales,
    observation toggles."""
    s = copy.deepcopy(schema)
    for n, b in s["buildings"].items():
        if "set_point_hold_time_steps" in b and rng.rand() < 0.7:
            b["set_point_hold_time_steps"] = int(rng.randint(1, 6))
        hd = b.get("heating_device")
        if hd and rng.rand() < 0.5:
            attrs = hd.setdefault("attributes", {})
            if "nominal_power" in attrs:
                attrs["nominal_power"] = float(attrs["nominal_power"]) \
                    * float(rng.uniform(0.9, 1.4))
    togglable = [k for k, v in s["observations"].items()
                 if v.get("active") and k not in ("hour",)]
    if len(togglable) > 1:
        k = togglable[rng.randint(len(togglable))]
        s["observations"][k]["active"] = False
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
    with _midpoint_uniform():
        ref = RefEnv(copy.deepcopy(schema), random_seed=0,
                     episode_time_steps=24)

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


def _compare_traces(schema, seed, steps=23, obs_tol=2e-4, rew_tol=5e-4):
    from citylearn_tpu import CityLearnEnv

    RefEnv = _load_reference()
    ours = CityLearnEnv(copy.deepcopy(schema), random_seed=0,
                        episode_time_steps=steps + 1)
    # the reference bakes construction-time Gaussian noise from the GLOBAL
    # numpy RNG (utilities.py:148-170); seed it so the draws line up with
    # our compiler's seeded noise stream (make_golden.py noisy convention)
    np.random.seed(0)
    with _midpoint_uniform():
        ref = RefEnv(copy.deepcopy(schema), random_seed=0,
                     episode_time_steps=steps + 1)
    assert len(ours.action_space) == len(ref.action_space)
    for a, b in zip(ours.action_space, ref.action_space):
        np.testing.assert_allclose(a.low, b.low, atol=1e-5)
        np.testing.assert_allclose(a.high, b.high, atol=1e-5)
    for a, b in zip(ours.observation_space, ref.observation_space):
        assert a.shape == b.shape, f"obs space {a.shape} vs {b.shape}"
    obs_m, rew_m = _rollout(ours, steps, seed=1000 + seed)
    # the reference draws unconnected-EV SOC drift from the GLOBAL numpy
    # RNG (citylearn.py:1473) — seed it to the env seed so it matches our
    # seeded replication stream (same convention as tools/make_golden.py)
    np.random.seed(0)
    obs_r, rew_r = _rollout(ref, steps, seed=1000 + seed)
    assert obs_m.shape == obs_r.shape
    err = np.abs(obs_m - obs_r) / np.maximum(np.abs(obs_r), 1.0)
    worst = np.unravel_index(np.argmax(err), err.shape)
    assert err.max() < obs_tol, (
        f"obs mismatch at step {worst[0]} col {worst[1]}: "
        f"{obs_m[worst]} vs {obs_r[worst]} (rel {err.max():.2e})")
    rerr = np.abs(rew_m - rew_r) / np.maximum(np.abs(rew_r), 1.0)
    assert rerr.max() < rew_tol, f"reward mismatch (rel {rerr.max():.2e})"


@pytest.mark.parametrize("seed", [31, 32])
def test_fuzzed_ev_schema_matches_reference(seed):
    """EV/charger/washing-machine schema blocks (VERDICT r3 #5)."""
    rng = np.random.RandomState(seed)
    schema = _mutate_ev(
        _base_schema("citylearn_challenge_2022_phase_all_plus_evs"), rng)
    _compare_traces(schema, seed)


@pytest.mark.parametrize("seed", [41, 42])
def test_fuzzed_2023_schema_matches_reference(seed):
    """LSTM-dynamics + outage schema blocks."""
    rng = np.random.RandomState(seed)
    schema = _mutate_2023(_base_schema("citylearn_challenge_2023_phase_1"),
                          rng)
    _compare_traces(schema, seed)


@pytest.mark.parametrize("seed", [51])
def test_fuzzed_occupant_schema_matches_reference(seed):
    """Occupant-interaction blocks via the synthesized quebec_occ dataset
    (decision-tree pickles loadable by both implementations)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden/quebec_occ/schema.json")
    with open(path) as f:
        schema = json.load(f)
    schema["root_directory"] = os.path.dirname(path)
    rng = np.random.RandomState(seed)
    _compare_traces(_mutate_occ(schema, rng), seed, steps=40)
