"""Charger power-dependent efficiency curves
(reference ``electric_vehicle_charger.py:252-281``).

Strategy: a curve evaluated at |action| must make the env behave exactly
like the same env with the charger's scalar efficiency pinned to the
interpolated value — so we run the plus_evs dataset twice per case and
compare charger consumption series bit-for-bit.
"""

import copy
import json

import numpy as np
import pytest

DATASETS = "/root/reference/data/datasets"
SCHEMA = f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs/schema.json"
STEPS = 24
ACTION = 0.75
CURVE = [[0.0, 1.0], [0.5, 0.8], [1.0, 0.6]]   # interp(0.75) = 0.7


def _schema(**charger_attr_overrides):
    schema = json.load(open(SCHEMA))
    schema["root_directory"] = f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs"
    for b in schema["buildings"].values():
        for ch in (b.get("chargers") or {}).values():
            attrs = ch.setdefault("attributes", {})
            attrs.update(copy.deepcopy(charger_attr_overrides))
    return schema


def _run(schema):
    from citylearn_tpu import CityLearnEnv

    env = CityLearnEnv(schema, episode_time_steps=STEPS, central_agent=False)
    env.reset()
    for _ in range(STEPS - 1):
        acts = []
        for i, sp in enumerate(env.action_space):
            a = np.zeros(len(sp.low), np.float32)
            names = env.buildings[i].active_actions
            for j, nm in enumerate(names):
                if "electric_vehicle_storage" in nm:
                    a[j] = ACTION
            acts.append(a)
        env.step(acts)
    # with all non-EV actions zero, per-building net consumption differs
    # between runs only through the chargers' draw
    return np.stack([np.asarray(b.net_electricity_consumption, np.float64)
                     for b in env.buildings])


@pytest.mark.parametrize("action", [ACTION])
def test_curve_matches_scalar_at_interpolated_point(action):
    eff = float(np.interp(action, [r[0] for r in CURVE], [r[1] for r in CURVE]))
    with_curve = _run(_schema(charge_efficiency_curve=CURVE,
                              discharge_efficiency_curve=CURVE))
    with_scalar = _run(_schema(efficiency=eff))
    # float32 in-graph interpolation vs the exact scalar: tiny rounding only
    np.testing.assert_allclose(with_curve, with_scalar, rtol=1e-5, atol=1e-4)
    # the curve changed behavior vs the schema's stock efficiency
    stock = _run(_schema())
    assert not np.allclose(with_curve, stock)


def test_constant_curve_is_identity():
    base = _run(_schema(efficiency=0.9))
    const = _run(_schema(charge_efficiency_curve=[[0.0, 0.9], [1.0, 0.9]],
                         discharge_efficiency_curve=[[0.0, 0.9], [1.0, 0.9]]))
    np.testing.assert_allclose(base, const, rtol=0, atol=0)
