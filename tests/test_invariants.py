"""Behavioral invariants lifted from the reference's own test suite
(SURVEY.md §4): KPI identity under equal conditions
(``tests/test_kpis.py:40-62``), per-building series integrity
(``tests/test_series_integrity.py``), EV charging monotonicity
(``tests/test_kpis.py:65-97``), finite rewards
(``tests/unit/test_alignment.py``).
"""

import numpy as np
import pytest

from citylearn_tpu import CityLearnEnv, EvaluationCondition

DATASETS = "/root/reference/data/datasets"
DISTRICT_KPIS = ("ramping_average", "daily_one_minus_load_factor_average",
                 "monthly_one_minus_load_factor_average",
                 "daily_peak_average", "all_time_peak_average")


def _rollout(env, ev_action=0.0, steps=None):
    env.reset()
    rewards = []
    n = steps if steps is not None else env.time_steps - 1
    for _ in range(n):
        acts = []
        for i, sp in enumerate(env.action_space):
            a = np.zeros(len(sp.low), np.float32)
            for j, nm in enumerate(env.buildings[i].active_actions):
                if "electric_vehicle_storage" in nm:
                    a[j] = ev_action
            acts.append(a)
        _, r, *_ = env.step(acts)
        rewards.append(r)
    return rewards


def test_kpi_identity_when_conditions_equal():
    """control condition == baseline condition -> district normalized KPIs
    == 1.0 +/- 1e-5 (reference tests/test_kpis.py:49-60)."""
    env = CityLearnEnv(f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json",
                       episode_time_steps=240, central_agent=False)
    _rollout(env)
    kpis = env.evaluate(
        control_condition=EvaluationCondition.WITH_STORAGE_AND_PV,
        baseline_condition=EvaluationCondition.WITH_STORAGE_AND_PV)
    district = kpis[kpis["level"] == "district"].set_index("cost_function")["value"]
    for name in DISTRICT_KPIS:
        assert district[name] == pytest.approx(1.0, abs=1e-5), name


def test_series_integrity_lengths():
    """Every per-building series has length t+1 after reset + k steps
    (reference tests/test_series_integrity.py:14-41)."""
    env = CityLearnEnv(f"{DATASETS}/citylearn_challenge_2021/schema.json",
                       episode_time_steps=24, central_agent=False)
    env.reset()
    for k in (0, 5, 11):
        while env.time_step < k:
            env.step([np.zeros(len(sp.low), np.float32)
                      for sp in env.action_space])
        for b in env.buildings:
            for series in (b.net_electricity_consumption,
                           b.net_electricity_consumption_cost,
                           b.net_electricity_consumption_emission,
                           b.solar_generation,
                           b.cooling_electricity_consumption,
                           b.dhw_electricity_consumption,
                           b.electrical_storage.soc,
                           b.cooling_storage.soc):
                assert len(series) == k + 1


def test_ev_charging_monotonicity():
    """Charging at 1.0 strictly increases district charger consumption vs
    0.0 (reference tests/test_kpis.py:65-97)."""
    kw = dict(episode_time_steps=24, central_agent=False)
    path = f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs/schema.json"
    env0 = CityLearnEnv(path, **kw)
    _rollout(env0, ev_action=0.0)
    env1 = CityLearnEnv(path, **kw)
    _rollout(env1, ev_action=1.0)

    def charger_kwh(env):
        return float(sum(np.abs(b.chargers_electricity_consumption).sum()
                         for b in env.buildings))

    assert charger_kwh(env1) > charger_kwh(env0)


def test_rewards_finite():
    env = CityLearnEnv(f"{DATASETS}/citylearn_challenge_2023_phase_1/schema.json",
                       episode_time_steps=24, central_agent=False)
    rewards = _rollout(env)
    flat = np.asarray(rewards, dtype=np.float64)
    assert np.isfinite(flat).all()


def test_terminated_at_T_minus_1():
    """Episode of T steps terminates after T-1 step() calls
    (reference citylearn.py:373-376)."""
    env = CityLearnEnv(f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json",
                       episode_time_steps=8, central_agent=True)
    env.reset()
    term = False
    for k in range(7):
        _, _, term, *_ = env.step([np.zeros(len(env.action_space[0].low),
                                            np.float32)])
        if k < 6:
            assert not term
    assert term
