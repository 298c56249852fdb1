"""Agent behavior tests: RBC parity vs a reference rollout, agent loop."""

import os

import numpy as np
import pytest

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.agents import BasicRBC, BaselineAgent

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def test_basic_rbc_kpi_parity():
    env = CityLearnEnv(SCHEMA, central_agent=False, episode_time_steps=168,
                       random_seed=0)
    agent = BasicRBC(env)
    agent.learn(episodes=1)
    kpis = env.evaluate()
    ours = {f"{r.level}|{r.name}|{r.cost_function}":
            (np.nan if r.value is None else float(r.value))
            for r in kpis.itertuples()}
    g = np.load(os.path.join(GOLDEN, "rbc_phase1_168.npz"))
    for key, expected in zip([str(s) for s in g["kpi_names"]], g["kpi_values"]):
        got = ours[key]
        if np.isnan(expected):
            assert np.isnan(got), key
        else:
            assert abs(got - expected) <= 2e-4 * max(1.0, abs(expected)), \
                f"{key}: {got} vs {expected}"


def test_baseline_agent_runs():
    env = CityLearnEnv(SCHEMA, central_agent=False, episode_time_steps=48,
                       random_seed=0)
    agent = BaselineAgent(env)
    agent.learn(episodes=1)
    kpis = env.evaluate()
    district = kpis[(kpis.level == "district")]
    # with no actions, control == baseline for district load KPIs
    for kf in ["ramping_average", "daily_peak_average", "all_time_peak_average"]:
        v = float(district[district.cost_function == kf].value.iloc[0])
        assert abs(v - 1.0) < 1e-5, (kf, v)
