"""Live building/device view tests (reference Building property surface,
``citylearn/building.py``; series-length contract from
``tests/test_series_integrity.py:14-41``)."""

import numpy as np
import pytest

from citylearn_tpu import CityLearnEnv, EvaluationCondition
from citylearn_tpu.data import DataSet


SERIES_PROPS = [
    "net_electricity_consumption", "net_electricity_consumption_cost",
    "net_electricity_consumption_emission",
    "net_electricity_consumption_without_storage",
    "net_electricity_consumption_without_storage_and_pv",
    "cooling_electricity_consumption", "heating_electricity_consumption",
    "dhw_electricity_consumption", "non_shiftable_load_electricity_consumption",
    "solar_generation", "cooling_demand", "heating_demand", "dhw_demand",
    "non_shiftable_load", "energy_from_cooling_device",
    "energy_from_heating_device", "energy_from_dhw_device",
    "indoor_dry_bulb_temperature",
    "indoor_dry_bulb_temperature_cooling_set_point",
    "indoor_dry_bulb_temperature_heating_set_point",
]


@pytest.fixture(scope="module")
def env():
    e = CityLearnEnv("citylearn_challenge_2022_phase_1", episode_time_steps=24)
    e.reset()
    return e


def _zero_actions(env):
    return [np.zeros(s.shape[0], np.float32) for s in env.action_space]


def test_series_integrity(env):
    """Every per-building series has length t + 1 after reset and after
    each step (reference tests/test_series_integrity.py)."""
    env.reset()
    for k in range(6):
        for b in env.buildings:
            for prop in SERIES_PROPS:
                s = getattr(b, prop)
                assert len(s) == env.time_step + 1, (prop, k)
            for dev in (b.electrical_storage, b.cooling_storage,
                        b.heating_storage, b.dhw_storage):
                assert len(dev.soc) == env.time_step + 1
                assert len(dev.electricity_consumption) == env.time_step + 1
        env.step(_zero_actions(env))


def test_view_delegates_spec(env):
    b = env.buildings[0]
    assert b.name == env.spec.buildings[0].name
    assert b.active_observations == env.spec.buildings[0].active_observations
    assert b.electrical_storage.capacity == env.spec.buildings[0].battery.capacity
    assert b.pv.nominal_power == env.spec.buildings[0].pv_nominal_power


def test_counterfactual_matches_evaluate_series(env):
    """without_storage == net - storage/charger consumption."""
    env.reset()
    for _ in range(8):
        env.step([np.random.default_rng(0).uniform(-1, 1, s.shape[0]).astype(np.float32)
                  for s in env.action_space])
    for bi, b in enumerate(env.buildings):
        net = b.net_electricity_consumption.astype(np.float64)
        ws = b.net_electricity_consumption_without_storage
        batt = b.electrical_storage.electricity_consumption.astype(np.float64)
        np.testing.assert_allclose(ws, net - batt, rtol=1e-5, atol=1e-5)


def test_district_series(env):
    env.reset()
    env.step(_zero_actions(env))
    total = np.sum([b.net_electricity_consumption for b in env.buildings], axis=0)
    np.testing.assert_allclose(env.net_electricity_consumption, total, rtol=1e-6)


def test_observations_dict(env):
    b = env.buildings[0]
    d = b.observations()
    assert set(d.keys()) == set(b.active_observations)
    vec = env._building_observations()[0]
    np.testing.assert_allclose(list(d.values()), vec)


def test_building_spaces(env):
    b = env.buildings[0]
    assert b.observation_space.shape[0] == len(b.active_observations)
    assert b.action_space.shape[0] == len(b.active_actions)


def test_data_views(env):
    b = env.buildings[0]
    T = env.episode_tracker.episode_time_steps
    assert len(b.energy_simulation.cooling_demand) == T
    assert len(b.weather.outdoor_dry_bulb_temperature) == T
    assert len(b.pricing.electricity_pricing) == T
    assert len(b.carbon_intensity.carbon_intensity) == T
    with pytest.raises(AttributeError):
        b.energy_simulation.not_a_series


def test_evaluation_condition_enum(env):
    env.reset()
    for _ in range(4):
        env.step(_zero_actions(env))
    k1 = env.evaluate(control_condition=EvaluationCondition.WITH_STORAGE_AND_PV,
                      baseline_condition=EvaluationCondition.WITHOUT_STORAGE_BUT_WITH_PV)
    k2 = env.evaluate(control_condition="", baseline_condition="_without_storage")
    assert k1.equals(k2)
    # alias members resolve to identical values (reference citylearn.py:42-50)
    assert (EvaluationCondition.WITH_STORAGE_AND_PARTIAL_LOAD_AND_PV
            is EvaluationCondition.WITH_STORAGE_AND_PV)


def test_load_agent_default_and_explicit(env):
    ag = env.load_agent()
    assert type(ag).__name__ in ("Agent", "BasicRBC", "BaselineAgent", "SAC",
                                 "OptimizedRBC", "BasicBatteryRBC")
    ag2 = env.load_agent("citylearn.agents.rbc.BasicRBC")
    assert type(ag2).__name__ == "BasicRBC"
    from citylearn_tpu.agents.base import BaselineAgent
    ag3 = env.load_agent(BaselineAgent)
    assert type(ag3).__name__ == "BaselineAgent"


def test_named_dataset_constructor():
    e = CityLearnEnv("citylearn_challenge_2022_phase_1", episode_time_steps=4)
    assert e.time_steps == 4


def test_battery_degraded_capacity(env):
    env.reset()
    b = env.buildings[0]
    cap0 = b.electrical_storage.degraded_capacity
    assert cap0 == pytest.approx(b.electrical_storage.capacity, rel=1e-6)


def test_per_charger_views():
    """Building.electric_vehicle_chargers live views: per-charger
    electricity_consumption sums to the building aggregate
    (reference building.py:225-228,467-471)."""
    import numpy as np

    env = CityLearnEnv(
        "/root/reference/data/datasets/citylearn_challenge_2022_phase_all_plus_evs/schema.json",
        episode_time_steps=12, central_agent=False)
    env.reset()
    for _ in range(11):
        acts = []
        for i, sp in enumerate(env.action_space):
            a = np.zeros(len(sp.low), np.float32)
            for j, nm in enumerate(env.buildings[i].active_actions):
                if "electric_vehicle_storage" in nm:
                    a[j] = 0.5
            acts.append(a)
        env.step(acts)
    saw_charger = False
    for b in env.buildings:
        chargers = b.electric_vehicle_chargers
        agg = b.chargers_electricity_consumption
        assert agg.shape == (12,)
        if not chargers:
            assert np.all(agg == 0)
            continue
        saw_charger = True
        per = np.sum([ch.electricity_consumption for ch in chargers], axis=0)
        np.testing.assert_allclose(per, agg, atol=1e-5)
        for ch in chargers:
            assert ch.past_charging_action_values_kwh.shape == (12,)
            assert isinstance(ch.charger_id, str)
    assert saw_charger
