"""Dataset-generation pipeline (reference ``end_use_load_profiles``):
stage semantics + the full build() against the synthetic RC backend."""

import numpy as np
import pytest

from citylearn_tpu.end_use_load_profiles.build import (
    RCSimulator,
    expand_weather,
    get_multipliers,
    optimal_clusters,
    sample_buildings,
    single_load_per_time_step,
)
from citylearn_tpu.end_use_load_profiles.neighborhood import Neighborhood


def test_multipliers_reference_semantics():
    """simulate.py:168-173: U(min,max) gated to 1.0 with prob 1-p,
    deterministic per seed."""
    m = get_multipliers(10000, random_seed=3)
    m2 = get_multipliers(10000, random_seed=3)
    np.testing.assert_array_equal(m, m2)
    assert (m >= 0.3).all() and (m <= 1.7).all()
    frac_perturbed = float((m != 1.0).mean())
    assert 0.55 < frac_perturbed < 0.65      # probability = 0.6
    # exact replication of the reference formula
    nprs = np.random.RandomState(3)
    ref = nprs.uniform(0.3, 1.7, 10000)
    ref[nprs.random(10000) > 0.6] = 1.0
    np.testing.assert_array_equal(m, ref)


def test_single_load_per_time_step():
    c, h = single_load_per_time_step([2.0, 0.5, 1.0], [1.0, 3.0, 1.0])
    np.testing.assert_array_equal(c, [2.0, 0.0, 1.0])
    np.testing.assert_array_equal(h, [0.0, 3.0, 1.0])


def test_expand_weather_prediction_channels():
    """neighborhood.py:571-609: rolled channels with additive temperature
    noise and multiplicative, clipped noise elsewhere."""
    sim = RCSimulator(random_seed=0)
    w = sim.weather(200)
    out = expand_weather(w, random_seed=0)
    assert out.shape[1] == 16
    rolled = np.roll(w["outdoor_dry_bulb_temperature"].to_numpy(), -6)
    diff = np.abs(out["outdoor_dry_bulb_temperature_predicted_1"].to_numpy()
                  - rolled)
    assert diff.max() <= 0.3 + 1e-6          # accuracy[0] for temperature
    assert (out["direct_solar_irradiance_predicted_3"] >= 0).all()
    assert (out["outdoor_relative_humidity_predicted_2"] <= 100).all()


def test_cluster_and_sample():
    rs = np.random.RandomState(0)
    profiles = np.concatenate([rs.normal(0, 0.1, (6, 24)),
                               rs.normal(5, 0.1, (6, 24))])
    k, scores, labels = optimal_clusters(profiles, random_seed=0)
    assert k >= 2 and len(labels) == 12
    # the two synthetic groups never share a cluster
    assert set(labels[:6]).isdisjoint(set(labels[6:]))
    ids, lab, meta = sample_buildings(profiles, list(range(12)),
                                      sample_count=5, random_seed=0)
    assert len(ids) == 5 and all(0 <= i < 12 for i in ids)


def test_build_end_to_end(tmp_path):
    """build(): sample -> ideal+partial sims -> LSTM training -> dataset
    emission -> the generated schema loads and runs in CityLearnEnv."""
    nb = Neighborhood()
    result = nb.build(str(tmp_path), sample_count=2, n_time_steps=240,
                      partial_loads_simulations=2,
                      lstm_kwargs=dict(epochs=8), random_seed=0)
    assert result.schema_filepath.endswith("schema.json")
    assert len(result.bldg_ids) == 2
    assert result.lstm_models and "l_linear.weight" in result.lstm_models[0]
    ev = result.citylearn_simulation_test_evaluation
    vals = ev[ev.level == "district"]["value"].to_numpy(float)
    assert np.isfinite(vals[~np.isnan(vals)]).all()

    # the generated LSTM dynamics respond to partial-load control:
    # different cooling_device actions -> different indoor temperatures
    from citylearn_tpu import CityLearnEnv

    def run(action):
        env = CityLearnEnv(result.schema_filepath, episode_time_steps=48,
                           random_seed=0)
        env.reset()
        while not env.terminated:
            acts = []
            for s, names in zip(env.action_space, env.action_names):
                a = [action if n == "cooling_device" else 0.0 for n in names]
                acts.append(a)
            obs, *_ = env.step(acts)
        return np.asarray(env.buildings[0].energy_simulation
                          .indoor_dry_bulb_temperature[-24:], float)

    t_off = run(0.0)
    t_full = run(1.0)
    assert np.isfinite(t_off).all() and np.isfinite(t_full).all()
    assert np.abs(t_off - t_full).max() > 1e-3
