"""In-graph batched evaluate() vs the host Gym-adapter evaluate()
(reference ``citylearn.py:1136-1323``): district 0 of a vectorized batch
must match the host KPI table."""

import os

import numpy as np
import jax.numpy as jnp

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core.evaluate import evaluate_districts
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import batched_initial_states, hour_rbc_policy
from citylearn_tpu.train import BatchedSAC, TrainConfig

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def _rbc_table():
    table = np.full(24, -0.08, np.float32)
    for h in list(range(22, 25)) + list(range(1, 9)):
        table[h - 1] = 0.091
    return table


def test_batched_evaluate_matches_host():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=240)
    cfg, params, _ = pack(spec)
    D = 8
    table = jnp.asarray(_rbc_table())
    states = batched_initial_states(cfg, params, D)
    out = evaluate_districts(cfg, params, states, hour_rbc_policy(table))

    assert out["district|ramping_average"].shape == (D,)
    assert out["building|cost_total"].shape == (D, cfg.n_buildings)
    # identical district copies -> identical KPI values
    for k, v in out.items():
        np.testing.assert_array_equal(np.asarray(v)[0], np.asarray(v)[-1])

    # host reference: Gym adapter stepping the same hour-RBC actions
    env = CityLearnEnv(SCHEMA, random_seed=0, central_agent=False,
                       episode_time_steps=240)
    env.reset()
    tbl = _rbc_table()
    while not env.terminated:
        hour = int(env.buildings[0].energy_simulation.hour[env.time_step])
        a = float(tbl[hour - 1])
        env.step([[a] for _ in range(cfg.n_buildings)])
    host = {f"{r.level}|{r.cost_function}|{r.name}":
            (np.nan if r.value is None else float(r.value))
            for r in env.evaluate().itertuples()}

    for k in ["electricity_consumption_total", "zero_net_energy",
              "carbon_emissions_total", "cost_total"]:
        for bi, b in enumerate(spec.buildings):
            got = float(np.asarray(out[f"building|{k}"])[0, bi])
            want = host[f"building|{k}|{b.name}"]
            assert abs(got - want) < 2e-5 * max(1.0, abs(want)), \
                f"{k}/{b.name}: {got} vs {want}"
    for k in ["ramping_average", "daily_one_minus_load_factor_average",
              "monthly_one_minus_load_factor_average", "daily_peak_average",
              "all_time_peak_average", "electricity_consumption_total",
              "cost_total", "carbon_emissions_total", "zero_net_energy"]:
        got = float(np.asarray(out[f"district|{k}"])[0])
        want = host[f"district|{k}|District"]
        assert abs(got - want) < 2e-5 * max(1.0, abs(want)), \
            f"district {k}: {got} vs {want}"


SCHEMA_2023 = ("/root/reference/data/datasets/"
               "citylearn_challenge_2023_phase_2_local_evaluation/schema.json")

ALL_BUILDING_KPIS = [
    "electricity_consumption_total", "zero_net_energy",
    "carbon_emissions_total", "cost_total",
    "discomfort_proportion", "discomfort_cold_proportion",
    "discomfort_hot_proportion",
    "discomfort_cold_delta_minimum", "discomfort_cold_delta_maximum",
    "discomfort_cold_delta_average",
    "discomfort_hot_delta_minimum", "discomfort_hot_delta_maximum",
    "discomfort_hot_delta_average",
    "one_minus_thermal_resilience_proportion",
    "power_outage_normalized_unserved_energy_total",
    "annual_normalized_unserved_energy_total",
]


def test_batched_evaluate_full_table_2023():
    """VERDICT r2 #5: the in-graph evaluator must cover the thermal +
    resilience KPIs (reference cost_function.py:224-388) — compare every
    building KPI row against the host table on an LSTM-dynamics dataset
    with power outages (partial-load baseline, citylearn.py:1194-1201)."""
    spec = compile_schema(SCHEMA_2023, random_seed=0, central_agent=False,
                          episode_time_steps=240)
    cfg, params, _ = pack(spec)
    table = jnp.asarray(np.where(np.arange(1, 25) < 12, 0.8, 0.4).astype(np.float32))
    states = batched_initial_states(cfg, params, 2)
    out = evaluate_districts(cfg, params, states,
                             hour_rbc_policy(table, "cooling_device"),
                             baseline_condition="_without_storage_and_partial_load")

    env = CityLearnEnv(SCHEMA_2023, random_seed=0, central_agent=False,
                       episode_time_steps=240)
    env.reset()
    tbl = np.asarray(table)
    while not env.terminated:
        hour = int(env.buildings[0].energy_simulation.hour[env.time_step])
        a = float(tbl[hour - 1])
        acts = []
        for b in env.spec.buildings:
            acts.append([a if n == "cooling_device" else 0.0
                         for n in b.active_actions])
        env.step(acts)
    host = {f"{r.level}|{r.cost_function}|{r.name}":
            (np.nan if r.value is None else float(r.value))
            for r in env.evaluate().itertuples()}

    for k in ALL_BUILDING_KPIS:
        for bi, b in enumerate(spec.buildings):
            got = float(np.asarray(out[f"building|{k}"])[0, bi])
            want = host[f"building|{k}|{b.name}"]
            if np.isnan(want):
                assert np.isnan(got), f"{k}/{b.name}: expected NaN got {got}"
            else:
                assert abs(got - want) < 2e-4 * max(1.0, abs(want)), \
                    f"{k}/{b.name}: {got} vs {want}"
        got_d = float(np.asarray(out[f"district|{k}"])[0])
        want_d = host[f"district|{k}|District"]
        if np.isnan(want_d):
            assert np.isnan(got_d)
        else:
            assert abs(got_d - want_d) < 2e-4 * max(1.0, abs(want_d)), \
                f"district {k}: {got_d} vs {want_d}"


SCHEMA_OCC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden/quebec_occ/schema.json")


def test_batched_evaluate_occupant_full_table():
    """VERDICT r3 #6: the batched evaluator's final-unwritten-row occupant
    setpoint patch (kpi_table final_state) vs the host path
    (envs/environment._sync_unwritten_row) on the synthesized quebec_occ
    dataset — every building KPI row compared."""
    import jax

    S_STEPS = 168
    env = CityLearnEnv(SCHEMA_OCC, random_seed=0,
                       episode_time_steps=S_STEPS)
    assert env.cfg.has_occupant
    env.reset()
    rng = np.random.RandomState(7)
    taken = []
    while not env.terminated:
        acts = [list(rng.uniform(sp.low, sp.high).astype(float))
                for sp in env.action_space]
        env.step(acts)
        taken.append(np.concatenate([np.asarray(a) for a in acts]))
    host = {f"{r.level}|{r.cost_function}|{r.name}":
            (np.nan if r.value is None else float(r.value))
            for r in env.evaluate().itertuples()}
    # the patch only matters when an override is live at the final row —
    # guard against silently-inert occupants
    assert np.isfinite(np.asarray(env._state.occ_csp_override)).any() or \
        np.isfinite(np.asarray(env._state.occ_hsp_override)).any(), \
        "no live occupant override at episode end; test would be vacuous"

    cfg, params = env.cfg, env.params
    # replay the identical per-step actions through the batched path
    plan = jnp.asarray(np.stack(taken))                    # (S, B) heating_device
    zero = jnp.zeros((cfg.n_buildings,), jnp.float32)

    def policy(params, st):
        row = jnp.take(plan, st.t, axis=0)
        return {k: (row if k == "heating_device" else zero)
                for k in ("cooling_storage", "heating_storage", "dhw_storage",
                          "electrical_storage", "cooling_device",
                          "heating_device", "cooling_or_heating_device")}

    states = batched_initial_states(cfg, params, 2)
    out = evaluate_districts(
        cfg, params, states, policy,
        baseline_condition="_without_storage_and_partial_load")

    for k in ALL_BUILDING_KPIS:
        for bi, b in enumerate(env.spec.buildings):
            got = float(np.asarray(out[f"building|{k}"])[0, bi])
            want = host[f"building|{k}|{b.name}"]
            if np.isnan(want):
                assert np.isnan(got), f"{k}/{b.name}: expected NaN got {got}"
            else:
                assert abs(got - want) < 2e-4 * max(1.0, abs(want)), \
                    f"{k}/{b.name}: {got} vs {want}"


def test_trainer_evaluate_smoke():
    cfg = TrainConfig(n_districts=4, warmup_steps=4, batch_size=8,
                      replay_capacity=32, hidden=(32, 32))
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=48)
    tr.train(6, chunk=6)
    out = tr.evaluate()
    v = np.asarray(out["district|electricity_consumption_total"])
    assert v.shape == (4,) and np.isfinite(v).all()
