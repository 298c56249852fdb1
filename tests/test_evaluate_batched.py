"""In-graph batched evaluate() vs the host Gym-adapter evaluate()
(reference ``citylearn.py:1136-1323``): district 0 of a vectorized batch
must match the host KPI table."""

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


def test_trainer_evaluate_smoke():
    cfg = TrainConfig(n_districts=4, warmup_steps=4, batch_size=8,
                      replay_capacity=32, hidden=(32, 32))
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=48)
    tr.train(6, chunk=6)
    out = tr.evaluate()
    v = np.asarray(out["district|electricity_consumption_total"])
    assert v.shape == (4,) and np.isfinite(v).all()
