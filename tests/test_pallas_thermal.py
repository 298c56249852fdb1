"""The whole-episode Pallas thermal kernel must agree with the general
XLA scan path on its eligible configuration (cooling/DHW tanks + heat
pumps/heaters + battery, the 2021 challenge family; reference
``building.py:1641-1823``, ``energy_model.py:157-451,603-871,1027-1141``).

Runs in Pallas interpret mode on CPU; on real TPU hardware the same
dispatch is exercised by ``bench.py``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import (
    ACTION_KEYS,
    batched_initial_states,
    rollout_policy,
    rollout_scripted,
)

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2021/schema.json"

TABLES = {
    # OptimizedRBC-flavored storage maps (agents/rbc.py:250-327)
    "cooling_storage": np.where(np.arange(1, 25) < 7, 0.05532,
                                np.where(np.arange(1, 25) < 16, -0.02, 0.034)
                                ).astype(np.float32),
    "dhw_storage": np.full(24, 0.02, np.float32),
    "electrical_storage": np.where(np.arange(1, 25) < 9, 0.091, -0.08
                                   ).astype(np.float32),
}


@pytest.fixture(scope="module")
def env():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=168)
    cfg, params, _ = pack(spec)
    return cfg, params


def test_eligibility(env):
    cfg, _ = env
    assert rollout_fast.eligible_thermal(cfg)
    assert not rollout_fast.eligible(cfg)      # battery-only path stays off


def test_thermal_kernel_matches_xla_scan(env):
    cfg, params = env
    from citylearn_tpu.ops.pallas_thermal import TILE_D
    D = TILE_D
    S = cfg.time_steps - 1
    B = cfg.n_buildings

    hours = np.asarray(params.series.hour)[:S, 0]
    action_series = np.zeros((S, len(ACTION_KEYS), B), np.float32)
    for k, tbl in TABLES.items():
        action_series[:, ACTION_KEYS.index(k), :] = tbl[hours - 1][:, None]

    st1 = batched_initial_states(cfg, params, 1)
    st1 = jax.tree_util.tree_map(lambda x: x[0], st1)
    out_state, collected = jax.jit(lambda p, s, a: rollout_scripted(
        cfg, p, s, a, collect=True))(params, st1, jnp.asarray(action_series))
    xla_reward = np.asarray(collected["reward"]).sum(0)
    xla_cost = np.asarray(collected["cost"]).sum(0)
    xla_emission = np.asarray(collected["emission"]).sum(0)

    rew, cost, emis, csoc, dsoc, soc, eff, deg = \
        rollout_fast.run_thermal_episode(cfg, params, D, TABLES,
                                         interpret=True)
    rew, cost, emis = map(np.asarray, (rew, cost, emis))
    csoc, dsoc, soc = map(np.asarray, (csoc, dsoc, soc))

    np.testing.assert_array_equal(rew[0], rew[-1])   # identical copies
    # final carried state is bit-exact vs the scan path
    np.testing.assert_allclose(csoc[0], np.asarray(out_state.cooling_storage_soc),
                               rtol=0, atol=0)
    np.testing.assert_allclose(dsoc[0], np.asarray(out_state.dhw_storage_soc),
                               rtol=0, atol=0)
    np.testing.assert_allclose(soc[0], np.asarray(out_state.battery_soc),
                               rtol=0, atol=0)
    # episode accumulators tolerate float32 reassociation between programs
    np.testing.assert_allclose(rew[0], xla_reward, rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(cost[0], xla_cost, rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(emis[0], xla_emission, rtol=2e-6, atol=1e-4)
