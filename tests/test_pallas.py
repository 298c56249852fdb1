"""The whole-episode Pallas battery kernel must agree with the general
XLA scan path bit-for-bit on its eligible configuration (battery+PV-only
districts, reference physics ``energy_model.py:719-768, 1027-1141``).

Runs in Pallas interpret mode on CPU; on real TPU hardware the same
comparison is exercised by ``bench.py`` (fast-path dispatch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import (
    batched_initial_states,
    hour_rbc_policy,
    rollout_policy,
    rollout_scripted,
)

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def _basic_rbc_table():
    table = np.full(24, -0.08, np.float32)
    for h in list(range(22, 25)) + list(range(1, 9)):
        table[h - 1] = 0.091
    return table


@pytest.fixture(scope="module")
def env():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=168)
    cfg, params, _ = pack(spec)
    return cfg, params


def test_eligibility(env):
    cfg, _ = env
    assert rollout_fast.eligible(cfg)


def test_kernel_matches_xla_scan(env):
    """Kernel reward/cost/emission sums and final battery state equal the
    XLA per-step scan's over a full episode (interpret mode)."""
    cfg, params = env
    D = rollout_fast.TILE_D
    table = _basic_rbc_table()
    S = cfg.time_steps - 1

    # XLA path: one district is enough (copies are identical by construction)
    states = batched_initial_states(cfg, params, 1)
    policy = hour_rbc_policy(jnp.asarray(table))

    def episode(params, state):
        return rollout_policy(cfg, params, state, S, policy)

    out_state, res = jax.jit(jax.vmap(episode, in_axes=(None, 0)))(params, states)
    # reward is (D, B) decentralized; recover cost/emission via collect run
    hours = np.asarray(params.series.hour)[:S, 0]
    acts = np.asarray(table)[hours - 1]
    B = cfg.n_buildings
    action_series = np.zeros((S, 7, B), np.float32)
    action_series[:, 3, :] = acts[:, None]            # electrical_storage slot
    st1 = batched_initial_states(cfg, params, 1)
    st1 = jax.tree_util.tree_map(lambda x: x[0], st1)
    _, collected = jax.jit(lambda p, s, a: rollout_scripted(
        cfg, p, s, a, collect=True))(params, st1, jnp.asarray(action_series))
    xla_cost = np.asarray(collected["cost"]).sum(0)
    xla_emission = np.asarray(collected["emission"]).sum(0)
    xla_reward = np.asarray(res["reward_sum"])[0]
    xla_soc = np.asarray(out_state.battery_soc)[0]

    rew, cost, emis, soc, eff, deg = rollout_fast.run_battery_episode(
        cfg, params, D, table, interpret=True)
    rew, cost, emis, soc = map(np.asarray, (rew, cost, emis, soc))

    # all districts are identical copies
    np.testing.assert_array_equal(rew[0], rew[-1])
    # final carried state is bit-exact; the episode accumulators tolerate
    # ulp-level (~1e-7 rel) float32 reassociation between the two programs
    np.testing.assert_allclose(soc[0], xla_soc, rtol=0, atol=0)
    np.testing.assert_allclose(rew[0], xla_reward, rtol=1e-6)
    np.testing.assert_allclose(cost[0], xla_cost, rtol=1e-6)
    np.testing.assert_allclose(emis[0], xla_emission, rtol=1e-6)
