"""The whole-episode Pallas LSTM-dynamics kernel must agree with the
general XLA scan path on its eligible configuration (the 2023 challenge
family: partial-load cooling via the LSTM temperature model, DHW +
battery, ComfortReward; reference ``building.py:2804-3158``,
``dynamics.py:94-127``).

Runs in Pallas interpret mode on CPU; on real TPU hardware the same
dispatch is exercised by ``bench.py`` (c2023p1_lstm row)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.evaluate import collect_episode
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import ACTION_KEYS, batched_initial_states

SCHEMA = ("/root/reference/data/datasets/citylearn_challenge_2023_phase_1/"
          "schema.json")

TABLES = {
    "cooling_device": np.where(np.arange(1, 25) < 12, 0.8, 0.4
                               ).astype(np.float32),
    "dhw_storage": np.full(24, 0.05, np.float32),
    "electrical_storage": np.where(np.arange(1, 25) < 9, 0.091, -0.08
                                   ).astype(np.float32),
}


@pytest.fixture(scope="module")
def env():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False)
    cfg, params, _ = pack(spec)
    return cfg, params


def test_eligibility(env):
    cfg, params = env
    assert rollout_fast.eligible_lstm(cfg)
    assert rollout_fast.lstm_packable(cfg, params)
    assert not rollout_fast.eligible(cfg)
    assert not rollout_fast.eligible_thermal(cfg)


def test_lstm_kernel_matches_xla_scan(env):
    cfg, params = env
    from citylearn_tpu.ops.pallas_lstm import R_NET, R_REWARD, R_TEMP, TILE_D
    D = TILE_D
    S = cfg.time_steps - 1
    B = cfg.n_buildings

    hours = np.asarray(params.series.hour)[:S, 0]
    plans = {k: jnp.asarray(np.tile(tbl[hours - 1][:, None], (1, B)))
             for k, tbl in TABLES.items()}
    zero = jnp.zeros((B,), jnp.float32)

    def policy(params, st):
        return {k: (jnp.take(plans[k], st.t, axis=0) if k in plans else zero)
                for k in ACTION_KEYS}

    st1 = batched_initial_states(cfg, params, 1)
    st1 = jax.tree_util.tree_map(lambda x: x[0], st1)
    out_state, collected = jax.jit(
        lambda p, s: collect_episode(cfg, p, s, policy, S))(params, st1)

    out = rollout_fast.run_lstm_episode(cfg, params, D, TABLES,
                                        interpret=True, record_series=True)
    (rew, cost, emis, csoc, dsoc, soc, eff, deg, temp, rec) = out
    rew, cost, emis = map(np.asarray, (rew, cost, emis))
    np.testing.assert_array_equal(rew[0], rew[-1])   # identical copies

    # final carried state bit-exact vs the scan path
    np.testing.assert_allclose(np.asarray(csoc)[0],
                               np.asarray(out_state.cooling_storage_soc),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(dsoc)[0],
                               np.asarray(out_state.dhw_storage_soc),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(soc)[0],
                               np.asarray(out_state.battery_soc),
                               rtol=0, atol=0)

    # per-step recorded series vs the XLA collect (the LSTM temperature
    # path is float32 matmul-order sensitive: tolerance, not bit-equality)
    rec = np.asarray(rec)
    net_x = np.asarray(collected["net"])
    temp_x = np.asarray(collected["indoor_t"])
    np.testing.assert_allclose(rec[R_NET][:, :B], net_x, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(rec[R_TEMP][:, :B], temp_x, rtol=2e-4,
                               atol=2e-3)
    # the temperature prediction must actually engage (not inert data)
    ideal = np.asarray(params.series.indoor_dry_bulb_temperature)[:S]
    assert np.abs(temp_x - ideal).max() > 0.1
    assert np.abs(rec[R_TEMP][:, :B] - ideal).max() > 0.1

    # episode accumulators
    x_rew = np.asarray(
        jax.jit(lambda p, s: _reward_sum(cfg, p, s, policy, S))(params, st1))
    np.testing.assert_allclose(rew[0], x_rew, rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(cost[0], np.asarray(collected["cost"]).sum(0),
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(emis[0],
                               np.asarray(collected["emission"]).sum(0),
                               rtol=2e-5, atol=1e-3)


def test_lstm_kernel_heterogeneous_baeda():
    """The kernel's block-diagonal packing handles HETEROGENEOUS dynamics
    groups — baeda_3dem mixes a 2-layer/H=8 group (3 buildings) with a
    1-layer/H=50 group (1 building) — against the XLA scan path."""
    schema = "/root/reference/data/datasets/baeda_3dem/schema.json"
    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=168)
    cfg, params = __import__("citylearn_tpu.core.params",
                             fromlist=["pack"]).pack(spec)[:2]
    assert len(cfg.dyn_groups) == 2
    assert rollout_fast.lstm_packable(cfg, params)
    from citylearn_tpu.ops.pallas_lstm import R_NET, R_TEMP, TILE_D
    D = TILE_D
    S = cfg.time_steps - 1
    B = cfg.n_buildings

    tables = {
        "cooling_device": TABLES["cooling_device"],
        "cooling_storage": np.where(np.arange(1, 25) < 7, 0.05, -0.03
                                    ).astype(np.float32),
        "dhw_storage": np.full(24, 0.05, np.float32),
    }
    hours = np.asarray(params.series.hour)[:S, 0]
    plans = {k: jnp.asarray(np.tile(tbl[hours - 1][:, None], (1, B)))
             for k, tbl in tables.items()}
    zero = jnp.zeros((B,), jnp.float32)

    def policy(params, st):
        return {k: (jnp.take(plans[k], st.t, axis=0) if k in plans else zero)
                for k in ACTION_KEYS}

    st1 = batched_initial_states(cfg, params, 1)
    st1 = jax.tree_util.tree_map(lambda x: x[0], st1)
    out_state, collected = jax.jit(
        lambda p, s: collect_episode(cfg, p, s, policy, S))(params, st1)

    out = rollout_fast.run_lstm_episode(cfg, params, D, tables,
                                        interpret=True, record_series=True)
    rec = np.asarray(out[-1])
    np.testing.assert_allclose(np.asarray(out[3])[0],
                               np.asarray(out_state.cooling_storage_soc),
                               rtol=0, atol=0)
    np.testing.assert_allclose(rec[R_NET][:, :B],
                               np.asarray(collected["net"]),
                               rtol=2e-4, atol=2e-3)
    temp_x = np.asarray(collected["indoor_t"])
    np.testing.assert_allclose(rec[R_TEMP][:, :B], temp_x, rtol=2e-4,
                               atol=5e-3)
    # both groups' predictions must engage
    ideal = np.asarray(params.series.indoor_dry_bulb_temperature)[:S]
    dev = np.abs(temp_x - ideal)
    assert dev[:, :3].max() > 0.05 and dev[:, 3].max() > 0.05


def test_lstm_kernel_outage_2023p2():
    """Power-outage support (the 2023 phase-2/3 evaluation sets): the
    downward-electrical-flexibility coupling, early/late battery
    variants, flex-capped non-shiftable load and outage-zeroed net must
    match the XLA scan with REAL outage events in the horizon."""
    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2023_phase_2_local_evaluation/schema.json")
    spec = compile_schema(schema, random_seed=0, central_agent=False)
    from citylearn_tpu.core.params import pack as _pack
    cfg, params, _ = _pack(spec)
    assert cfg.any_outage and rollout_fast.lstm_packable(cfg, params)
    from citylearn_tpu.ops.pallas_lstm import (
        R_NET, R_NSLMET, R_TEMP, TILE_D)
    D = TILE_D
    S = cfg.time_steps - 1
    B = cfg.n_buildings
    outage = np.asarray(params.series.power_outage)[:S]
    assert outage.sum() > 0, "no outage events in horizon; test vacuous"

    hours = np.asarray(params.series.hour)[:S, 0]
    plans = {k: jnp.asarray(np.tile(tbl[hours - 1][:, None], (1, B)))
             for k, tbl in TABLES.items()}
    zero = jnp.zeros((B,), jnp.float32)

    def policy(params, st):
        return {k: (jnp.take(plans[k], st.t, axis=0) if k in plans else zero)
                for k in ACTION_KEYS}

    st1 = batched_initial_states(cfg, params, 1)
    st1 = jax.tree_util.tree_map(lambda x: x[0], st1)
    out_state, collected = jax.jit(
        lambda p, s: collect_episode(cfg, p, s, policy, S))(params, st1)

    out = rollout_fast.run_lstm_episode(cfg, params, D, TABLES,
                                        interpret=True, record_series=True)
    rec = np.asarray(out[-1])
    np.testing.assert_allclose(np.asarray(out[5])[0],
                               np.asarray(out_state.battery_soc),
                               rtol=0, atol=0)
    net_x = np.asarray(collected["net"])
    np.testing.assert_allclose(rec[R_NET][:, :B], net_x, rtol=2e-4, atol=2e-3)
    # outage steps force net to zero on both paths
    mask = outage > 0
    assert mask.any()
    np.testing.assert_array_equal(rec[R_NET][:, :B][mask], 0.0)
    np.testing.assert_array_equal(net_x[mask], 0.0)
    # flex-capped non-shiftable load engages (served < demand somewhere)
    nsl = np.asarray(params.series.non_shiftable_load)[:S]
    assert (rec[R_NSLMET][:, :B][mask] < nsl[mask] - 1e-6).any()
    np.testing.assert_allclose(rec[R_TEMP][:, :B],
                               np.asarray(collected["indoor_t"]),
                               rtol=2e-4, atol=5e-3)


def _reward_sum(cfg, params, state, policy, S):
    from citylearn_tpu.core.step import district_step

    def body(st, _):
        st, out = district_step(cfg, params, st, policy(params, st))
        return st, out.reward

    _, rews = jax.lax.scan(body, state, None, length=S)
    return rews.sum(0)
