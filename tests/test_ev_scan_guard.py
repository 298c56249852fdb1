"""Library-level guard for the EV charger-scan TPU worker crash
(VERDICT r4 #6): charger-bearing configs at D > EV_SCAN_SAFE_D must be
chunked transparently (with a warning) by rollout_districts and
evaluate_districts instead of launching the crashing program.

The chunk/concat mechanics are tested here on CPU with a shrunken safe-D;
the real D=2048 run on TPU is exercised by bench.py's evs_chargers_wm
scan fallback (tools/ev_repro.py remains the upstream bisect repro)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import (
    batched_initial_states,
    hour_rbc_policy,
    rollout_districts,
)

SCHEMA = ("/root/reference/data/datasets/"
          "citylearn_challenge_2022_phase_all_plus_evs/schema.json")


@pytest.fixture(scope="module")
def env():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=24)
    return pack(spec)[:2]


def test_chunked_rollout_matches_single_launch(env, monkeypatch):
    cfg, params = env
    assert cfg.has_evs
    policy = hour_rbc_policy(jnp.asarray(np.full(24, 0.05, np.float32)))
    states = batched_initial_states(cfg, params, 5)

    ref_state, ref_out = rollout_districts(cfg, params, states, 23, policy)

    monkeypatch.setattr(rollout, "EV_SCAN_SAFE_D", 2)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.warns(RuntimeWarning, match="chunking the EV episode"):
        st, out = rollout_districts(cfg, params, states, 23, policy)
    np.testing.assert_allclose(np.asarray(out["reward_sum"]),
                               np.asarray(ref_out["reward_sum"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.ev_soc),
                               np.asarray(ref_state.ev_soc),
                               rtol=1e-6, atol=1e-6)
    assert st.t.shape == (5,)


def test_chunked_evaluate_districts(env, monkeypatch):
    from citylearn_tpu.core.evaluate import evaluate_districts

    cfg, params = env
    policy = hour_rbc_policy(jnp.asarray(np.full(24, 0.05, np.float32)))
    states = batched_initial_states(cfg, params, 3)
    ref = evaluate_districts(cfg, params, states, policy)

    monkeypatch.setattr(rollout, "EV_SCAN_SAFE_D", 2)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.warns(RuntimeWarning, match="chunking EV evaluate"):
        table = evaluate_districts(cfg, params, states, policy)
    assert set(table) == set(ref)
    for k in ref:
        assert np.asarray(table[k]).shape[0] == 3
        np.testing.assert_allclose(np.asarray(table[k]),
                                   np.asarray(ref[k]), rtol=1e-6,
                                   atol=1e-6, equal_nan=True, err_msg=k)


def test_no_chunking_off_tpu(env):
    cfg, _ = env
    assert not rollout._ev_scan_chunked(cfg, 4096)   # CPU backend here


def test_dynamics_scan_guard(monkeypatch):
    """Large LSTM-dynamics scans are guarded too: the 100-building
    alameda year scan crashes the TPU worker at D=512 (D=256 clean),
    so >=20-building dynamics configs chunk to DYN_SCAN_SAFE_D."""
    from citylearn_tpu.core.evaluate_fast import kernel_family

    spec = compile_schema(
        "/root/reference/data/datasets/ca_alameda_county_neighborhood/"
        "schema.json", random_seed=0, episode_time_steps=24)
    cfg, _ = pack(spec)[:2]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert rollout._ev_scan_chunked(cfg, 512)
    assert not rollout._ev_scan_chunked(cfg, 256)
    assert rollout._scan_safe_chunk(cfg) == rollout.DYN_SCAN_SAFE_D
    # small-B dynamics configs (2023 family) stay unguarded
    spec2 = compile_schema(
        "/root/reference/data/datasets/citylearn_challenge_2023_phase_1/"
        "schema.json", random_seed=0, episode_time_steps=24)
    cfg2, _ = pack(spec2)[:2]
    assert not rollout._ev_scan_chunked(cfg2, 2048)
