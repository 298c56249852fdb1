"""Debug-mode physics assertions (SURVEY.md §5.2; reference inline
asserts ``building.py:1825-1834,657-665``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import debug
from citylearn_tpu.core.params import initial_state, pack
from citylearn_tpu.core.rollout import ACTION_KEYS, actions_dict_from_array
from citylearn_tpu.core.step import district_step

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


@pytest.fixture()
def env():
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=24)
    cfg, params, _ = pack(spec)
    return cfg, params


def _step_fn(cfg):
    def fn(params, state, acts):
        return district_step(cfg, params, state, actions_dict_from_array(acts))
    return jax.jit(fn)


def test_checks_pass_on_valid_rollout(env):
    cfg, params = env
    debug.enable_checks(True)
    try:
        fn = _step_fn(cfg)
        state = initial_state(cfg, params, 0)
        acts = jnp.full((len(ACTION_KEYS), cfg.n_buildings), 0.2, jnp.float32)
        for _ in range(5):
            state, out = fn(params, state, acts)
        assert np.isfinite(np.asarray(out.net_electricity_consumption)).all()
    finally:
        debug.enable_checks(False)


def test_checks_catch_corrupted_state(env):
    cfg, params = env
    debug.enable_checks(True)
    try:
        fn = _step_fn(cfg)
        state = initial_state(cfg, params, 0)
        state = state.replace(battery_soc=jnp.full_like(state.battery_soc, 2.5))
        acts = jnp.zeros((len(ACTION_KEYS), cfg.n_buildings), jnp.float32)
        with pytest.raises(Exception) as exc:
            st, out = fn(params, state, acts)
            jax.block_until_ready(out.net_electricity_consumption)
        assert "soc" in str(exc.value) or "physics" in str(exc.value) \
            or "PhysicsCheckError" in str(exc.value)
    finally:
        debug.enable_checks(False)


def test_checks_off_by_default(env):
    cfg, params = env
    assert not debug.checks_enabled()
    fn = _step_fn(cfg)
    state = initial_state(cfg, params, 0)
    # corrupted state sails through without checks (no callback compiled in)
    state = state.replace(battery_soc=jnp.full_like(state.battery_soc, 2.5))
    acts = jnp.zeros((len(ACTION_KEYS), cfg.n_buildings), jnp.float32)
    st, out = fn(params, state, acts)
    jax.block_until_ready(out.net_electricity_consumption)
