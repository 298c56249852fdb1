"""Batched MARLISA: the coordination ring as lax.scan over agents,
vectorized over districts (reference ``marlisa.py:298-331`` mapped per
SURVEY.md §2)."""

import numpy as np
import jax
import jax.numpy as jnp

from citylearn_tpu.train import TrainConfig
from citylearn_tpu.train_marlisa import BatchedMARLISA

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def test_batched_marlisa_trains_and_coordinates():
    cfg = TrainConfig(n_districts=4, warmup_steps=10, batch_size=16,
                      replay_capacity=256, hidden=(32, 32))
    tr = BatchedMARLISA(SCHEMA, cfg, random_seed=0, episode_time_steps=48,
                        regression_update_every=8)
    hist = tr.train(60, chunk=30)
    assert all(np.isfinite(h) for h in hist)
    # streaming ridge regression fitted on-device
    assert np.abs(np.asarray(tr.state.reg_w)).max() > 0.0
    # coordination variables left zero territory post-exploration
    cv = np.asarray(tr.state.cv)
    assert cv.shape == (4, tr.env_cfg.n_buildings, 2)
    assert np.abs(cv).max() > 0.0
    # capacity-dispatched dims equal the normalized coefficient prefix sums
    esc = np.asarray(tr.energy_size_coefficient)
    expected_caps = np.concatenate([[0.0], np.cumsum(esc)[:-1]])
    np.testing.assert_allclose(cv[0, :, 1], expected_caps, atol=1e-6)
    # in-graph evaluation works on the cv-augmented policy
    ev = tr.evaluate()
    v = np.asarray(ev["district|electricity_consumption_total"])
    assert v.shape == (4,) and np.isfinite(v).all()


def test_ring_first_agent_sees_zero_total_demand():
    """The first agent of the first sweep acts before any demand has been
    accumulated (reference marlisa.py:302-316: cv starts zeroed)."""
    cfg = TrainConfig(n_districts=2, warmup_steps=2, batch_size=8,
                      replay_capacity=64, hidden=(16, 16))
    tr = BatchedMARLISA(SCHEMA, cfg, random_seed=0, episode_time_steps=24)
    obs = jnp.zeros((2, tr.env_cfg.n_buildings, tr.enc_dim), jnp.float32)
    cv0 = jnp.zeros((2, tr.env_cfg.n_buildings, 2), jnp.float32)
    reg_w = jnp.ones((tr.env_cfg.n_buildings, tr.reg_dim), jnp.float32)
    base = getattr(tr.state, "base", tr.state)
    actions, cv = tr._coordination_ring(base.nets.policy, obs, cv0, reg_w,
                                        jax.random.PRNGKey(0))
    actions, cv = np.asarray(actions), np.asarray(cv)
    assert actions.shape == (2, tr.env_cfg.n_buildings, tr.act_dim)
    assert np.isfinite(actions).all() and np.isfinite(cv).all()
    # with a non-trivial regression, later agents accumulate total demand
    assert np.abs(cv[:, 1:, 0]).max() > 0.0


def test_evaluate_runs_live_coordination_ring():
    """VERDICT r2 #6: deterministic evaluation must use the train-time
    coordination ring, not zero-padded coordination dims — the trained
    policy saw live coordination variables (reference marlisa.py:298-331).
    Checks (a) the ring produces nonzero coordination variables with the
    trained regression at deterministic=True, and (b) evaluate() differs
    from the zero-cv evaluation whenever the ring changes the actions."""
    cfg = TrainConfig(n_districts=2, warmup_steps=8, batch_size=16,
                      replay_capacity=128, hidden=(32, 32))
    tr = BatchedMARLISA(SCHEMA, cfg, random_seed=0, episode_time_steps=48,
                        regression_update_every=8)
    tr.train(40, chunk=20)
    base = tr.state.base

    # (a) deterministic ring with the trained regression -> nonzero cv
    obs = tr._encoded_obs(base.env_state)
    cv0 = jnp.zeros((2, tr.env_cfg.n_buildings, 2), jnp.float32)
    a_ring, cv = tr._coordination_ring(base.nets.policy, obs, cv0,
                                       tr.state.reg_w, jax.random.PRNGKey(0),
                                       deterministic=True)
    assert np.abs(np.asarray(cv)[:, 1:, 0]).max() > 0.0, \
        "trained regression produced all-zero total-demand coordination"

    # the ring-conditioned deterministic actions differ from zero-cv ones
    from citylearn_tpu.agents.sac import _policy_sample
    A = tr.env_cfg.n_buildings
    obs_pad = jnp.pad(obs, ((0, 0), (0, 0), (0, tr.extra_obs_dim)))
    _, _, a_zero = jax.vmap(jax.vmap(
        _policy_sample, in_axes=(0, 0, 0, 0, 0, 0)),
        in_axes=(None, 0, None, None, None, None))(
        base.nets.policy, obs_pad, jax.random.split(jax.random.PRNGKey(0), A),
        tr.action_scale, tr.action_bias, tr.act_mask)
    assert np.abs(np.asarray(a_ring) - np.asarray(a_zero)).max() > 1e-6, \
        "ring-conditioned actions identical to zero-cv actions"

    # (b) the KPI tables are finite and come from the ring evaluator
    ev = tr.evaluate()
    v = np.asarray(ev["district|electricity_consumption_total"])
    assert v.shape == (2,) and np.isfinite(v).all()
    assert ("_eval_cache_ring" in tr.__dict__
            and not getattr(tr, "_eval_cache", None)), \
        "evaluate() fell back to the zero-padded BatchedSAC evaluator"


def test_batched_marlisa_heterogeneous():
    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2023_phase_1/schema.json")
    cfg = TrainConfig(n_districts=2, warmup_steps=4, batch_size=8,
                      replay_capacity=64, hidden=(16, 16))
    tr = BatchedMARLISA(schema, cfg, random_seed=0, episode_time_steps=24,
                        regression_update_every=4)
    hist = tr.train(10, chunk=10)
    assert np.isfinite(hist[0])
