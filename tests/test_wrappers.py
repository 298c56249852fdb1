"""Wrapper parity vs reference golden traces."""

import os

import numpy as np

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.wrappers import (
    DiscreteSpaceWrapper,
    NormalizedSpaceWrapper,
    RLlibMultiAgentEnv,
    StableBaselines3Wrapper,
    TabularQLearningWrapper,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def test_sb3_normalized_parity():
    env = StableBaselines3Wrapper(NormalizedSpaceWrapper(
        CityLearnEnv(SCHEMA, central_agent=True, episode_time_steps=48,
                     random_seed=0)))
    obs, _ = env.reset()
    g = np.load(os.path.join(GOLDEN, "sb3_norm_obs_reset.npy"))
    assert obs.shape == g.shape, (obs.shape, g.shape)
    err = np.abs(np.asarray(obs, float) - g)
    assert err.max() < 2e-4, f"reset obs mismatch {err.max():.2e} at {err.argmax()}"

    a = np.full(env.action_space.shape, 0.75, np.float32)
    obs2, r, term, trunc, _ = env.step(a)
    g2 = np.load(os.path.join(GOLDEN, "sb3_norm_obs_step1.npy"))
    err2 = np.abs(np.asarray(obs2, float) - g2)
    assert err2.max() < 2e-4, f"step obs mismatch {err2.max():.2e} at {err2.argmax()}"
    with open(os.path.join(GOLDEN, "sb3_reward.txt")) as f:
        ref_r = float(f.read())
    assert abs(r - ref_r) < 2e-3 * max(1, abs(ref_r)), (r, ref_r)


def test_discrete_space_parity():
    """DiscreteSpaceWrapper vs reference golden (wrappers.py:241-392):
    MultiDiscrete spaces, unclamped right-inclusive digitize, linspace
    action undiscretization."""
    g = np.load(os.path.join(GOLDEN, "wrap_discrete.npz"))
    env = DiscreteSpaceWrapper(CityLearnEnv(
        SCHEMA, central_agent=False, episode_time_steps=48, random_seed=0))
    np.testing.assert_array_equal(
        np.concatenate([s.nvec for s in env.observation_space]), g["obs_nvec"])
    np.testing.assert_array_equal(
        np.concatenate([s.nvec for s in env.action_space]), g["act_nvec"])
    obs0, _ = env.reset()
    np.testing.assert_array_equal(np.asarray(obs0, np.int64), g["obs0"])
    obs1, r1, *_ = env.step([[7] * s.shape[0] for s in env.action_space])
    np.testing.assert_array_equal(np.asarray(obs1, np.int64), g["obs1"])
    np.testing.assert_allclose(np.asarray(r1, np.float64), g["rewards"],
                               rtol=0, atol=5e-4)


def test_tabular_q_learning_parity():
    """TabularQLearningWrapper vs reference golden (wrappers.py:393-515):
    cross-product Discrete index over n+1 digitize values, Discrete(n)
    actions expanded back through linspace bins."""
    g = np.load(os.path.join(GOLDEN, "wrap_tabularq.npz"))
    env = TabularQLearningWrapper(
        CityLearnEnv(SCHEMA, central_agent=False, episode_time_steps=48,
                     random_seed=0, active_observations=["hour"],
                     active_actions=["electrical_storage"]),
        default_observation_bin_size=12, default_action_bin_size=5)
    assert [s.n for s in env.observation_space] == list(g["obs_n"])
    assert [s.n for s in env.action_space] == list(g["act_n"])
    obs0, _ = env.reset()
    np.testing.assert_array_equal(np.asarray(obs0, np.int64), g["obs0"])
    obs1, r1, *_ = env.step([[3] for _ in env.action_space])
    np.testing.assert_array_equal(np.asarray(obs1, np.int64), g["obs1"])
    np.testing.assert_allclose(np.asarray(r1, np.float64), g["r1"],
                               rtol=0, atol=5e-4)
    obs2, r2, *_ = env.step([[0] for _ in env.action_space])
    np.testing.assert_array_equal(np.asarray(obs2, np.int64), g["obs2"])
    np.testing.assert_allclose(np.asarray(r2, np.float64), g["r2"],
                               rtol=0, atol=5e-4)


def test_rllib_multi_agent_env_protocol():
    """RLlibMultiAgentEnv dict protocol vs reference semantics
    (wrappers.py:664-856): agent_<i> keys, per-agent float32 obs, reward
    dict, __all__ terminated/truncated."""
    g = np.load(os.path.join(GOLDEN, "wrap_rllib_ma.npz"))
    env = RLlibMultiAgentEnv(
        {"env_kwargs": {"schema": SCHEMA, "episode_time_steps": 48,
                        "random_seed": 0}})
    obs0, info0 = env.reset()
    ids = [str(a) for a in g["agent_ids"]]
    assert sorted(obs0.keys()) == sorted(ids)
    assert set(info0.keys()) == set(ids)
    for i, a in enumerate(ids):
        assert obs0[a].dtype == np.float32
        np.testing.assert_allclose(np.asarray(obs0[a], np.float64),
                                   g["obs0"][i], rtol=0, atol=2e-4)
    acts = {a: np.full(np.asarray(env.action_space[a].low).shape, 0.25,
                       np.float32) for a in ids}
    obs1, r1, term, trunc, info = env.step(acts)
    assert term["__all__"] is False and trunc["__all__"] is False
    assert set(term.keys()) == set(ids) | {"__all__"}
    for i, a in enumerate(ids):
        np.testing.assert_allclose(np.asarray(obs1[a], np.float64),
                                   g["obs1"][i], rtol=0, atol=2e-4)
        assert abs(float(r1[a]) - float(g["rewards"][i])) < 5e-4
    # observation/action space dicts keyed by agent ids
    assert sorted(env.observation_space.keys()) == sorted(ids)
    assert sorted(env.action_space.keys()) == sorted(ids)
