"""Wrapper parity vs reference golden traces."""

import os

import numpy as np

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.wrappers import NormalizedSpaceWrapper, StableBaselines3Wrapper

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
