"""The reward_function constructor override must replace the schema's
reward entirely — including a per-building reward dict
(reference citylearn.py:2145-2152)."""

import json
import os

import numpy as np

from citylearn_tpu import CityLearnEnv

DATASETS = "/root/reference/data/datasets"


def _multi_reward_schema():
    path = f"{DATASETS}/citylearn_challenge_2021/schema.json"
    with open(path) as f:
        s = json.load(f)
    s["root_directory"] = os.path.dirname(path)
    names = [n for n, b in s["buildings"].items() if b.get("include", True)]
    s["reward_function"] = {
        "type": {names[0]: "citylearn.reward_function.SolarPenaltyReward",
                 "default": "citylearn.reward_function.RewardFunction"},
        "attributes": {"default": {}},
    }
    return s


def test_override_replaces_per_building_dict():
    schema = _multi_reward_schema()
    base = CityLearnEnv(schema, random_seed=0, episode_time_steps=8,
                        central_agent=False)
    over = CityLearnEnv(schema, random_seed=0, episode_time_steps=8,
                        central_agent=False,
                        reward_function="IndependentSACReward")
    assert over.cfg.reward_per_building is None
    assert over.cfg.reward_type == "IndependentSACReward"

    def run(env):
        env.reset()
        rews = []
        while not env.terminated:
            _, r, *_ = env.step([[0.2] * s.shape[0] for s in env.action_space])
            rews.append(r)
        return np.asarray(rews, float)

    r_base = run(base)
    r_over = run(over)
    # the dict dispatch and the override produce different rewards
    assert np.abs(r_base - r_over).max() > 1e-6
    # IndependentSACReward = min(-net, 0) -> never positive
    assert (r_over <= 1e-9).all()
