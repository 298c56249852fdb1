"""Every bundled dataset constructs, steps and evaluates (mirrors the
reference's manual sweep, ``tests/scripts/compatibility_test.py``)."""

import numpy as np
import pytest

from citylearn_tpu import CityLearnEnv
from citylearn_tpu.data import DataSet

NAMES = DataSet().get_dataset_names()


@pytest.mark.parametrize("name", NAMES)
def test_dataset_compatibility(name):
    env = CityLearnEnv(DataSet().get_schema_path(name), episode_time_steps=26)
    env.reset()
    rng = np.random.RandomState(0)
    terminated = False
    while not terminated:
        acts = [list(rng.uniform(s.low, s.high).astype(float))
                for s in env.action_space]
        obs, r, terminated, truncated, _ = env.step(acts)
        assert all(np.isfinite(np.asarray(o, float)).all() for o in obs), name
        assert np.isfinite(np.asarray(r, float)).all(), name
    kpis = env.evaluate()
    assert len(kpis) > 0
