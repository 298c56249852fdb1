"""Batched trainer: on-device SAC over vectorized districts + mesh sharding."""

import numpy as np

from citylearn_tpu.parallel import district_mesh
from citylearn_tpu.train import BatchedSAC, TrainConfig

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def test_batched_sac_trains():
    cfg = TrainConfig(n_districts=4, warmup_steps=10, batch_size=16,
                      replay_capacity=512)
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=48)
    hist = tr.train(60, chunk=30)
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist)


def test_batched_sac_sharded():
    mesh = district_mesh()     # all virtual CPU devices (conftest forces 8)
    n = len(mesh.devices.ravel())
    cfg = TrainConfig(n_districts=2 * n, warmup_steps=4, batch_size=8,
                      replay_capacity=64)
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=12, mesh=mesh)
    hist = tr.train(8, chunk=8)
    assert np.isfinite(hist[0])


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(n_districts=2, warmup_steps=2, batch_size=8,
                      replay_capacity=64)
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=12)
    tr.train(4, chunk=4)
    p = tmp_path / "nets.pkl"
    tr.save(str(p))
    before = np.asarray(tr.state.nets.policy["mean"]["w"])
    tr.load(str(p))
    after = np.asarray(tr.state.nets.policy["mean"]["w"])
    np.testing.assert_array_equal(before, after)


def test_orbax_full_state_resume(tmp_path):
    """Full-TrainState checkpoint (env + replay + RNG + step) resumes
    bit-exactly: train A->checkpoint->train B, restore->train B' == B."""
    cfg = TrainConfig(n_districts=2, warmup_steps=2, batch_size=8,
                      replay_capacity=64)
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=12)
    tr.train(4, chunk=4)
    ckpt = str(tmp_path / "ckpt")
    tr.save_checkpoint(ckpt)
    hist1 = tr.train(4, chunk=4)
    w1 = np.asarray(tr.state.nets.policy["mean"]["w"])

    tr.restore_checkpoint(ckpt)
    assert int(tr.state.step) == 4
    hist2 = tr.train(4, chunk=4)
    w2 = np.asarray(tr.state.nets.policy["mean"]["w"])
    assert hist1 == hist2
    np.testing.assert_array_equal(w1, w2)
