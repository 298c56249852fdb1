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


def test_replay_stores_every_district():
    """The buffer must hold distinct transitions from >1 district (the
    round-1 trainer kept only district 0)."""
    cfg = TrainConfig(n_districts=4, warmup_steps=10, batch_size=16,
                      replay_capacity=64)
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=24)
    tr.train(6, chunk=6)
    acts = np.asarray(tr.state.replay_act[:6])       # (slots, D, A, M)
    # exploration actions are drawn with per-district noise -> rows differ
    assert acts.shape[1] == 4
    spread = np.ptp(acts, axis=1).max()
    assert spread > 1e-6, "districts produced identical replay rows"


def test_batched_sac_per_district_windows():
    """2021 has a 35040-step simulation range; 168-step episodes must get
    per-district window offsets (and per-district resets redraw them)."""
    schema = "/root/reference/data/datasets/citylearn_challenge_2021/schema.json"
    cfg = TrainConfig(n_districts=4, warmup_steps=10, batch_size=8,
                      replay_capacity=64)
    tr = BatchedSAC(schema, cfg, random_seed=0, episode_time_steps=168)
    assert tr.max_offset == 35040 - 168
    offs = np.asarray(tr.state.env_state.data_offset)
    assert len(np.unique(offs)) > 1, "districts share one episode window"
    hist = tr.train(4, chunk=4)
    assert np.isfinite(hist[0])


def test_batched_sac_heterogeneous_2023():
    """2023 phase 1 buildings expose different obs/action subsets; the
    padded/masked trainer must train them on-device."""
    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2023_phase_1/schema.json")
    cfg = TrainConfig(n_districts=2, warmup_steps=4, batch_size=8,
                      replay_capacity=32, hidden=(32, 32))
    tr = BatchedSAC(schema, cfg, random_seed=0, episode_time_steps=24)
    hist = tr.train(8, chunk=8)
    assert np.isfinite(hist[0])
    # padding must be real: masks exist and padded action dims stay 0
    mask = np.asarray(tr.act_mask)
    if (mask == 0).any():
        acts = np.asarray(tr.state.replay_act[:4])
        assert np.abs(acts[:, :, mask == 0]).max() == 0.0


def test_batched_sac_plus_evs():
    """plus_evs routes per-charger EV actions and washing-machine triggers
    through the trainer's einsum action routing."""
    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2022_phase_all_plus_evs/schema.json")
    cfg = TrainConfig(n_districts=2, warmup_steps=4, batch_size=8,
                      replay_capacity=32, hidden=(32, 32))
    tr = BatchedSAC(schema, cfg, random_seed=0, episode_time_steps=24)
    assert tr.w_ch is not None
    hist = tr.train(6, chunk=6)
    assert np.isfinite(hist[0])


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
