"""Closed-loop kernel collect (ops/pallas_collect.py + train.py) must
reproduce the per-step scan collect: same RNG chain, same transitions,
same battery state — interpret mode on CPU (the TPU path is exercised by
``bench.py``'s ``sac_train_step`` row at D=4096)."""

import numpy as np
import pytest

from citylearn_tpu.train import BatchedSAC, TrainConfig

SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"
D = 128      # one district lane-tile


def _pair(warmup, n_steps, episode_time_steps=48, chunk=None, **kw):
    base = dict(n_districts=D, warmup_steps=warmup, batch_size=32,
                replay_capacity=D * 32, hidden=(16, 16))
    base.update(kw)
    scan = BatchedSAC(SCHEMA, TrainConfig(collect="scan", **base),
                      random_seed=0, episode_time_steps=episode_time_steps)
    kern = BatchedSAC(SCHEMA, TrainConfig(collect="kernel", **base),
                      random_seed=0, episode_time_steps=episode_time_steps)
    assert kern.use_kernel_collect and not scan.use_kernel_collect
    ch = chunk or n_steps
    scan.train(n_steps, chunk=ch)
    kern.train(n_steps, chunk=ch)
    return scan, kern


def _assert_state_matches(scan, kern, atol):
    s, k = scan.state, kern.state
    np.testing.assert_array_equal(np.asarray(s.key), np.asarray(k.key))
    assert int(s.step) == int(k.step)
    np.testing.assert_array_equal(np.asarray(s.env_state.t),
                                  np.asarray(k.env_state.t))
    np.testing.assert_array_equal(np.asarray(s.env_state.data_offset),
                                  np.asarray(k.env_state.data_offset))
    for f in ("battery_soc", "battery_efficiency",
              "battery_degraded_capacity"):
        np.testing.assert_allclose(np.asarray(getattr(s.env_state, f)),
                                   np.asarray(getattr(k.env_state, f)),
                                   atol=atol, rtol=0, err_msg=f)
    np.testing.assert_allclose(np.asarray(s.cur_obs), np.asarray(k.cur_obs),
                               atol=atol, rtol=0)
    assert int(s.replay_pos) == int(k.replay_pos)
    assert bool(s.replay_full) == bool(k.replay_full)
    for f in ("replay_obs", "replay_act", "replay_rew", "replay_next",
              "replay_done"):
        np.testing.assert_allclose(np.asarray(getattr(s, f)),
                                   np.asarray(getattr(k, f)),
                                   atol=atol, rtol=0, err_msg=f)


def test_warmup_collect_bit_matches_scan():
    """During warmup both paths draw the SAME uniform actions from the
    replayed key chain, so transitions + env state agree to kernel
    tolerance; no updates fire (pure collect comparison)."""
    scan, kern = _pair(warmup=10**9, n_steps=30, chunk=30)
    s, k = scan.state, kern.state
    # exploration actions replay the identical key chain -> bit equal
    np.testing.assert_array_equal(np.asarray(s.replay_act),
                                  np.asarray(k.replay_act))
    _assert_state_matches(scan, kern, atol=2e-5)


def test_collect_spans_episode_reset():
    """47-step episodes with per-district window offsets: the kernel path
    must reset at the boundary with the same redrawn offsets (k_reset of
    the terminal step) and keep matching across episodes."""
    scan, kern = _pair(warmup=10**9, n_steps=100, chunk=50)
    assert kern.max_offset > 0
    offs = np.asarray(kern.state.env_state.data_offset)
    assert len(np.unique(offs)) > 1
    _assert_state_matches(scan, kern, atol=2e-5)


def test_policy_phase_matches_scan():
    """Past warmup the policy MLP runs as a batched chunk sweep. With
    updates gated off (batch_size larger than the buffer can satisfy) the
    policy params are identical on both paths, so sampled actions and env
    state must agree (matmul batching may flip low-order float bits ->
    tolerance). With updates ON the paths diverge BY DESIGN: the chunked
    path evaluates the whole chunk with chunk-start params (actor-learner
    lag) while the scan path updates every step — covered by
    ``test_kernel_collect_learns`` instead."""
    scan, kern = _pair(warmup=4, n_steps=24, chunk=12,
                       batch_size=D * 32 * 33)
    _assert_state_matches(scan, kern, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(scan.state.nets.policy["mean"]["w"]),
        np.asarray(kern.state.nets.policy["mean"]["w"]), atol=0, rtol=0)


def test_kernel_collect_learns():
    """Full closed-loop training on the kernel path: updates fire, nets
    move, rewards stay finite."""
    cfg = TrainConfig(collect="kernel", n_districts=D, warmup_steps=4,
                      batch_size=32, replay_capacity=D * 32, hidden=(16, 16))
    tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=48)
    w0 = np.asarray(tr.state.nets.policy["mean"]["w"]).copy()
    hist = tr.train(24, chunk=12)
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist)
    w1 = np.asarray(tr.state.nets.policy["mean"]["w"])
    assert np.abs(w1 - w0).max() > 0, "kernel path never updated"


def test_kernel_collect_gating():
    """Thermal-family configs (not battery-eligible) and non-tile district
    counts fall back to the scan path; collect='kernel' raises."""
    schema_2021 = ("/root/reference/data/datasets/"
                   "citylearn_challenge_2021/schema.json")
    tr = BatchedSAC(schema_2021,
                    TrainConfig(n_districts=D, warmup_steps=4, batch_size=8,
                                replay_capacity=256, hidden=(8, 8)),
                    random_seed=0, episode_time_steps=24)
    assert not tr.use_kernel_collect
    tr2 = BatchedSAC(SCHEMA,
                     TrainConfig(n_districts=4, warmup_steps=4, batch_size=8,
                                 replay_capacity=256, hidden=(8, 8)),
                     random_seed=0, episode_time_steps=24)
    assert not tr2.use_kernel_collect
    with pytest.raises(ValueError):
        BatchedSAC(schema_2021,
                   TrainConfig(n_districts=D, collect="kernel"),
                   random_seed=0, episode_time_steps=24)


def test_kernel_collect_sharded_matches_unsharded():
    """Multi-chip closed-loop training: under the dp mesh the collect's
    Pallas recurrence dispatches through shard_map over district tiles
    (train._run_collect_kernel); with the same seed the sharded trainer
    must reproduce the unsharded one's transitions and state."""
    from citylearn_tpu.parallel import district_mesh

    mesh = district_mesh()                # conftest forces 8 CPU devices
    n = len(mesh.devices.ravel())
    Dm = 128 * n
    base = dict(n_districts=Dm, warmup_steps=10**9, batch_size=32,
                replay_capacity=Dm * 16, hidden=(8, 8))
    plain = BatchedSAC(SCHEMA, TrainConfig(collect="kernel", **base),
                       random_seed=0, episode_time_steps=24)
    shard = BatchedSAC(SCHEMA, TrainConfig(collect="kernel", **base),
                       random_seed=0, episode_time_steps=24, mesh=mesh)
    assert plain.use_kernel_collect and shard.use_kernel_collect
    plain.train(12, chunk=12)
    shard.train(12, chunk=12)
    np.testing.assert_allclose(
        np.asarray(plain.state.env_state.battery_soc),
        np.asarray(shard.state.env_state.battery_soc), atol=2e-5, rtol=0)
    np.testing.assert_allclose(
        np.asarray(plain.state.replay_rew),
        np.asarray(shard.state.replay_rew), atol=2e-5, rtol=0)


def test_kernel_collect_checkpoint_resume(tmp_path):
    """Full-state checkpoint restores the episode phase so chunk
    alignment (and therefore the RNG chain) continues bit-exactly."""
    base = dict(n_districts=D, warmup_steps=10**9, batch_size=32,
                replay_capacity=D * 32, hidden=(8, 8))
    tr = BatchedSAC(SCHEMA, TrainConfig(collect="kernel", **base),
                    random_seed=0, episode_time_steps=48)
    tr.train(30, chunk=30)
    ckpt = str(tmp_path / "ckpt")
    tr.save_checkpoint(ckpt)
    tr.train(20, chunk=20)
    soc1 = np.asarray(tr.state.env_state.battery_soc)

    tr.restore_checkpoint(ckpt)
    assert tr._phase == 30
    tr.train(20, chunk=20)
    np.testing.assert_array_equal(
        soc1, np.asarray(tr.state.env_state.battery_soc))
