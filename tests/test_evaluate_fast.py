"""The kernel-backed user-facing evaluation (core/evaluate_fast) must
produce the SAME full normalized KPI table as the general XLA-scan
batched evaluator (core/evaluate.evaluate_districts) on the
kernel-eligible families — battery+PV 2022 and thermal 2021 — under
scripted open-loop policies (reference ``citylearn.py:1136-1323``).

Runs the Pallas kernels in interpret mode on CPU; on real TPU hardware
the same dispatch is exercised by ``bench.py`` (eval_fast row).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.evaluate import evaluate_districts
from citylearn_tpu.core.evaluate_fast import (
    ScriptedPolicy,
    evaluate_scripted,
    kernel_family,
)
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import batched_initial_states

DATASETS = "/root/reference/data/datasets"

BAT_TABLE = np.where(np.arange(1, 25) < 9, 0.091, -0.08).astype(np.float32)
THERMAL_TABLES = {
    "cooling_storage": np.where(np.arange(1, 25) < 7, 0.05532,
                                np.where(np.arange(1, 25) < 16, -0.02, 0.034)
                                ).astype(np.float32),
    "dhw_storage": np.full(24, 0.02, np.float32),
    "electrical_storage": BAT_TABLE,
}


def _env(name, steps):
    spec = compile_schema(f"{DATASETS}/{name}/schema.json", random_seed=0,
                          central_agent=False, episode_time_steps=steps)
    return pack(spec)[:2]


def _compare(cfg, params, policy, baseline_condition="_without_storage"):
    states = batched_initial_states(cfg, params, 2)
    slow = evaluate_districts(
        cfg, params, states,
        policy.as_policy_fn(cfg, params, cfg.time_steps - 1),
        baseline_condition=baseline_condition)
    fast = evaluate_scripted(cfg, params, policy,
                             baseline_condition=baseline_condition,
                             interpret=True)
    assert set(slow) == set(fast)
    for k in sorted(slow):
        a = np.asarray(slow[k])[0]       # district 0 of the XLA batch
        b = np.asarray(fast[k])
        np.testing.assert_allclose(
            a, b, rtol=2e-5, atol=2e-5, equal_nan=True,
            err_msg=f"KPI mismatch in {k}")


def test_battery_2022_full_table():
    cfg, params = _env("citylearn_challenge_2022_phase_1", 240)
    assert kernel_family(cfg) == "battery"
    # heterogeneous per-building plan: the kernel is NOT limited to one
    # shared scalar per step
    B = cfg.n_buildings
    plan = np.tile(BAT_TABLE[:, None], (1, B))
    plan[:, 1] *= 0.5
    plan[:, 3] = -plan[:, 3]
    _compare(cfg, params, ScriptedPolicy({"electrical_storage": plan}))


def test_battery_2022_and_pv_baseline():
    cfg, params = _env("citylearn_challenge_2022_phase_1", 168)
    _compare(cfg, params, ScriptedPolicy({"electrical_storage": BAT_TABLE}),
             baseline_condition="_without_storage_and_pv")


def test_thermal_2021_full_table():
    cfg, params = _env("citylearn_challenge_2021", 240)
    assert kernel_family(cfg) == "thermal"
    _compare(cfg, params, ScriptedPolicy(dict(THERMAL_TABLES)))


def test_thermal_2020_full_table():
    """The 2020 climate-zone era (cooling + DHW storage, no battery
    everywhere) also rides the thermal kernel."""
    cfg, params = _env("citylearn_challenge_2020_climate_zone_1", 168)
    assert kernel_family(cfg) == "thermal"
    _compare(cfg, params, ScriptedPolicy({
        "cooling_storage": THERMAL_TABLES["cooling_storage"],
        "dhw_storage": THERMAL_TABLES["dhw_storage"],
    }))


def _compare_window(cfg, params, policy, off,
                    baseline_condition="_without_storage"):
    states = batched_initial_states(cfg, params, 2, data_offset=off)
    slow = evaluate_districts(
        cfg, params, states,
        policy.as_policy_fn(cfg, params, cfg.time_steps - 1),
        baseline_condition=baseline_condition)
    fast = evaluate_scripted(cfg, params, policy,
                             baseline_condition=baseline_condition,
                             interpret=True, data_offset=off)
    # the ScriptedPolicy dispatch must also route offset states to the
    # kernel (same table broadcast over the batch)
    via_dispatch = evaluate_districts(cfg, params, states, policy,
                                      baseline_condition=baseline_condition)
    assert set(slow) == set(fast)
    for k in sorted(slow):
        a = np.asarray(slow[k])[0]
        b = np.asarray(fast[k])
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   equal_nan=True,
                                   err_msg=f"KPI mismatch in {k} @ {off}")
        np.testing.assert_allclose(np.asarray(via_dispatch[k])[0], b,
                                   rtol=1e-6, atol=1e-6, equal_nan=True)


def test_scripted_policy_hour_tables_flag():
    """The 24-leading-axis ambiguity resolves explicitly: auto mode warns
    on a 24-step episode and keeps hour-table semantics;
    hour_tables=False treats the plan as per-step (advisor r4 #3)."""
    cfg, params = _env("citylearn_challenge_2022_phase_1", 25)   # S == 24
    hours = np.asarray(params.series.hour)[:24, 0]
    with pytest.warns(UserWarning, match="ambiguous"):
        auto = ScriptedPolicy({"electrical_storage": BAT_TABLE}).expanded(
            cfg, params, 24)
    assert auto["electrical_storage"][0, 0] == BAT_TABLE[hours[0] - 1]
    per_step = ScriptedPolicy({"electrical_storage": BAT_TABLE},
                              hour_tables=False).expanded(cfg, params, 24)
    assert per_step["electrical_storage"][0, 0] == BAT_TABLE[0]
    explicit = ScriptedPolicy({"electrical_storage": BAT_TABLE},
                              hour_tables=True)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        tbl = explicit.expanded(cfg, params, 24)
    np.testing.assert_array_equal(tbl["electrical_storage"],
                                  auto["electrical_storage"])


def test_sharded_kernel_evaluate_matches_single_launch():
    """evaluate_scripted under the dp mesh (VERDICT r4 #2): shard_map
    over district tiles, one collective-free kernel launch per device,
    identical table."""
    from citylearn_tpu.parallel import district_mesh

    cfg, params = _env("citylearn_challenge_2022_phase_1", 168)
    mesh = district_mesh()                 # conftest forces 8 CPU devices
    policy = ScriptedPolicy({"electrical_storage": BAT_TABLE})
    rollout_fast.HLO_CAPTURE = []
    try:
        sharded = evaluate_scripted(cfg, params, policy, interpret=True,
                                    mesh=mesh)
        hlo = "".join(rollout_fast.HLO_CAPTURE)
    finally:
        rollout_fast.HLO_CAPTURE = None
    single = evaluate_scripted(cfg, params, policy, interpret=True)
    import re
    assert not re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)\b", hlo), "sharded kernel launch emits collectives"
    for k in single:
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(single[k]), rtol=1e-6,
                                   atol=1e-6, equal_nan=True, err_msg=k)


def test_kernel_windows_rolling_and_random_split():
    """Episode-window support on the kernel paths (VERDICT r4 #4): the
    kernel-backed evaluate on a ROLLING-split and a RANDOM-split episode
    window must equal the scan evaluator on the same window (previously
    the kernels were pinned to offset 0)."""
    from citylearn_tpu.envs.episode import EpisodeTracker

    cfg, params = _env("citylearn_challenge_2022_phase_1", 168)
    tracker = EpisodeTracker(0, 8759)
    tracker.next_episode(168, True, False, 0)
    tracker.next_episode(168, True, False, 0)      # rolling split, ep 2
    off_roll = tracker.episode_start_time_step
    tracker2 = EpisodeTracker(0, 8759)
    tracker2.next_episode(168, False, True, 7)     # random split, ep 1
    off_rand = tracker2.episode_start_time_step
    assert off_rand > 0
    policy = ScriptedPolicy({"electrical_storage": BAT_TABLE})
    for off in (off_roll, off_rand):
        _compare_window(cfg, params, policy, off)


def test_kernel_window_thermal():
    """Shifted windows on the thermal kernel (the 2021 4-year range has
    real seasonal variation across windows)."""
    cfg, params = _env("citylearn_challenge_2021", 168)
    _compare_window(cfg, params, ScriptedPolicy(dict(THERMAL_TABLES)),
                    off=4000)


def test_thermal_2021_central_full_table():
    """BASELINE config 3 — the CENTRALIZED 2021 district — rides the
    thermal kernel (VERDICT r4 #5): central agency changes reward
    aggregation and observation layout only, never the recorded physics,
    so the full KPI table must match the scan path exactly as in the
    decentralized case."""
    spec = compile_schema(f"{DATASETS}/citylearn_challenge_2021/schema.json",
                          random_seed=0, central_agent=True,
                          episode_time_steps=240)
    cfg, params = pack(spec)[:2]
    assert cfg.central_agent and kernel_family(cfg) == "thermal"
    _compare(cfg, params, ScriptedPolicy(dict(THERMAL_TABLES)))


def test_ev_central_full_table():
    """Centralized plus_evs (chargers + washing machines) on the EV
    kernel — same reasoning as the thermal central gate."""
    spec = compile_schema(
        f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs/schema.json",
        random_seed=0, central_agent=True, episode_time_steps=168)
    cfg, params = pack(spec)[:2]
    assert cfg.central_agent and kernel_family(cfg) == "ev"
    policy = ScriptedPolicy({
        "electrical_storage": BAT_TABLE,
        "electric_vehicle_storage": np.full(24, 0.5, np.float32),
        "washing_machine": np.ones(24, np.float32),
    })
    _compare(cfg, params, policy)


def test_lstm_2023_full_table():
    """The LSTM-dynamics kernel family through the user-facing evaluate
    dispatch, with the partial-load counterfactual baseline."""
    cfg, params = _env("citylearn_challenge_2023_phase_1", None)
    assert kernel_family(cfg) == "lstm"
    policy = ScriptedPolicy({
        "cooling_device": np.where(np.arange(1, 25) < 12, 0.8, 0.4
                                   ).astype(np.float32),
        "dhw_storage": np.full(24, 0.05, np.float32),
        "electrical_storage": np.where(np.arange(1, 25) < 9, 0.091, -0.08
                                       ).astype(np.float32),
    })
    states = batched_initial_states(cfg, params, 2)
    slow = evaluate_districts(
        cfg, params, states,
        policy.as_policy_fn(cfg, params, cfg.time_steps - 1),
        baseline_condition="_without_storage_and_partial_load")
    fast = evaluate_scripted(
        cfg, params, policy,
        baseline_condition="_without_storage_and_partial_load",
        interpret=True)
    assert set(slow) == set(fast)
    for k in sorted(slow):
        a = np.asarray(slow[k])[0]
        b = np.asarray(fast[k])
        # the LSTM temperature path is matmul-order sensitive in float32
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-4, equal_nan=True,
            err_msg=f"KPI mismatch in {k}")


def test_lstm_baeda_heterogeneous_full_table():
    """Heterogeneous dynamics groups (baeda_3dem) through the evaluate
    dispatch on the LSTM kernel."""
    cfg, params = _env("baeda_3dem", 168)
    assert kernel_family(cfg) == "lstm"
    policy = ScriptedPolicy({
        "cooling_device": np.where(np.arange(1, 25) < 12, 0.8, 0.4
                                   ).astype(np.float32),
        "cooling_storage": np.where(np.arange(1, 25) < 7, 0.05, -0.03
                                    ).astype(np.float32),
        "dhw_storage": np.full(24, 0.05, np.float32),
    })
    states = batched_initial_states(cfg, params, 2)
    slow = evaluate_districts(
        cfg, params, states,
        policy.as_policy_fn(cfg, params, cfg.time_steps - 1),
        baseline_condition="_without_storage_and_partial_load")
    fast = evaluate_scripted(
        cfg, params, policy,
        baseline_condition="_without_storage_and_partial_load",
        interpret=True)
    for k in sorted(slow):
        np.testing.assert_allclose(
            np.asarray(slow[k])[0], np.asarray(fast[k]), rtol=5e-4,
            atol=5e-4, equal_nan=True, err_msg=f"KPI mismatch in {k}")


def test_lstm_2023p2_outage_full_table():
    """The power-outage 2023 phase-2 family through the evaluate
    dispatch: resilience/unserved-energy KPIs from kernel-recorded
    streams must match the XLA path."""
    cfg, params = _env("citylearn_challenge_2023_phase_2_local_evaluation",
                       None)
    assert cfg.any_outage and kernel_family(cfg) == "lstm"
    policy = ScriptedPolicy({
        "cooling_device": np.where(np.arange(1, 25) < 12, 0.8, 0.4
                                   ).astype(np.float32),
        "dhw_storage": np.full(24, 0.05, np.float32),
        "electrical_storage": BAT_TABLE,
    })
    states = batched_initial_states(cfg, params, 2)
    slow = evaluate_districts(
        cfg, params, states,
        policy.as_policy_fn(cfg, params, cfg.time_steps - 1),
        baseline_condition="_without_storage_and_partial_load")
    fast = evaluate_scripted(
        cfg, params, policy,
        baseline_condition="_without_storage_and_partial_load",
        interpret=True)
    # the outage KPIs must be non-trivial for the comparison to bite
    assert float(np.asarray(
        fast["district|one_minus_thermal_resilience_proportion"])) != 0.0 or \
        float(np.asarray(
            fast["district|power_outage_normalized_unserved_energy_total"])) \
        != 0.0
    for k in sorted(slow):
        np.testing.assert_allclose(
            np.asarray(slow[k])[0], np.asarray(fast[k]), rtol=5e-4,
            atol=5e-4, equal_nan=True, err_msg=f"KPI mismatch in {k}")


def test_ev_2022_full_table():
    """The EV kernel family through the user-facing evaluate dispatch:
    chargers + washing machines, with per-charger open-loop plans."""
    cfg, params = _env("citylearn_challenge_2022_phase_all_plus_evs", 168)
    assert kernel_family(cfg) == "ev"
    ev_tbl = np.select(
        [np.arange(1, 25) < 7, np.arange(1, 25) < 10, np.arange(1, 25) < 15,
         np.arange(1, 25) < 20], [0.4, 1.0, -1.0, -0.6], 0.8
    ).astype(np.float32)
    policy = ScriptedPolicy({
        "electrical_storage": BAT_TABLE,
        "electric_vehicle_storage": ev_tbl,
        "washing_machine": np.ones(24, np.float32),
    })
    _compare(cfg, params, policy)


def test_evaluate_districts_dispatches_to_kernel(monkeypatch):
    """evaluate_districts hands ScriptedPolicy + eligible config to the
    kernel path (user-facing API surface, VERDICT r3 #1)."""
    cfg, params = _env("citylearn_challenge_2022_phase_1", 168)
    calls = {}
    import citylearn_tpu.core.evaluate_fast as ef
    orig = ef.evaluate_scripted

    def spy(*a, **kw):
        calls["hit"] = True
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(ef, "evaluate_scripted", spy)
    states = batched_initial_states(cfg, params, 4)
    out = evaluate_districts(cfg, params, states,
                             ScriptedPolicy({"electrical_storage": BAT_TABLE}))
    assert calls.get("hit"), "kernel dispatch did not fire"
    assert np.asarray(out["district|cost_total"]).shape == (4,)
    # all districts identical -> broadcast rows equal
    v = np.asarray(out["building|cost_total"])
    np.testing.assert_array_equal(v[0], v[-1])


def test_scripted_policy_fallback_on_shifted_state():
    """Non-fresh states (shifted window) fall back to the XLA scan with
    hour tables indexed by the sim-range step."""
    cfg, params = _env("citylearn_challenge_2022_phase_1", 168)
    states = batched_initial_states(cfg, params, 2, data_offset=24)
    out = evaluate_districts(cfg, params, states,
                             ScriptedPolicy({"electrical_storage": BAT_TABLE}),
                             n_steps=48)
    assert np.isfinite(np.asarray(out["district|cost_total"])).all()
