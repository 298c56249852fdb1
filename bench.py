"""Throughput benchmark: vectorized district env steps per second per chip.

Runs D vectorized district instances of citylearn_challenge_2022_phase_1
(5 buildings, battery + PV) for a full year episode with an in-graph
hour-indexed RBC policy (BasicRBC battery map, reference
agents/rbc.py:160-218). One env-step = one district stepping once.

Two paths:
- the whole-episode Pallas TPU kernel (ops/pallas_battery.py) when the
  config is eligible — episode streaming HBM->VMEM, state in VMEM,
  one kernel launch per episode (~25x the scan path on v5e);
- the general jitted vmap(scan) path otherwise (or BENCH_FAST=0).

Baseline denominator: the reference CityLearn's measured single-env CPU
throughput (tests/golden/reference_perf.json via tools/make_golden.py).

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


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

    schema = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"
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
    times = None
    if use_fast and os.environ.get("BENCH_FAST_CHILD") != "1":
        # the remote Mosaic compile service has variable latency; run the
        # kernel path in a bounded subprocess and fall back to the XLA
        # scan path if it does not report in time
        import subprocess
        import sys

        budget = int(os.environ.get("BENCH_FAST_TIMEOUT", "420"))
        env = dict(os.environ, BENCH_FAST_CHILD="1")
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, timeout=budget,
                                  capture_output=True, text=True)
            if proc.returncode == 0 and proc.stdout.strip():
                print(proc.stdout.strip().splitlines()[-1])
                return
        except subprocess.TimeoutExpired:
            pass
        use_fast = False                   # fall through to the XLA path

    # optional jax.profiler trace of one timed rep (SURVEY.md §5.1)
    profile_dir = os.environ.get("BENCH_PROFILE")

    def maybe_profile(run_once):
        if profile_dir:
            from citylearn_tpu.utilities import Profiler
            with Profiler(profile_dir):
                run_once()

    if use_fast:
        out = rollout_fast.run_battery_episode(cfg, params, D, table)
        jax.block_until_ready(out[0])               # compile + warm run
        maybe_profile(lambda: np.asarray(
            rollout_fast.run_battery_episode(cfg, params, D, table)[0]))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = rollout_fast.run_battery_episode(cfg, params, D, table)
            np.asarray(out[0])
            times.append(time.perf_counter() - t0)
    else:
        policy = hour_rbc_policy(jnp.asarray(table))
        states = batched_initial_states(cfg, params, D)

        def episode(params, state):
            return rollout_policy(cfg, params, state, S, policy)

        episode_fn = jax.jit(jax.vmap(episode, in_axes=(None, 0)))
        out_state, result = episode_fn(params, states)
        jax.block_until_ready(result["reward_sum"])     # compile + warm run
        maybe_profile(lambda: np.asarray(
            episode_fn(params, states)[1]["reward_sum"]))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out_state, result = episode_fn(params, states)
            np.asarray(result["reward_sum"])        # force full materialization
            times.append(time.perf_counter() - t0)
    elapsed = min(times)

    steps_per_sec = D * S / elapsed

    baseline = None
    perf_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests/golden/reference_perf.json")
    if os.path.exists(perf_path):
        with open(perf_path) as f:
            ref = json.load(f)
        baseline = ref.get("p1_scripted_year") or ref.get("p1_scripted_168")

    vs_baseline = steps_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": f"district-steps/s @ {D} vectorized districts x {B} buildings",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
