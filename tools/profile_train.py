"""BatchedSAC train-step cost breakdown (VERDICT r3 #3 / r4 #7).

Times the fused train chunk against ablated variants to attribute the
per-step cost:

- ``full``                — kernel-collect path (battery family): batched
                            MXU policy sweep + chunked Pallas recurrence
                            + replay + interleaved updates
- ``full_scan``           — the per-step XLA scan path (round-4 baseline)
- ``collect_no_update*``  — update gated off by a huge warmup (random
                            actions, no policy MLP): the pure collect cost
                            on each path
- ``env_scan_only``       — raw scripted env scan, no learner machinery

The committed artifact of record is ``docs/profile_train_r05.json``
(regenerate with ``python tools/profile_train.py [D] [chunk] --save``).

Usage: python tools/profile_train.py [D] [chunk] [trace_dir|--save]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCHEMA = ("/root/reference/data/datasets/citylearn_challenge_2022_phase_1/"
          "schema.json")


def timeit(run, reps=3):
    run()
    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    extra = sys.argv[3] if len(sys.argv) > 3 else None
    save = extra == "--save"
    trace_dir = None if save else extra

    import jax
    import jax.numpy as jnp

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core.params import pack
    from citylearn_tpu.core.rollout import (
        batched_initial_states,
        hour_rbc_policy,
        rollout_policy,
    )
    from citylearn_tpu.train import BatchedSAC, TrainConfig

    out = {"D": D, "chunk": chunk,
           "platform": jax.devices()[0].platform}

    def bench_trainer(tag, cfg):
        tr = BatchedSAC(SCHEMA, cfg, random_seed=0, episode_time_steps=720)
        tr.train(2 * chunk, chunk=chunk)       # warm + past warmup

        def run():
            tr.train(chunk, chunk=chunk)
        t = timeit(run)
        out[tag] = {
            "s_per_chunk": round(t, 4),
            "district_steps_per_sec": round(D * chunk / t, 1),
            "path": ("pallas_collect" if tr.use_kernel_collect
                     else "xla_scan"),
        }
        return tr

    base = TrainConfig(n_districts=D, warmup_steps=8, batch_size=256,
                       replay_capacity=D * 64)
    tr = bench_trainer("full", base)
    bench_trainer("full_scan", base._replace(collect="scan"))

    # collect-only: warmup larger than everything -> explore branch, no
    # update; the random-action branch replaces the policy MLP sample
    bench_trainer("collect_no_update", base._replace(warmup_steps=10**9))
    bench_trainer("collect_no_update_scan",
                  base._replace(warmup_steps=10**9, collect="scan"))

    # raw env scan: the same D districts under an in-graph hour-RBC —
    # no obs encode, no replay stores, no nets
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False)
    env_cfg, params, _ = pack(spec)
    table = jnp.asarray(np.full(24, 0.05, np.float32))
    policy = hour_rbc_policy(table)
    states = batched_initial_states(env_cfg, params, D)
    fn = jax.jit(jax.vmap(
        lambda p, s: rollout_policy(env_cfg, p, s, chunk, policy),
        in_axes=(None, 0)))

    def run_env():
        _, r = fn(params, states)
        jax.block_until_ready(r["reward_sum"])
    t = timeit(run_env)
    out["env_scan_only"] = {
        "s_per_chunk": round(t, 4),
        "district_steps_per_sec": round(D * chunk / t, 1),
    }

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            tr.train(chunk, chunk=chunk)
        out["trace_dir"] = trace_dir

    print(json.dumps(out))
    if save:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "profile_train_r05.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("saved", path)


main()
