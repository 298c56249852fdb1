"""Minimal repro driver for the plus_evs D=2048 TPU fault (VERDICT r3 #2).

Runs ONE configuration per invocation so a worker crash is isolated to a
single program: ``python tools/ev_repro.py <D> <scan|pallas> [steps]``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    D = int(sys.argv[1])
    path = sys.argv[2]
    S_req = int(sys.argv[3]) if len(sys.argv) > 3 else None
    import jax
    import jax.numpy as jnp

    from citylearn_tpu.compiler.schema import compile_schema
    from citylearn_tpu.core import rollout_fast
    from citylearn_tpu.core.params import pack
    from citylearn_tpu.core.rollout import (
        ACTION_KEYS,
        batched_initial_states,
        rollout_policy,
    )

    schema = ("/root/reference/data/datasets/"
              "citylearn_challenge_2022_phase_all_plus_evs/schema.json")
    spec = compile_schema(schema, random_seed=0, central_agent=False)
    cfg, params, _ = pack(spec)
    S = (cfg.time_steps - 1) if S_req is None else S_req
    if path == "pallas":
        tables = {"electrical_storage": np.full(24, 0.05, np.float32)}
        out = rollout_fast.run_ev_episode(cfg, params, D, tables, n_steps=S)
        print("pallas ok", float(np.asarray(out[0]).sum()))
        return

    table = jnp.asarray(np.full(24, 0.05, np.float32))

    def policy(params, state):
        tau = state.data_offset + state.t
        hour = jnp.take(params.series.hour, tau, axis=0)
        act = jnp.take(table, hour - 1)
        zero = jnp.zeros_like(act)
        out = {k: (act if k == "electrical_storage" else zero)
               for k in ACTION_KEYS}
        out["electric_vehicle_storage"] = jnp.full((cfg.n_chargers,), 0.3,
                                                   jnp.float32)
        out["washing_machine"] = jnp.ones((cfg.n_washing_machines,),
                                          jnp.float32)
        return out

    states = batched_initial_states(cfg, params, D)
    fn = jax.jit(jax.vmap(lambda p, s: rollout_policy(cfg, p, s, S, policy),
                          in_axes=(None, 0)))
    r = np.asarray(fn(params, states)[1]["reward_sum"])
    print("scan ok", float(r.sum()))


main()
