"""Worker for the multi-process (multi-host analog) scale-out test.

Each process owns 2 virtual CPU devices; the global ``dp`` mesh spans
both processes (SURVEY.md §5.8: env batch over hosts, data replicated,
reduction via in-graph collectives). Prints the globally reduced
reward sum, which the parent compares to a single-process run.

argv: <process_id> <num_processes> <coordinator_address>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from citylearn_tpu.compiler.schema import compile_schema  # noqa: E402
from citylearn_tpu.core.params import pack  # noqa: E402
from citylearn_tpu.core.rollout import (  # noqa: E402
    batched_initial_states,
    hour_rbc_policy,
    rollout_policy,
)
from citylearn_tpu.parallel import district_mesh, initialize_distributed  # noqa: E402


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    spec = compile_schema(
        "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json",
        random_seed=0, central_agent=False, episode_time_steps=48)
    cfg, params, _ = pack(spec)
    S = cfg.time_steps - 1
    D = 8
    mesh = district_mesh()                      # global dp over 2x2 devices
    shard = NamedSharding(mesh, P("dp"))

    states_host = batched_initial_states(cfg, params, D)
    states_host = jax.tree_util.tree_map(np.asarray, states_host)
    states = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, P(*(["dp"] + [None] * (x.ndim - 1)))),
            lambda idx: x[idx]),
        states_host)
    params_g = jax.device_put(params, NamedSharding(mesh, P()))

    table = np.full(24, 0.05, np.float32)
    policy = hour_rbc_policy(jax.numpy.asarray(table))

    @jax.jit
    def episode_sum(params, states):
        _, r = jax.vmap(
            lambda p, s: rollout_policy(cfg, p, s, S, policy),
            in_axes=(None, 0))(params, states)
        return jax.numpy.sum(r["reward_sum"])   # cross-host reduction

    total = episode_sum(params_g, states)
    print(f"REWARD_TOTAL {float(total):.6f}", flush=True)


if __name__ == "__main__":
    main()
