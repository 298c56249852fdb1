"""Multi-process (multi-host analog) scale-out: ``jax.distributed``
bring-up via ``parallel.initialize_distributed``, a global ``dp`` mesh
spanning 2 processes x 2 virtual devices, and a cross-process reduction
over the fused rollout (SURVEY.md §5.8; replaces the reference's
share-nothing SLURM fan-out, ``tests/scripts/tacc_job.sh``)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core.params import pack
from citylearn_tpu.core.rollout import (
    batched_initial_states,
    hour_rbc_policy,
    rollout_policy,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")
SCHEMA = "/root/reference/data/datasets/citylearn_challenge_2022_phase_1/schema.json"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_single_process():
    # single-process expected value
    spec = compile_schema(SCHEMA, random_seed=0, central_agent=False,
                          episode_time_steps=48)
    cfg, params, _ = pack(spec)
    S = cfg.time_steps - 1
    states = batched_initial_states(cfg, params, 8)
    policy = hour_rbc_policy(jnp.asarray(np.full(24, 0.05, np.float32)))
    _, r = jax.jit(jax.vmap(lambda p, s: rollout_policy(cfg, p, s, S, policy),
                            in_axes=(None, 0)))(params, states)
    expected = float(jnp.sum(r["reward_sum"]))

    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("REWARD_TOTAL")]
        assert lines, out
        got = float(lines[-1].split()[1])
        assert abs(got - expected) < 1e-3 * max(1.0, abs(expected)), \
            (got, expected)
