"""Device-mesh scale-out for vectorized districts.

The workload's parallelism is env-batch data parallelism (SURVEY.md §2):
district instances shard over a 1-D ``dp`` mesh axis spanning all chips
(ICI within a host, DCN across hosts), driver data and learner parameters
replicate, and the learner's gradients are reduced with in-graph
collectives inserted by XLA from the sharding annotations. This replaces
the reference's share-nothing process fan-out (``__main__.py:31-67``,
``tests/scripts/tacc_job.sh``) with a single jitted program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (``jax.distributed``); no-op when single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def district_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ``dp`` mesh over the first ``n_devices`` (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("dp",))


def shard_district_batch(mesh: Mesh, env_state, params):
    """Place a (D, ...) state batch over ``dp`` and replicate params."""
    shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.device_put(env_state, shard), jax.device_put(params, repl)
