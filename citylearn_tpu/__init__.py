"""citylearn_tpu: a TPU-native district-energy demand-response RL framework.

A from-scratch JAX/XLA rebuild of the capabilities of CityLearn
(intelligent-environments-lab/CityLearn v2.4.2): multi-building energy
districts with HVAC, thermal + battery storage, PV, EV chargers and
deferrable loads, stepped over year-long episodes and evaluated with
normalized KPIs against a no-control baseline.

Architecture (TPU-first, not a port):
  - ``compiler``: offline schema.json + CSV -> static config + HBM-resident
    ``(T, B)`` driver tensors (replaces per-step pandas slicing,
    reference ``citylearn/data.py:313``).
  - ``core``: the whole env step (device physics, energy accounting,
    rewards) as one pure jittable function over struct-of-arrays state,
    vmapped over buildings and over thousands of district instances,
    rolled out with ``lax.scan`` (replaces the mutable OOP cascade in
    reference ``citylearn/citylearn.py:978`` / ``building.py:1500``).
  - ``envs``: single-instance Gymnasium drop-in adapter with the exact
    observation/action ordering and quirks of the reference, plus the
    batched vector API.
  - ``agents``: RBC presets, tabular Q, SAC (JAX/optax), MARLISA.
  - ``parallel``: device-mesh sharding of env batches + learner state.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CITYLEARN_TPU_PLATFORM"):
    # honor an explicit platform choice before any jax initialization
    # (some TPU plugins ignore JAX_PLATFORMS; the config flag wins)
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["CITYLEARN_TPU_PLATFORM"])

from citylearn_tpu.compiler.schema import compile_schema  # noqa: F401
from citylearn_tpu.envs.environment import CityLearnEnv  # noqa: F401
from citylearn_tpu.envs.views import EvaluationCondition  # noqa: F401
