import os

# Test on CPU with a virtual 8-device mesh for sharding tests; bench runs
# separately on the real TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; the config flag wins.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASETS = "/root/reference/data/datasets"
