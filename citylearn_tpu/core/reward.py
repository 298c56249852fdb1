"""Reward functions (reference ``citylearn/reward_function.py``), computed
in-graph from the fresh step quantities (the reference computes rewards from
``Building.observations(include_all=True)`` *after* ``update_variables``,
i.e. from the just-written index-t values — ``citylearn.py:1022-1023``).
"""

from __future__ import annotations

import jax.numpy as jnp

from citylearn_tpu.core.types import StaticConfig


def compute_reward(cfg: StaticConfig, net: jnp.ndarray, battery_soc: jnp.ndarray,
                   solar: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on ``cfg.reward_type``.

    Default ``RewardFunction`` (``reward_function.py:65-88``):
    ``-(max(net, 0) ** exponent)`` per building; central agent sums into a
    single scalar entry.
    """
    if cfg.reward_type == "RewardFunction":
        r = -(jnp.maximum(net, 0.0) ** cfg.reward_exponent)
    elif cfg.reward_type == "IndependentSACReward":
        # reference reward_function.py:145-168: -(max(net, 0)) scaled later
        r = -(jnp.maximum(net, 0.0) ** cfg.reward_exponent)
    elif cfg.reward_type == "MARL":
        # reference reward_function.py:120-143:
        # sign(net) * 0.01 * net^2 * max(0, -district_net)
        district = jnp.sum(net)
        r = jnp.sign(net) * 0.01 * (net ** 2) * jnp.maximum(0.0, -district)
    elif cfg.reward_type == "SolarPenaltyReward":
        # reference reward_function.py:170-214: per-building
        # -(1 + sign(net)*soc) * |net| summed over storages (battery only here)
        r = -(1.0 + jnp.sign(net) * battery_soc) * jnp.abs(net)
    else:
        raise NotImplementedError(f"reward {cfg.reward_type}")

    if cfg.central_agent:
        return jnp.sum(r, keepdims=True)
    return r
