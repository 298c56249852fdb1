"""Reward functions (reference ``citylearn/reward_function.py``), computed
in-graph from the fresh step quantities (the reference computes rewards from
``Building.observations(include_all=True)`` *after* ``update_variables``,
i.e. from the just-written index-t values — ``citylearn.py:1022-1023``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from citylearn_tpu.core.types import StaticConfig

ZERO = 1e-6


class RewardInputs(NamedTuple):
    """Per-building (B,) arrays of the observation values reward functions
    read; all at the *freshly written* index t."""
    net: jnp.ndarray
    solar: jnp.ndarray                   # abs PV generation
    battery_soc: jnp.ndarray
    cooling_storage_soc: jnp.ndarray
    heating_storage_soc: jnp.ndarray
    dhw_storage_soc: jnp.ndarray
    battery_capacity: jnp.ndarray
    cooling_storage_capacity: jnp.ndarray
    heating_storage_capacity: jnp.ndarray
    dhw_storage_capacity: jnp.ndarray
    indoor_temperature: jnp.ndarray
    hvac_mode: jnp.ndarray               # int
    cooling_set_point: jnp.ndarray
    heating_set_point: jnp.ndarray
    comfort_band: jnp.ndarray
    cooling_demand: jnp.ndarray          # fresh demand observation
    heating_demand: jnp.ndarray


def _default(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """``-(max(net, 0) ** exponent)`` (reward_function.py:65-88)."""
    return -(jnp.maximum(x.net, 0.0) ** cfg.reward_exponent)


def _independent_sac(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """``min(net * -1**3, 0)`` (reward_function.py:159-168). Note the
    reference's ``v*-1**3`` parses as ``v * (-(1**3)) = -v``."""
    return jnp.minimum(-x.net, 0.0)


def _marl(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """``sign(net) * 0.01 * net^2 * max(0, -district_net)``
    (reward_function.py:120-143)."""
    district = jnp.sum(x.net)
    return jnp.sign(x.net) * 0.01 * (x.net ** 2) * jnp.maximum(0.0, -district)


def _solar_penalty(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """Per storage system: ``-(1 + sign(net)*soc) * |net|`` when the system
    has capacity (reward_function.py:170-214)."""
    e = x.net
    term = lambda soc, cap: jnp.where(
        cap > ZERO, -(1.0 + jnp.sign(e) * soc) * jnp.abs(e), 0.0)
    return (term(x.cooling_storage_soc, x.cooling_storage_capacity)
            + term(x.heating_storage_soc, x.heating_storage_capacity)
            + term(x.dhw_storage_soc, x.dhw_storage_capacity)
            + term(x.battery_soc, x.battery_capacity))


def _comfort(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """ComfortReward (reward_function.py:216-340) vectorized."""
    T = x.indoor_temperature
    band = (x.comfort_band if cfg.reward_band is None
            else jnp.full_like(T, cfg.reward_band))
    lo_e, hi_e = cfg.reward_lower_exponent, cfg.reward_higher_exponent
    heating = x.heating_demand > x.cooling_demand
    mode = x.hvac_mode

    # --- single-setpoint branch (mode 1 cooling / 2 heating) ---
    sp = jnp.where(mode == 1, x.cooling_set_point, x.heating_set_point)
    delta = jnp.abs(T - sp)
    exp_below = jnp.where(mode == 2, lo_e, hi_e)
    exp_above = jnp.where(heating, hi_e, lo_e)
    r_single = jnp.where(
        T < sp - band, -(delta ** exp_below),
        jnp.where(T < sp, jnp.where(heating, 0.0, -delta),
                  jnp.where(T <= sp + band, jnp.where(heating, -delta, 0.0),
                            -(delta ** exp_above))))

    # --- dual-setpoint dead-band branch (mode 0 off / 3 auto) ---
    csp, hsp = x.cooling_set_point, x.heating_set_point
    cd = jnp.abs(T - csp)
    hd = jnp.abs(T - hsp)
    exp_cold = jnp.where(heating, lo_e, hi_e)
    exp_hot = jnp.where(heating, hi_e, lo_e)
    r_dual = jnp.where(
        T < hsp - band, -(hd ** exp_cold),
        jnp.where(T < hsp, -hd,
                  jnp.where(T <= csp, 0.0,
                            jnp.where(T < csp + band, -cd, -(cd ** exp_hot)))))

    return jnp.where((mode == 1) | (mode == 2), r_single, r_dual)


_REGISTRY = {
    "RewardFunction": _default,
    "IndependentSACReward": _independent_sac,
    "MARL": _marl,
    "SolarPenaltyReward": _solar_penalty,
    "ComfortReward": _comfort,
}


def compute_reward(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """Dispatch on ``cfg.reward_type``; central agent sums to shape (1,)."""
    if cfg.reward_type == "SolarPenaltyAndComfortReward":
        c = cfg.reward_coefficients
        r = c[0] * _solar_penalty(cfg, x) + c[1] * _comfort(cfg, x)
    elif cfg.reward_type in _REGISTRY:
        r = _REGISTRY[cfg.reward_type](cfg, x)
    else:
        raise NotImplementedError(f"reward {cfg.reward_type}")

    if cfg.central_agent:
        return jnp.sum(r, keepdims=True)
    return r
