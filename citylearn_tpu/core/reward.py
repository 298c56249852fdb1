"""Reward functions (reference ``citylearn/reward_function.py``), computed
in-graph from the fresh step quantities (the reference computes rewards from
``Building.observations(include_all=True)`` *after* ``update_variables``,
i.e. from the just-written index-t values — ``citylearn.py:1022-1023``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
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
    """``sign(-net) * 0.01 * net^2 * max(0, district_net)``
    (reward_function.py:132-143: building consumption is negated before the
    sign, and the district term is the *positive* total)."""
    district = jnp.sum(x.net)
    neg = -x.net
    return jnp.sign(neg) * 0.01 * (neg ** 2) * jnp.maximum(0.0, district)


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


class EVRewardInputs(NamedTuple):
    """Per-charger (C,) arrays for ``Electric_Vehicles_Reward_Function``
    (reference ``reward_function.py:389-517``), all at index t."""
    building_index: jnp.ndarray          # (C,) int32
    connected: jnp.ndarray               # bool
    last_charged_kwh: jnp.ndarray        # past_charging_action_values_kwh[t]
    soc_prev: jnp.ndarray
    soc_now: jnp.ndarray
    capacity: jnp.ndarray                # EV model battery capacity
    depth_of_discharge: jnp.ndarray
    required_soc: jnp.ndarray
    hours_until_departure: jnp.ndarray
    max_charging_power: jnp.ndarray
    max_discharging_power: jnp.ndarray
    violation_kwh: jnp.ndarray           # (B,) charging-constraint violations


def _ev_reward(cfg: StaticConfig, x: RewardInputs, ev: EVRewardInputs) -> jnp.ndarray:
    """The EV reward *replaces* the MARL base with per-charger shaping —
    the MARL value only scales the penalty via ``1/(1+|r|)``; buildings
    without chargers receive 0 (``reward_function.py:413-445``). The
    disconnected-charger 'no_car_charging' term is computed then discarded
    by the reference's early ``continue`` (``reward_function.py:459-463``)
    — reproduced by contributing nothing for disconnected chargers."""
    (w_ncc, w_bl, w_imposs, w_under, w_close, w_sc, w_esp) = cfg.ev_reward_weights
    marl = _marl(cfg, x)                       # (B,)
    if cfg.central_agent:
        base = jnp.sum(marl)
        mult_b = jnp.full_like(marl, 1.0 / (1.0 + jnp.abs(base)))
    else:
        mult_b = 1.0 / (1.0 + jnp.abs(marl))
    mult = mult_b[ev.building_index]           # (C,)

    net_b = x.net[ev.building_index]
    cap = ev.capacity
    min_cap = (1.0 - ev.depth_of_discharge) * cap
    last = ev.last_charged_kwh
    current_energy = ev.soc_prev * cap + last
    c_bl = jnp.where((current_energy > cap) | (current_energy < min_cap),
                     w_bl * mult, 0.0)

    soc_diff = ev.soc_now - ev.required_soc
    soc_diff_kwh = soc_diff * cap
    hours = ev.hours_until_departure
    mpc = ev.max_charging_power * hours
    mpd = ev.max_discharging_power * hours
    c_imposs = jnp.where(soc_diff_kwh > mpc, w_imposs * mult, 0.0)
    at_dep = hours == 0
    c_under = jnp.where(
        at_dep & (-0.25 < soc_diff) & (soc_diff <= -0.10), 2 * w_under * mult,
        jnp.where(at_dep & (soc_diff <= -0.25), (w_under ** 2) * mult, 0.0))
    c_close = jnp.where(at_dep & (-0.10 < soc_diff) & (soc_diff <= 0.10),
                        w_close * mult, 0.0)
    c_close = c_close + jnp.where(
        jnp.abs(soc_diff_kwh) <= jnp.maximum(mpc, mpd),
        w_close * mult * (1.0 / (hours + 0.1)), 0.0)
    c_esp = jnp.where((last > 0) & (net_b < 0), w_esp * mult,
                      jnp.where((last < 0) & (net_b < 0), -0.5 * w_esp * mult, 0.0))
    c_sc = jnp.where((last < 0) & (net_b > 0), w_sc * mult,
                     jnp.where((last > 0) & (net_b > 0), -0.5 * w_sc * mult, 0.0))

    per_charger = jnp.where(
        ev.connected, c_bl + c_imposs + c_under + c_close + c_esp + c_sc, 0.0)
    reward = jax.ops.segment_sum(per_charger, ev.building_index,
                                 num_segments=x.net.shape[0])
    # charging-constraint violation penalty (reward_function.py:431-436)
    reward = reward - jnp.maximum(ev.violation_kwh, 0.0) \
        * cfg.charging_penalty_coefficient
    if cfg.central_agent:
        return jnp.sum(reward, keepdims=True)
    return reward


def _marl_single(cfg: StaticConfig, x: RewardInputs) -> jnp.ndarray:
    """MARL under MultiBuildingRewardFunction: each building's function
    receives only that building's observation (``reward_function.py:96-103``),
    so the 'district' total degenerates to the building's own net."""
    neg = -x.net
    return jnp.sign(neg) * 0.01 * (neg ** 2) * jnp.maximum(0.0, x.net)


_REGISTRY = {
    "RewardFunction": _default,
    "IndependentSACReward": _independent_sac,
    "MARL": _marl,
    "SolarPenaltyReward": _solar_penalty,
    "ComfortReward": _comfort,
}


def _dispatch(cfg: StaticConfig, x: RewardInputs,
              single_building: bool = False) -> jnp.ndarray:
    if cfg.reward_type == "SolarPenaltyAndComfortReward":
        c = cfg.reward_coefficients
        return c[0] * _solar_penalty(cfg, x) + c[1] * _comfort(cfg, x)
    if single_building and cfg.reward_type == "MARL":
        return _marl_single(cfg, x)
    if cfg.reward_type in _REGISTRY:
        return _REGISTRY[cfg.reward_type](cfg, x)
    raise NotImplementedError(f"reward {cfg.reward_type}")


def compute_reward(cfg: StaticConfig, x: RewardInputs,
                   ev: Optional[EVRewardInputs] = None) -> jnp.ndarray:
    """Dispatch on ``cfg.reward_type`` (or per-building on
    ``cfg.reward_per_building``); central agent sums to shape (1,)."""
    if cfg.reward_per_building is not None:
        # MultiBuildingRewardFunction: group buildings sharing (type, attrs),
        # evaluate each group's function once over the full building axis,
        # and select members via static masks (citylearn.py:2108-2141)
        import dataclasses

        import numpy as np

        B = x.net.shape[0]
        groups = {}
        for bi, prm in enumerate(cfg.reward_per_building):
            groups.setdefault(prm, []).append(bi)
        r = jnp.zeros((B,), jnp.float32)
        for (t, expo, band, lo, hi, coef), members in groups.items():
            gcfg = dataclasses.replace(
                cfg, reward_type=t, reward_exponent=expo, reward_band=band,
                reward_lower_exponent=lo, reward_higher_exponent=hi,
                reward_coefficients=coef, reward_per_building=None)
            mask = np.zeros(B, bool)
            mask[members] = True
            r = jnp.where(jnp.asarray(mask),
                          _dispatch(gcfg, x, single_building=True), r)
        if cfg.central_agent:
            return jnp.sum(r, keepdims=True)
        return r

    if cfg.reward_type == "Electric_Vehicles_Reward_Function":
        assert ev is not None, "EV reward requires charger inputs"
        return _ev_reward(cfg, x, ev)
    r = _dispatch(cfg, x)
    if cfg.central_agent:
        return jnp.sum(r, keepdims=True)
    return r
