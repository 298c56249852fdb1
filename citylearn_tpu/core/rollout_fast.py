"""Fast-path episode dispatcher: route eligible configurations to the
whole-episode Pallas kernel (:mod:`citylearn_tpu.ops.pallas_battery`),
fall back to the general XLA scan otherwise."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from citylearn_tpu.core.types import DistrictParams, StaticConfig
from citylearn_tpu.ops.pallas_battery import T_CHUNK, TILE_D, battery_episode


def eligible(cfg: StaticConfig) -> bool:
    """Battery+PV-only districts with no outage/dynamics/EV/WM — the
    vectorized-training workhorse configuration (2022 challenge family)."""
    return (not cfg.any_cooling and not cfg.any_heating and not cfg.any_dhw
            and not cfg.has_dynamics and not cfg.has_evs
            and not cfg.has_washing_machines and not cfg.any_outage)


def _pad_time(arr: np.ndarray, t_pad: int) -> np.ndarray:
    out = np.zeros((t_pad,) + arr.shape[1:], arr.dtype)
    n = min(arr.shape[0], t_pad)
    out[:n] = arr[:n]
    return out


def run_battery_episode(cfg: StaticConfig, params: DistrictParams,
                        n_districts: int, action_table: np.ndarray,
                        n_steps: Optional[int] = None):
    """Whole-episode rollout for ``n_districts`` identical district copies
    under an hour-indexed action table. Returns per-district per-building
    reward/cost/emission sums and final battery state."""
    assert eligible(cfg), "configuration not eligible for the battery fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    assert n_districts % TILE_D == 0, f"n_districts must be a multiple of {TILE_D}"

    series_np = [np.asarray(x, np.float32) for x in (
        params.series.non_shiftable_load, params.series.solar_generation,
        params.series.electricity_pricing, params.series.carbon_intensity)]
    t_pad = ((S + T_CHUNK - 1) // T_CHUNK) * T_CHUNK
    series = tuple(jnp.asarray(_pad_time(x, t_pad)) for x in series_np)

    hours = np.asarray(params.series.hour)[:S, 0]
    actions = np.zeros(t_pad, np.float32)
    actions[:S] = np.asarray(action_table, np.float32)[hours - 1]

    bat = params.battery
    bparams = jnp.stack([
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        jnp.zeros_like(bat.capacity), jnp.zeros_like(bat.capacity)])
    curves = (bat.power_efficiency_curve_x, bat.power_efficiency_curve_y,
              bat.capacity_power_curve_x, bat.capacity_power_curve_y)

    D = n_districts
    B = bat.capacity.shape[0]
    tile = lambda v: jnp.broadcast_to(v[None, :], (D, B))
    return battery_episode(
        jnp.asarray(actions), series, bparams, curves,
        tile(bat.initial_soc), tile(bat.efficiency), tile(bat.capacity),
        n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
        ratio=cfg.time_step_ratio)
