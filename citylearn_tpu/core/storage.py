"""Thermal storage tank physics (reference ``energy_model.py:603-871``)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from citylearn_tpu.core.types import StorageTankParams

ZERO = 1e-6


class TankStepResult(NamedTuple):
    soc: jnp.ndarray
    energy_balance: jnp.ndarray


def tank_charge(sp: StorageTankParams, soc_prev: jnp.ndarray, energy: jnp.ndarray,
                time_step_ratio: float, parity_f64: bool = False) -> TankStepResult:
    """One StorageTank charge/discharge event.

    The reference applies ``time_step_ratio`` twice for tanks —
    ``StorageTank.charge`` (``energy_model.py:863``) and then
    ``StorageDevice.charge`` (``energy_model.py:732``) — while the env
    divides once in ``Building._convert_energy_for_storage``
    (``building.py:1814-1823``); we reproduce that exactly, callers pass
    the pre-divided energy.

    ``parity_f64``: the reference reads ``soc`` as an np.float32 scalar, so
    ``soc * capacity`` (``energy_model.py:666``) rounds to float32 when the
    capacity is a weak Python float (schema literal, NEP 50) OR itself an
    np.float32 (tank autosize = ``np.nanmax`` over the float32 demand
    series, ``energy_model.py:793``); only a strong np.float64 capacity
    keeps the chain in float64.
    """
    energy = energy * time_step_ratio
    energy = jnp.where(energy >= 0.0,
                       jnp.minimum(energy, sp.max_input_power),
                       jnp.maximum(-sp.max_output_power, energy))
    energy = energy * time_step_ratio

    cap = sp.capacity
    soc_cap = soc_prev * cap
    if parity_f64:
        rounds_f32 = sp.capacity_weak
        if sp.capacity_npf32 is not None:
            rounds_f32 = rounds_f32 | sp.capacity_npf32
        soc_cap = jnp.where(rounds_f32,
                            soc_cap.astype(jnp.float32).astype(soc_cap.dtype),
                            soc_cap)
    energy_init = jnp.maximum(0.0, soc_cap * (1.0 - sp.loss_coefficient))
    rt = jnp.sqrt(sp.efficiency)
    energy_final = jnp.where(
        energy >= 0.0,
        jnp.minimum(energy_init + energy * rt, cap),
        jnp.maximum(0.0, energy_init + energy / rt))
    soc = energy_final / jnp.maximum(cap, ZERO)
    delta = energy_final - energy_init
    balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)
    return TankStepResult(soc=soc, energy_balance=balance)
