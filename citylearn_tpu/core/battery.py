"""Battery physics as a pure, fully vectorized function.

Reproduces ``citylearn.energy_model.Battery.charge`` and its parents
(reference ``energy_model.py:719-768, 1027-1141``) over a building axis:
SOC-dependent max power (capacity_power_curve), power-dependent efficiency
(power_efficiency_curve), depth-of-discharge floor, standby loss, capacity
clamp, round-trip-efficiency split, and per-cycle degradation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from citylearn_tpu.core.curves import interp_reference
from citylearn_tpu.core.types import BatteryParams

ZERO = 1e-6  # reference citylearn/data.py:19 ZERO_DIVISION_PLACEHOLDER


class BatteryStepResult(NamedTuple):
    soc: jnp.ndarray                 # new SOC fraction (B,)
    energy_balance: jnp.ndarray      # charged(+)/discharged(-) kWh incl. losses (B,)
    efficiency: jnp.ndarray          # efficiency applied this event (B,)
    degraded_capacity: jnp.ndarray   # capacity after this cycle's degradation (B,)


def battery_charge(bp: BatteryParams, soc_prev: jnp.ndarray,
                   prev_efficiency: jnp.ndarray, degraded_capacity: jnp.ndarray,
                   energy: jnp.ndarray, time_step_ratio: float,
                   parity_f64: bool = False) -> BatteryStepResult:
    """One charge/discharge event.

    ``energy`` is the requested kWh *before* the reference's internal
    ``energy *= time_step_ratio`` (``energy_model.py:1036``); the env path
    divides by the ratio first (``building.py:1814-1823``) so the two cancel
    — callers coming from the env should pass the raw energy with
    ``time_step_ratio`` = the schema ratio and pre-divide, exactly like the
    reference. ``prev_efficiency`` is the efficiency history tail used by the
    DoD limit (``energy_model.py:1046-1049`` reads ``round_trip_efficiency``
    *before* the new efficiency is appended).

    ``parity_f64`` reproduces the reference's NumPy-2 scalar dtype flow:
    ``soc`` is read as an np.float32 scalar and Python-float (weak)
    parameters keep the chain in float32 until a strong np.float64 enters —
    so ``soc * capacity`` (``energy_model.py:666``) and the DoD limit chain
    (``energy_model.py:1045-1049``) round to float32 exactly when the
    parameter is a schema literal (``capacity_weak``/``dod_weak``), while
    autosized/sampled parameters (np.float64, strong) keep float64.
    """
    cap = bp.capacity
    energy = energy * time_step_ratio
    action_energy = energy

    if parity_f64:
        rw = lambda x, weak: jnp.where(
            weak, x.astype(jnp.float32).astype(x.dtype), x)
    else:
        rw = lambda x, weak: x

    energy_init = jnp.maximum(0.0, rw(soc_prev * cap, bp.capacity_weak)
                              * (1.0 - bp.loss_coefficient))
    charging = energy >= 0.0

    # SOC-dependent max input/output power (energy_model.py:1070-1090)
    soc_norm = energy_init / jnp.maximum(cap, ZERO)
    max_power = bp.nominal_power * interp_reference(
        soc_norm, bp.capacity_power_curve_x, bp.capacity_power_curve_y)

    # --- charging branch (energy_model.py:1039-1043) ---
    energy_wrt_degrade = degraded_capacity - energy_init
    e_charge = jnp.minimum(
        jnp.minimum(max_power, bp.nominal_power),
        jnp.minimum(energy_wrt_degrade, energy))
    eff_charge = interp_reference(
        jnp.abs(jnp.minimum(action_energy, max_power)) / jnp.maximum(bp.nominal_power, ZERO),
        bp.power_efficiency_curve_x, bp.power_efficiency_curve_y)

    # --- discharging branch (energy_model.py:1045-1052) ---
    old_rt = jnp.sqrt(prev_efficiency)
    soc_limit = 1.0 - bp.depth_of_discharge
    if parity_f64:
        # np.float32(soc) - weak soc_limit rounds f32; x weak capacity again
        soc_diff = rw(soc_prev - soc_limit, bp.dod_weak)
        diff_cap = rw(soc_diff * cap, bp.dod_weak & bp.capacity_weak)
    else:
        diff_cap = (soc_prev - soc_limit) * cap
    energy_limit_dod = -jnp.maximum(diff_cap * old_rt, 0.0)
    e_discharge = jnp.maximum(jnp.maximum(-max_power, energy_limit_dod), energy)
    eff_discharge = interp_reference(
        jnp.minimum(jnp.abs(action_energy), max_power) / jnp.maximum(bp.nominal_power, ZERO),
        bp.power_efficiency_curve_x, bp.power_efficiency_curve_y)

    e = jnp.where(charging, e_charge, e_discharge)
    efficiency = jnp.where(charging, eff_charge, eff_discharge)
    rt = jnp.sqrt(efficiency)

    # StorageDevice.charge with round-trip split (energy_model.py:729-739)
    energy_final = jnp.where(
        e >= 0.0,
        jnp.minimum(energy_init + e * rt, cap),
        jnp.maximum(0.0, energy_init + e / rt))
    soc = energy_final / jnp.maximum(cap, ZERO)

    # set_energy_balance (energy_model.py:744-768)
    delta = energy_final - energy_init
    balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)

    # degradation (energy_model.py:1130-1141)
    degrade = (bp.capacity_loss_coefficient * cap * jnp.abs(balance)
               / (2.0 * jnp.maximum(degraded_capacity, ZERO))) * time_step_ratio
    new_degraded = jnp.maximum(degraded_capacity - degrade, 0.0)

    return BatteryStepResult(soc=soc, energy_balance=balance,
                             efficiency=efficiency, degraded_capacity=new_degraded)
