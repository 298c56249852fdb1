"""Heat pump / electric heater physics (reference ``energy_model.py:157-451``)."""

from __future__ import annotations

import jax.numpy as jnp

from citylearn_tpu.core.types import HVACParams

ZERO = 1e-6


def heat_pump_cop(hp: HVACParams, outdoor_t: jnp.ndarray, heating: bool) -> jnp.ndarray:
    """Carnot COP clamped to (0, 20] (``energy_model.py:216-250``).

    NaN/inf (division by zero at target == outdoor) follows the reference's
    ``cop[cop < 0] = 20; cop[cop > 20] = 20`` numpy comparisons, where NaN
    compares False and would propagate — we map non-finite to 20 as the
    reference's datasets never hit exact equality in practice.
    """
    target = jnp.where(heating, hp.target_heating_temperature, hp.target_cooling_temperature)
    denom = jnp.where(heating, target - outdoor_t, outdoor_t - target)
    cop = hp.efficiency * (target + 273.15) / denom
    cop = jnp.where(cop < 0, 20.0, cop)
    cop = jnp.where(cop > 20, 20.0, cop)
    cop = jnp.where(jnp.isfinite(cop), cop, 20.0)
    return cop


def device_cop(dev: HVACParams, outdoor_t: jnp.ndarray, heating: bool) -> jnp.ndarray:
    """COP for heat pumps, static efficiency passthrough for heaters."""
    return jnp.where(dev.is_heat_pump,
                     heat_pump_cop(dev, outdoor_t, heating),
                     dev.efficiency)


def input_power(dev: HVACParams, output: jnp.ndarray, outdoor_t: jnp.ndarray,
                heating: bool) -> jnp.ndarray:
    """Electric input for thermal ``output`` (``energy_model.py:283-307,403-423``)."""
    hp_in = output / heat_pump_cop(dev, outdoor_t, heating)
    heater_in = output / dev.efficiency
    return jnp.where(dev.is_heat_pump, hp_in, heater_in)


def max_output_power(dev: HVACParams, outdoor_t: jnp.ndarray, heating: bool,
                     max_electric_power: jnp.ndarray,
                     consumed_so_far: jnp.ndarray) -> jnp.ndarray:
    """``min(max_electric_power, available_nominal_power) * cop`` for heat
    pumps, ``min(...) * efficiency``-style for heaters
    (``energy_model.py:252-281, 378-401``). ``available_nominal_power`` =
    ``nominal_power - electricity_consumption[t]`` accrued earlier in this
    step (``energy_model.py:121-124``). ``max_electric_power`` is +inf when
    there is no power outage."""
    available = dev.nominal_power - consumed_so_far
    limit = jnp.minimum(max_electric_power, available)
    hp_out = limit * heat_pump_cop(dev, outdoor_t, heating)
    heater_out = limit * dev.efficiency
    return jnp.where(dev.is_heat_pump, hp_out, heater_out)
