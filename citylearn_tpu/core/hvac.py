"""Heat pump / electric heater physics (reference ``energy_model.py:157-451``).

Parity-mode dtype notes (``parity``): the reference wraps the per-step
np.float32 outdoor temperature in ``np.array`` (``energy_model.py:240``),
producing a 0-d float32 array; weak Python-float parameters then keep the
whole Carnot chain in float32 under NumPy 2 / NEP 50 — the COP numerator is
cast to float32, the ``target - outdoor`` subtraction rounds to float32 and
the division happens in float32. ``available_nominal_power`` subtracts a
float32 consumption store and rounds likewise. The max-output product is
float64 (``np.min([...])`` of a list promotes to np.float64,
``energy_model.py:281``). ``parity=False`` is the identity (all-float32
TPU fast path)."""

from __future__ import annotations

import jax.numpy as jnp

from citylearn_tpu.core.types import HVACParams

ZERO = 1e-6


def _r32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32).astype(x.dtype)


def heat_pump_cop(hp: HVACParams, outdoor_t: jnp.ndarray, heating: bool,
                  parity: bool = False) -> jnp.ndarray:
    """Carnot COP clamped to (0, 20] (``energy_model.py:216-250``).

    NaN/inf (division by zero at target == outdoor) follows the reference's
    ``cop[cop < 0] = 20; cop[cop > 20] = 20`` numpy comparisons, where NaN
    compares False and would propagate — we map non-finite to 20 as the
    reference's datasets never hit exact equality in practice.
    """
    target = jnp.where(heating, hp.target_heating_temperature, hp.target_cooling_temperature)
    denom = jnp.where(heating, target - outdoor_t, outdoor_t - target)
    num = hp.efficiency * (target + 273.15)
    if parity:
        num, denom = _r32(num), _r32(denom)
    cop = num / denom
    if parity:
        cop = _r32(cop)
    cop = jnp.where(cop < 0, 20.0, cop)
    cop = jnp.where(cop > 20, 20.0, cop)
    cop = jnp.where(jnp.isfinite(cop), cop, 20.0)
    return cop


def device_cop(dev: HVACParams, outdoor_t: jnp.ndarray, heating: bool,
               parity: bool = False) -> jnp.ndarray:
    """COP for heat pumps, static efficiency passthrough for heaters."""
    return jnp.where(dev.is_heat_pump,
                     heat_pump_cop(dev, outdoor_t, heating, parity),
                     dev.efficiency)


def input_power(dev: HVACParams, output: jnp.ndarray, outdoor_t: jnp.ndarray,
                heating: bool, parity: bool = False,
                round_result: bool = True) -> jnp.ndarray:
    """Electric input for thermal ``output`` (``energy_model.py:283-307,403-423``).

    ``round_result=False`` keeps the division unrounded in parity mode —
    the reference's division dtype follows the OBJECT dtype of ``output``
    (a float64 ``get_max_output_power`` product stays float64 end to end;
    a float32 demand-series value makes it float32). Callers that know
    which object won a ``min()`` select per value."""
    hp_in = output / heat_pump_cop(dev, outdoor_t, heating, parity)
    heater_in = output / dev.efficiency
    res = jnp.where(dev.is_heat_pump, hp_in, heater_in)
    # the reference's output operand is float32 in the common paths (demand
    # series / float32 consumption stores), making the division float32
    return _r32(res) if (parity and round_result) else res


def max_output_power(dev: HVACParams, outdoor_t: jnp.ndarray, heating: bool,
                     max_electric_power: jnp.ndarray,
                     consumed_so_far: jnp.ndarray,
                     parity: bool = False) -> jnp.ndarray:
    """``min(max_electric_power, available_nominal_power) * cop`` for heat
    pumps, ``min(...) * efficiency``-style for heaters
    (``energy_model.py:252-281, 378-401``). ``available_nominal_power`` =
    ``nominal_power - electricity_consumption[t]`` accrued earlier in this
    step (``energy_model.py:121-124``). ``max_electric_power`` is +inf when
    there is no power outage."""
    available = dev.nominal_power - consumed_so_far
    if parity:
        # py-float nominal minus a float32 consumption store rounds to f32
        available = _r32(available)
    limit = jnp.minimum(max_electric_power, available)
    cop = heat_pump_cop(dev, outdoor_t, heating, parity)
    hp_out = limit * cop
    heater_out = limit * dev.efficiency
    # the product stays float64 in the reference (np.min list -> np.float64)
    return jnp.where(dev.is_heat_pump, hp_out, heater_out)
