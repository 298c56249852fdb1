"""Single-district temperature/occupant post-pass for the neighborhood
kernel family (see :mod:`citylearn_tpu.ops.pallas_neighborhood`).

Under open-loop plans the LSTM temperature prediction (reference
``building.py:3000-3078``) and the occupant thermostat interaction
(``building.py:3160-3353``) are identical across districts: their only
control-dependent inputs are the demand-observation series the kernel
records, never per-district storage state. So they run ONCE here as an
XLA ``lax.scan``, reusing the scan path's golden-pinned
:func:`citylearn_tpu.core.step.dynamics_update` and
:func:`citylearn_tpu.core.step.occupant_update` — one implementation,
kernel-rate district physics, O(1) temperature work.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from citylearn_tpu.core.params import initial_state
from citylearn_tpu.core.step import dynamics_update, occupant_update
from citylearn_tpu.core.types import DistrictParams, StaticConfig

_OCC_FIELDS = ("occ_csp_override", "occ_hsp_override", "occ_hold_counter",
               "occ_prev_temp", "occ_prev_csp", "occ_prev_hsp")


class _OccState(NamedTuple):
    """State shim for :func:`occupant_update` / ``kpi_table`` final-state
    patching (only the fields they read)."""
    data_offset: jnp.ndarray
    occ_csp_override: jnp.ndarray
    occ_hsp_override: jnp.ndarray
    occ_hold_counter: jnp.ndarray
    occ_prev_temp: jnp.ndarray
    occ_prev_csp: jnp.ndarray
    occ_prev_hsp: jnp.ndarray


_CACHE: Dict[Tuple, callable] = {}


def temp_setpoint_series(cfg: StaticConfig, params: DistrictParams,
                         cool_obs: jnp.ndarray, heat_obs: jnp.ndarray,
                         n_steps: int, data_offset: int = 0):
    """Temperature + effective-setpoint series for ONE district.

    ``cool_obs``/``heat_obs``: (S, B) demand-observation series
    (``device_output + storage discharge``, building.py:1435-1437 — the
    kernel's R_COUT/R_HOUT rows, tanks being inert on this family).

    Returns ``(temp (S, B), csp_eff (S, B), hsp_eff (S, B), final_state)``
    where ``final_state`` carries the post-episode occupant overrides for
    ``kpi_table``'s unwritten-row patch (None without occupants)."""
    key = (cfg, int(n_steps))
    if key not in _CACHE:
        def run(params, cool_obs, heat_obs, off):
            init = initial_state(cfg, params, 0)
            series = params.series

            def body(carry, inputs):
                lh, lc, di, occ = carry
                t, cobs, hobs = inputs
                tau = off + t
                at = lambda arr: jnp.take(arr, tau, axis=0)
                temp_ideal = at(series.indoor_dry_bulb_temperature)
                temp_t, lh, lc, di = dynamics_update(
                    cfg, params, tau, t, cobs, hobs, temp_ideal, lh, lc, di)
                csp_data = at(
                    series.indoor_dry_bulb_temperature_cooling_set_point)
                hsp_data = at(
                    series.indoor_dry_bulb_temperature_heating_set_point)
                if cfg.has_occupant:
                    shim = _OccState(data_offset=off, **occ)
                    csp_eff, hsp_eff, occ = occupant_update(
                        cfg, params, series, shim, csp_data, hsp_data,
                        at(series.hvac_mode), temp_t, t, t == 0,
                        lambda x: x)
                else:
                    csp_eff, hsp_eff = csp_data, hsp_data
                return (lh, lc, di, occ), (temp_t, csp_eff, hsp_eff)

            occ0 = ({f: getattr(init, f) for f in _OCC_FIELDS}
                    if cfg.has_occupant else {})
            steps = jnp.arange(n_steps, dtype=jnp.int32)
            (_, _, _, occf), ys = jax.lax.scan(
                body, (init.lstm_h, init.lstm_c, init.dyn_input, occ0),
                (steps, cool_obs, heat_obs))
            return ys, occf

        _CACHE[key] = jax.jit(run)
    (temp, csp, hsp), occf = _CACHE[key](
        params, cool_obs, heat_obs, jnp.asarray(data_offset, jnp.int32))
    final_state: Optional[_OccState] = None
    if cfg.has_occupant:
        final_state = _OccState(
            data_offset=jnp.asarray(data_offset, jnp.int32), **occf)
    return temp, csp, hsp, final_state
