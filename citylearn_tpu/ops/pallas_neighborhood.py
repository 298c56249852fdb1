"""Whole-episode Pallas TPU kernel for the EULP-neighborhood and quebec
dataset families — the last five datasets off the kernels (VERDICT r4
#3): ``{ca_alameda,tx_travis,vt_chittenden}_county_neighborhood`` (100/
100/47 heterogeneous LSTM-dynamics buildings, signed
``cooling_or_heating_device`` partial load, default reward) and the two
``quebec_neighborhood_*`` sets (20 buildings, heating-side partial load,
occupant thermostat interaction, ComfortReward).

Design: the per-district physics — partial-load demand from the device
actions (reference ``building.py:3080-3158``), device dispatch, battery,
net accounting, default reward — fuses here over the episode exactly
like :mod:`citylearn_tpu.ops.pallas_thermal`. The LSTM temperature
prediction and occupant interaction do NOT run in-kernel: under
open-loop plans (the kernel-backed evaluation surface) they are
IDENTICAL across districts — temperature depends only on the
demand-observation series the kernel records, never on per-district
storage state — so they run ONCE as a single-district XLA scan post-pass
(:mod:`citylearn_tpu.core.neighborhood_eval`) that reuses the scan
path's own ``dynamics_update``/``occupant_update``. That factorization
is what makes 47-100-building heterogeneous neighborhoods (whose packed
LSTM lanes exceed any single tile) kernel-servable: the O(D) work rides
the kernel, the O(1) temperature sequence doesn't bloat it.

Why every storage tank is inert on this family (``neighborhood_packable``
gates on it): the five datasets ship zero cooling/heating tank capacity,
and the reference converts ``dhw_storage`` actions through the *heating*
tank capacity (shipped quirk, ``building.py:1765``) — so EULP's nonzero
dhw tanks can never charge (their action converts to 0 energy) and only
decay by standby loss. The kernel therefore runs device-only thermal
blocks (both priority variants coincide) plus the battery.

The kernel's reward output is the default exponent-1 reward
``-max(net, 0)`` (``reward_function.py:65-88``, the EULP configuration);
quebec's temperature-dependent ComfortReward is assembled host-side from
the post-pass — the kernel-backed *evaluation* surface never consumes
rewards. Physics is bit-compatible with
:func:`citylearn_tpu.core.step.district_step` for the gated
configuration; eligibility lives in
``core/rollout_fast.run_neighborhood_episode``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from citylearn_tpu.ops.pallas_battery import _interp
from citylearn_tpu.ops.pallas_thermal import _cop

ZERO = 1e-6
TILE_D = 256
T_CHUNK = 128     # 14 double-buffered streams: keep VMEM under budget
LANES = 128

# neighborhood parameter rows (nparams, (N_NROWS, LANES)); device rows
# are (nominal, efficiency, target_temperature, is_heat_pump) so
# pallas_thermal._cop's offset convention applies
(CN_, CE_, CTC_, CHP_,            # cooling device
 HN_, HE_, HTH_, HHP_,            # heating device
 DN_, DE_, DTH_, DHP_,            # dhw device
 DT_CAP_, DT_LOSS_,               # dhw tank (standby-loss SOC decay only)
 COOL_ACT_, HEAT_ACT_, COH_ACT_,  # partial-load action availability
 N_NROWS) = range(18)

# recorded per-step series rows (record=True)
(R_NET, R_BBAL, R_BSOC, R_DSOC, R_COUT, R_HOUT, R_DOUT, R_CDEM, R_HDEM,
 N_NREC) = range(10)


def _episode_kernel(acoh_hbm, acdev_hbm, ahdev_hbm, abat_hbm,  # actions
                    nsl_hbm, solar_hbm, price_hbm, carbon_hbm,
                    cool_hbm, heat_hbm, dhw_hbm, outdoor_hbm, mode_hbm,
                    bparams_ref,            # (8, LANES) battery
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,
                    nparams_ref,            # (N_NROWS, LANES)
                    dsoc0_ref,                                   # (TILE, B)
                    soc0_ref, eff0_ref, deg0_ref,                # (TILE, B)
                    reward_ref, cost_ref, emission_ref,          # out
                    dsoc_ref, soc_ref, eff_ref, deg_ref,
                    *rest,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, lookback: int, record: bool):
    n_streams = 13
    if record:
        rec_out, = rest[:1]
        bufs = rest[1:1 + n_streams]
        sems, rec_buf, rec_sem = rest[1 + n_streams:]
    else:
        bufs = rest[:n_streams]
        sems, = rest[n_streams:]
    (acoh_buf, acdev_buf, ahdev_buf, abat_buf, nsl_buf, solar_buf,
     price_buf, carbon_buf, cool_buf, heat_buf, dhw_buf, outdoor_buf,
     mode_buf) = bufs
    hbms = (acoh_hbm, acdev_hbm, ahdev_hbm, abat_hbm, nsl_hbm, solar_hbm,
            price_hbm, carbon_hbm, cool_hbm, heat_hbm, dhw_hbm, outdoor_hbm,
            mode_hbm)

    cap = bparams_ref[0, :][None, :]
    nominal = bparams_ref[1, :][None, :]
    loss = bparams_ref[2, :][None, :]
    dod = bparams_ref[4, :][None, :]
    clc = bparams_ref[5, :][None, :]
    pec_x = pec_x_ref[:, :]
    pec_y = pec_y_ref[:, :]
    cpc_x = cpc_x_ref[:, :]
    cpc_y = cpc_y_ref[:, :]
    npm = nparams_ref[:, :]
    cn = npm[CN_, :][None, :]
    hn = npm[HN_, :][None, :]
    dn = npm[DN_, :][None, :]
    he_eff = npm[HE_, :][None, :]
    de_eff = npm[DE_, :][None, :]
    hhp = npm[HHP_, :][None, :] > 0.5
    dt_cap = npm[DT_CAP_, :][None, :]
    dt_loss = npm[DT_LOSS_, :][None, :]
    cool_active = npm[COOL_ACT_, :][None, :] > 0.5
    heat_active = npm[HEAT_ACT_, :][None, :] > 0.5
    coh_active = npm[COH_ACT_, :][None, :] > 0.5

    is_tile0 = pl.program_id(0) == 0
    n_chunks = pl.cdiv(n_steps, T_CHUNK)

    def chunk_dma(slot, ci):
        start = ci * T_CHUNK
        return [pltpu.make_async_copy(
            hbm.at[pl.ds(start, T_CHUNK), :], buf.at[slot], sems.at[slot, i])
            for i, (hbm, buf) in enumerate(zip(hbms, bufs))]

    for d in chunk_dma(0, 0):
        d.start()

    def chunk_body(ci, carry):
        dsoc, soc, eff, deg, rew, cost, emis = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for d in chunk_dma((ci + 1) % 2, ci + 1):
                d.start()

        for d in chunk_dma(slot, ci):
            d.wait()

        def step_body(tl, carry):
            dsoc, soc, eff, deg, rew, cost, emis = carry
            t = ci * T_CHUNK + tl
            row = lambda buf: buf[slot, tl, :][None, :]
            a_coh = row(acoh_buf)
            a_cdev = row(acdev_buf)
            a_hdev = row(ahdev_buf)
            a_bat = row(abat_buf)
            nsl = row(nsl_buf)
            solar = row(solar_buf)
            price = row(price_buf)
            carbon = row(carbon_buf)
            cool_d = row(cool_buf)
            heat_d = row(heat_buf)
            dhw_d = row(dhw_buf)
            outdoor = row(outdoor_buf)
            mode = row(mode_buf)

            is_t0 = t == 0
            t0f = jnp.where(is_t0, 1.0, 0.0)

            cop_c = _cop(npm, CN_, outdoor, False)
            cop_h = _cop(npm, HN_, outdoor, True)
            cop_d = _cop(npm, DN_, outdoor, True)
            reset_cool = cool_d / cop_c
            # non-heat-pump heating books through the DHW device's
            # efficiency at reset (quirk, building.py:2629-2632)
            reset_heat = jnp.where(hhp, heat_d / cop_h, heat_d / de_eff)
            reset_dhw = dhw_d / cop_d
            dev_init_c = t0f * reset_cool
            dev_init_h = t0f * reset_heat
            dev_init_d = t0f * reset_dhw

            # ---- partial-load demand (building.py:3080-3158): the
            # signed cooling_or_heating action splits into the device
            # fractions; control starts once the LSTM input buffer is
            # full. Heating takes no hours ratio (building.py:3146). ----
            warm_ctl = t >= lookback + 1
            cool_frac = jnp.where(coh_active,
                                  jnp.abs(jnp.minimum(a_coh, 0.0)), a_cdev)
            heat_frac = jnp.where(coh_active,
                                  jnp.abs(jnp.maximum(a_coh, 0.0)), a_hdev)
            elec_c = cool_frac * cn * hours_ratio
            partial_c = jnp.minimum(elec_c, cn - dev_init_c) * cop_c
            partial_c = jnp.where((mode == 1.0) | (mode == 3.0),
                                  partial_c, 0.0)
            cooling_demand = jnp.where(
                jnp.logical_and(warm_ctl, cool_active | coh_active),
                partial_c, cool_d)
            elec_h = heat_frac * hn
            partial_h = jnp.minimum(elec_h, hn - dev_init_h) * cop_h
            partial_h = jnp.where((mode == 2.0) | (mode == 3.0),
                                  partial_h, 0.0)
            heating_demand = jnp.where(
                jnp.logical_and(warm_ctl, heat_active | coh_active),
                partial_h, heat_d)

            # ---- device-only thermal dispatch (all tanks inert; no
            # outage -> flexibility +inf, blocks decouple) ----
            cout = jnp.minimum(cooling_demand, (cn - dev_init_c) * cop_c)
            ccons = jnp.maximum(0.0, cout / cop_c)
            hout = jnp.minimum(heating_demand, (hn - dev_init_h) * cop_h)
            hcons = jnp.maximum(0.0, hout / cop_h)
            dout = jnp.minimum(dhw_d, (dn - dev_init_d) * cop_d)
            dcons = jnp.maximum(0.0, dout / cop_d)
            # dhw tank: charge(0) each step -> pure standby-loss decay
            denergy = jnp.maximum(0.0, dsoc * dt_cap * (1.0 - dt_loss))
            dsoc_n = denergy / jnp.maximum(dt_cap, ZERO)

            # ---- battery (energy_model.py:1027-1141) ----
            energy = a_bat * nominal * hours_ratio
            energy_init = jnp.maximum(0.0, soc * cap * (1.0 - loss))
            soc_norm = energy_init / jnp.maximum(cap, ZERO)
            max_power = nominal * _interp(soc_norm, cpc_x, cpc_y, n_knots)
            charging = energy >= 0.0
            e_chg = jnp.minimum(jnp.minimum(max_power, nominal),
                                jnp.minimum(deg - energy_init, energy))
            eff_chg = _interp(jnp.abs(jnp.minimum(energy, max_power))
                              / jnp.maximum(nominal, ZERO), pec_x, pec_y,
                              n_knots)
            old_rt = jnp.sqrt(eff)
            e_dod = -jnp.maximum((soc - (1.0 - dod)) * cap * old_rt, 0.0)
            e_dis = jnp.maximum(jnp.maximum(-max_power, e_dod), energy)
            eff_dis = _interp(jnp.minimum(jnp.abs(energy), max_power)
                              / jnp.maximum(nominal, ZERO), pec_x, pec_y,
                              n_knots)
            e = jnp.where(charging, e_chg, e_dis)
            new_eff = jnp.where(charging, eff_chg, eff_dis)
            rt = jnp.sqrt(new_eff)
            final = jnp.where(e >= 0.0,
                              jnp.minimum(energy_init + e * rt, cap),
                              jnp.maximum(0.0, energy_init + e / rt))
            new_soc = final / jnp.maximum(cap, ZERO)
            delta = final - energy_init
            balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)
            new_deg = jnp.maximum(
                deg - (clc * cap * jnp.abs(balance)
                       / (2.0 * jnp.maximum(deg, ZERO))) * ratio, 0.0)

            # ---- update_variables accounting incl. t == 0 multi-count
            # (building.py:2615-2703; core/step.py cool_total et al.) ----
            uv_cool = cout / cop_c
            uv_heat = jnp.where(hhp, hout / cop_h, hout / de_eff)
            uv_dhw = dout / cop_d
            cool_total = ccons + t0f * (reset_cool + uv_cool)
            heat_total = hcons + t0f * (reset_heat + uv_heat)
            dhw_total = dcons + t0f * (reset_dhw + uv_dhw)
            nsl_term = nsl + t0f * 2.0 * nsl
            bat_term = balance + t0f * balance
            net = (cool_total + heat_total + dhw_total + nsl_term + bat_term
                   - solar)

            if record:
                rec_buf[R_NET, pl.ds(tl, 1), :] = net[0:1, :]
                rec_buf[R_BBAL, pl.ds(tl, 1), :] = balance[0:1, :]
                rec_buf[R_BSOC, pl.ds(tl, 1), :] = new_soc[0:1, :]
                rec_buf[R_DSOC, pl.ds(tl, 1), :] = dsoc_n[0:1, :]
                rec_buf[R_COUT, pl.ds(tl, 1), :] = cout[0:1, :]
                rec_buf[R_HOUT, pl.ds(tl, 1), :] = hout[0:1, :]
                rec_buf[R_DOUT, pl.ds(tl, 1), :] = dout[0:1, :]
                rec_buf[R_CDEM, pl.ds(tl, 1), :] = cooling_demand[0:1, :]
                rec_buf[R_HDEM, pl.ds(tl, 1), :] = heating_demand[0:1, :]

            live = t < n_steps
            keep = lambda new, old: jnp.where(live, new, old)
            rew = keep(rew - jnp.maximum(net, 0.0), rew)
            cost = keep(cost + net * price, cost)
            emis = keep(emis + jnp.maximum(net * carbon, 0.0), emis)
            return (keep(dsoc_n, dsoc), keep(new_soc, soc),
                    keep(new_eff, eff), keep(new_deg, deg), rew, cost, emis)

        out = jax.lax.fori_loop(0, T_CHUNK, step_body, carry)
        if record:
            @pl.when(is_tile0)
            def _():
                copy = pltpu.make_async_copy(
                    rec_buf, rec_out.at[:, pl.ds(ci * T_CHUNK, T_CHUNK), :],
                    rec_sem)
                copy.start()
                copy.wait()
        return out

    zeros = jnp.zeros_like(soc0_ref[:, :])
    dsoc, soc, eff, deg, rew, cost, emis = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (dsoc0_ref[:, :], soc0_ref[:, :], eff0_ref[:, :], deg0_ref[:, :],
         zeros, zeros, zeros))
    reward_ref[:, :] = rew
    cost_ref[:, :] = cost
    emission_ref[:, :] = emis
    dsoc_ref[:, :] = dsoc
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "hours_ratio", "ratio", "n_knots", "lookback", "record",
    "interpret"))
def neighborhood_episode(actions: Tuple[jnp.ndarray, ...],
                         series: Tuple[jnp.ndarray, ...],
                         bparams: jnp.ndarray,
                         curves: Tuple[jnp.ndarray, ...],
                         nparams: jnp.ndarray,
                         dsoc0: jnp.ndarray, soc0: jnp.ndarray,
                         eff0: jnp.ndarray, deg0: jnp.ndarray,
                         n_steps: int, hours_ratio: float, ratio: float,
                         n_knots: int, lookback: int, record: bool = False,
                         interpret: bool = False):
    """Full episode for a (D, B) neighborhood district batch.

    actions: 4 x (T_pad, LANES) open-loop plans (cooling_or_heating_device,
    cooling_device, heating_device, electrical_storage); series: 9 x
    (T_pad, LANES) (nsl, solar, price, carbon, cooling_demand,
    heating_demand, dhw_demand, outdoor, hvac_mode). Returns (reward_sum,
    cost_sum, emission_sum, dhw_soc, bat_soc, bat_eff, bat_degraded) and,
    with ``record=True``, an (N_NREC, T_pad, LANES) per-step stream of
    district 0."""
    D = soc0.shape[0]
    T_pad = series[0].shape[0]
    grid = (D // TILE_D,)
    state_spec = pl.BlockSpec((TILE_D, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((D, LANES), jnp.float32)] * 7
    out_specs = [state_spec] * 7
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_streams = 13
    scratch = [pltpu.VMEM((2, T_CHUNK, LANES), jnp.float32)] * n_streams \
        + [pltpu.SemaphoreType.DMA((2, n_streams))]
    if record:
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((N_NREC, T_pad, LANES), jnp.float32)]
        out_specs = out_specs + [hbm_spec]
        scratch = scratch + [pltpu.VMEM((N_NREC, T_CHUNK, LANES), jnp.float32),
                             pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[hbm_spec] * n_streams + [small] * 6 + [state_spec] * 4,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_episode_kernel, n_steps=n_steps,
                               hours_ratio=hours_ratio, ratio=ratio,
                               n_knots=n_knots, lookback=lookback,
                               record=record)
    pec_x, pec_y, cpc_x, cpc_y = curves
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(*actions, *series, bparams, pec_x, pec_y, cpc_x, cpc_y, nparams,
      dsoc0, soc0, eff0, deg0)
