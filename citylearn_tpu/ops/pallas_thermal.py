"""Whole-episode Pallas TPU kernel for thermal-storage districts.

Extends the battery fast path (:mod:`citylearn_tpu.ops.pallas_battery`) to
the 2021-family configuration: cooling + DHW end-uses with heat-pump /
electric-heater devices and storage tanks, plus the battery — the full
no-outage district step fused over the episode. The grid tiles the
district batch, seven driver series and three (T, B) open-loop action
plans stream HBM -> VMEM in double-buffered time chunks, and all storage
state lives in VMEM.

Like the battery kernel, this is a product surface, not just a bench
artifact: actions are per-building per-step streams (hour-indexed RBC
tables are one broadcast of them), and ``record=True`` streams the
per-step series of district-tile 0 back to HBM (net, tank/battery
balances, SOCs, device outputs) so
:mod:`citylearn_tpu.core.evaluate_fast` can produce the reference's full
normalized KPI table (``citylearn.py:1136-1323``) at kernel speed.

Physics is bit-compatible with :func:`citylearn_tpu.core.step.district_step`
for the eligible configuration (reference ``building.py:1641-1823``,
``energy_model.py:157-451,603-871,1027-1141``): both priority-order
variants of each thermal block are computed and sign-selected, the
capacity-conversion quirks (DHW uses the *heating* tank capacity,
``building.py:1765``) and the t == 0 consumption multi-count are
reproduced. With no outage the ``downward_electrical_flexibility``
coupling is +inf, so the blocks decouple exactly like the XLA step.
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

ZERO = 1e-6
TILE_D = 256
T_CHUNK = 256     # 10 double-buffered streams: keep VMEM under budget

# thermal parameter rows (see _pack_thermal in core/rollout_fast.py)
(CN, CE, CTC, CHP,              # cooling device
 DN, DE, DTH, DHP,              # dhw device
 CT_CAP, CT_RT, CT_LOSS, CT_MI, CT_MO, CT_CONV,   # cooling tank
 DT_CAP, DT_RT, DT_LOSS, DT_MI, DT_MO, DT_CONV,   # dhw tank
 N_TROWS) = range(21)

# recorded per-step series rows (record=True)
(R_NET, R_CBAL, R_DBAL, R_BBAL, R_CSOC, R_DSOC, R_BSOC, R_COUT, R_DOUT,
 N_TREC) = range(10)


def _cop(tparams, dev_off, outdoor, heating: bool):
    """Carnot COP for heat pumps, constant efficiency for heaters
    (``energy_model.py:216-250``; the is-heat-pump row selects)."""
    eff = tparams[dev_off + 1, :][None, :]
    target = tparams[dev_off + 2, :][None, :]
    is_hp = tparams[dev_off + 3, :][None, :] > 0.5
    denom = jnp.where(heating, target - outdoor, outdoor - target)
    cop = eff * (target + 273.15) / denom
    cop = jnp.where(cop < 0, 20.0, cop)
    cop = jnp.where(cop > 20, 20.0, cop)
    cop = jnp.where(jnp.isnan(cop), 20.0, cop)
    return jnp.where(is_hp, cop, eff)


def _tank(tparams, off, soc, energy, ratio):
    """StorageTank charge event (``energy_model.py:603-871`` with the env's
    pre-divide; see core/storage.tank_charge). Returns (soc', balance)."""
    cap = tparams[off + 0, :][None, :]
    rt = tparams[off + 1, :][None, :]
    loss = tparams[off + 2, :][None, :]
    max_in = tparams[off + 3, :][None, :]
    max_out = tparams[off + 4, :][None, :]
    e = jnp.where(energy >= 0.0, jnp.minimum(energy, max_in),
                  jnp.maximum(-max_out, energy))
    e = e * ratio
    energy_init = jnp.maximum(0.0, soc * cap * (1.0 - loss))
    final = jnp.where(e >= 0.0,
                      jnp.minimum(energy_init + e * rt, cap),
                      jnp.maximum(0.0, energy_init + e / rt))
    new_soc = final / jnp.maximum(cap, ZERO)
    delta = final - energy_init
    balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)
    return new_soc, balance


def _thermal_block(tparams, dev_off, tank_off, conv_row, soc, demand, action,
                   outdoor, heating: bool, dev_init, hours_mul, ratio,
                   outage=None, solar=None, cons_accum=None):
    """One end-use: both priority variants, sign-selected
    (core/step._thermal_block). Without ``outage``, the
    downward-electrical-flexibility coupling is +inf and the blocks
    decouple; with it, device output is capped by
    ``max(0, solar - cons_accum)`` during an outage exactly like
    ``building.py:640-668``. Returns
    (soc', balance, device_output, apply_consumption, cop)."""
    nominal = tparams[dev_off + 0, :][None, :]
    cop = _cop(tparams, dev_off, outdoor, heating)
    conv_cap = tparams[conv_row, :][None, :]
    energy_req = action * conv_cap * hours_mul

    if outage is None:
        flex = lambda accum: jnp.inf
    else:
        flex = lambda accum: jnp.where(
            outage > 0.0, jnp.maximum(0.0, solar - accum), jnp.inf)
        if cons_accum is None:
            cons_accum = jnp.zeros_like(demand)

    def max_out(booked, accum):
        avail = nominal - booked
        if outage is None:
            return avail * cop
        return jnp.minimum(flex(accum), avail) * cop

    accum0 = cons_accum if cons_accum is not None else 0.0

    # variant A: device first, then storage charge
    out_A = jnp.minimum(demand, max_out(dev_init, accum0))
    cons_dev_A = jnp.maximum(0.0, out_A / cop)
    charge_A = jnp.minimum(max_out(dev_init + cons_dev_A,
                                   accum0 + cons_dev_A), energy_req)
    soc_A, bal_A = _tank(tparams, tank_off, soc, charge_A / ratio, ratio)
    cons_store_A = jnp.maximum(bal_A, 0.0) / cop

    # variant B: storage discharge first, then device
    discharge_B = jnp.maximum(-demand, energy_req)
    soc_B, bal_B = _tank(tparams, tank_off, soc, discharge_B / ratio, ratio)
    cons_store_B = jnp.maximum(bal_B, 0.0) / cop
    storage_out_B = -jnp.minimum(bal_B, 0.0)
    # cons_store_B is 0 for a true discharge (bal_B <= 0); booked like
    # core/step.py:133-136 for exactness
    out_B = jnp.minimum(demand - storage_out_B,
                        max_out(dev_init + cons_store_B,
                                accum0 + cons_store_B))
    cons_dev_B = jnp.maximum(0.0, out_B / cop)

    dis = action < 0.0
    pick = lambda a, b: jnp.where(dis, b, a)
    return (pick(soc_A, soc_B), pick(bal_A, bal_B), pick(out_A, out_B),
            pick(cons_dev_A + cons_store_A, cons_dev_B + cons_store_B), cop)


def _episode_kernel(acool_hbm, adhw_hbm, abat_hbm,   # (T, B) HBM action plans
                    nsl_hbm, solar_hbm, price_hbm, carbon_hbm,
                    cool_hbm, dhw_hbm, outdoor_hbm,              # (T, B) HBM
                    bparams_ref,            # (8, B) VMEM (battery)
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,  # (P, B) VMEM
                    tparams_ref,            # (N_TROWS, B) VMEM
                    csoc0_ref, dsoc0_ref,                        # (TILE, B)
                    soc0_ref, eff0_ref, deg0_ref,                # (TILE, B)
                    reward_ref, cost_ref, emission_ref,          # (TILE, B) out
                    csoc_ref, dsoc_ref, soc_ref, eff_ref, deg_ref,
                    *rest,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, record: bool):
    if record:
        rec_out, = rest[:1]                  # (N_TREC, T_pad, B) HBM out
        (acool_buf, adhw_buf, abat_buf,
         nsl_buf, solar_buf, price_buf, carbon_buf,
         cool_buf, dhw_buf, outdoor_buf, sems, rec_buf, rec_sem) = rest[1:]
    else:
        (acool_buf, adhw_buf, abat_buf,
         nsl_buf, solar_buf, price_buf, carbon_buf,
         cool_buf, dhw_buf, outdoor_buf, sems) = rest
    cap = bparams_ref[0, :][None, :]
    nominal = bparams_ref[1, :][None, :]
    loss = bparams_ref[2, :][None, :]
    dod = bparams_ref[4, :][None, :]
    clc = bparams_ref[5, :][None, :]
    pec_x = pec_x_ref[:, :]
    pec_y = pec_y_ref[:, :]
    cpc_x = cpc_x_ref[:, :]
    cpc_y = cpc_y_ref[:, :]
    tparams = tparams_ref[:, :]

    is_tile0 = pl.program_id(0) == 0
    n_chunks = pl.cdiv(n_steps, T_CHUNK)
    streams = [(acool_hbm, acool_buf), (adhw_hbm, adhw_buf),
               (abat_hbm, abat_buf),
               (nsl_hbm, nsl_buf), (solar_hbm, solar_buf),
               (price_hbm, price_buf), (carbon_hbm, carbon_buf),
               (cool_hbm, cool_buf), (dhw_hbm, dhw_buf),
               (outdoor_hbm, outdoor_buf)]

    def chunk_dma(slot, ci):
        start = ci * T_CHUNK
        return [pltpu.make_async_copy(
            hbm.at[pl.ds(start, T_CHUNK), :], buf.at[slot], sems.at[slot, i])
            for i, (hbm, buf) in enumerate(streams)]

    for d in chunk_dma(0, 0):
        d.start()

    def chunk_body(ci, carry):
        csoc, dsoc, soc, eff, deg, rew, cost, emis = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for d in chunk_dma((ci + 1) % 2, ci + 1):
                d.start()

        for d in chunk_dma(slot, ci):
            d.wait()

        def step_body(tl, carry):
            csoc, dsoc, soc, eff, deg, rew, cost, emis = carry
            t = ci * T_CHUNK + tl
            a_cool = acool_buf[slot, tl, :][None, :]
            a_dhw = adhw_buf[slot, tl, :][None, :]
            a_bat = abat_buf[slot, tl, :][None, :]
            nsl = nsl_buf[slot, tl, :][None, :]
            solar = solar_buf[slot, tl, :][None, :]
            price = price_buf[slot, tl, :][None, :]
            carbon = carbon_buf[slot, tl, :][None, :]
            cool_d = cool_buf[slot, tl, :][None, :]
            dhw_d = dhw_buf[slot, tl, :][None, :]
            outdoor = outdoor_buf[slot, tl, :][None, :]

            is_t0 = t == 0
            t0f = jnp.where(is_t0, 1.0, 0.0)

            # reset-time update_variables consumptions (prefilled demand)
            cop_c0 = _cop(tparams, CN, outdoor, False)
            cop_d0 = _cop(tparams, DN, outdoor, True)
            reset_cool = cool_d / cop_c0
            reset_dhw = dhw_d / cop_d0
            dev_init_c = t0f * reset_cool
            dev_init_d = t0f * reset_dhw

            # thermal blocks (flex = +inf, so no cross-block coupling)
            csoc_n, cbal, cout, ccons, cop_c = _thermal_block(
                tparams, CN, CT_CAP, CT_CONV, csoc, cool_d, a_cool, outdoor,
                False, dev_init_c, 1.0, ratio)
            dsoc_n, dbal, dout, dcons, cop_d = _thermal_block(
                tparams, DN, DT_CAP, DT_CONV, dsoc, dhw_d, a_dhw, outdoor,
                True, dev_init_d, hours_ratio, ratio)

            # battery (energy_model.py:1027-1141; flex = +inf -> the early
            # and late variants coincide)
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

            # update_variables accounting with the t == 0 multi-count
            # (building.py:2615-2703; see core/step.py cool_total et al.)
            uv_cool = (cout + cbal) / cop_c
            uv_dhw = (dout + dbal) / cop_d
            cool_total = ccons + t0f * (reset_cool + uv_cool)
            dhw_total = dcons + t0f * (reset_dhw + uv_dhw)
            nsl_term = nsl + t0f * 2.0 * nsl
            bat_term = balance + t0f * balance
            net = cool_total + dhw_total + nsl_term + bat_term - solar

            if record:
                rec_buf[R_NET, pl.ds(tl, 1), :] = net[0:1, :]
                rec_buf[R_CBAL, pl.ds(tl, 1), :] = cbal[0:1, :]
                rec_buf[R_DBAL, pl.ds(tl, 1), :] = dbal[0:1, :]
                rec_buf[R_BBAL, pl.ds(tl, 1), :] = balance[0:1, :]
                rec_buf[R_CSOC, pl.ds(tl, 1), :] = csoc_n[0:1, :]
                rec_buf[R_DSOC, pl.ds(tl, 1), :] = dsoc_n[0:1, :]
                rec_buf[R_BSOC, pl.ds(tl, 1), :] = new_soc[0:1, :]
                rec_buf[R_COUT, pl.ds(tl, 1), :] = cout[0:1, :]
                rec_buf[R_DOUT, pl.ds(tl, 1), :] = dout[0:1, :]

            live = t < n_steps
            keep = lambda new, old: jnp.where(live, new, old)
            rew = keep(rew - jnp.maximum(net, 0.0), rew)
            cost = keep(cost + net * price, cost)
            emis = keep(emis + jnp.maximum(net * carbon, 0.0), emis)
            return (keep(csoc_n, csoc), keep(dsoc_n, dsoc),
                    keep(new_soc, soc), keep(new_eff, eff),
                    keep(new_deg, deg), rew, cost, emis)

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
    csoc, dsoc, soc, eff, deg, rew, cost, emis = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (csoc0_ref[:, :], dsoc0_ref[:, :], soc0_ref[:, :], eff0_ref[:, :],
         deg0_ref[:, :], zeros, zeros, zeros))
    reward_ref[:, :] = rew
    cost_ref[:, :] = cost
    emission_ref[:, :] = emis
    csoc_ref[:, :] = csoc
    dsoc_ref[:, :] = dsoc
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg


@functools.partial(jax.jit, static_argnames=("n_steps", "hours_ratio", "ratio",
                                             "n_knots", "record", "interpret"))
def thermal_episode(actions: Tuple[jnp.ndarray, ...],
                    series: Tuple[jnp.ndarray, ...],
                    bparams: jnp.ndarray, curves: Tuple[jnp.ndarray, ...],
                    tparams: jnp.ndarray,
                    csoc0: jnp.ndarray, dsoc0: jnp.ndarray,
                    soc0: jnp.ndarray, eff0: jnp.ndarray, deg0: jnp.ndarray,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, record: bool = False,
                    interpret: bool = False):
    """Full episode for a (D, B) thermal district batch.

    actions: 3 x (T_pad, B) per-step per-building open-loop plans
    (cooling_storage, dhw_storage, electrical_storage); series: 7 x
    (T_pad, B) float32 (nsl, solar, price, carbon, cooling_demand,
    dhw_demand, outdoor). Returns (reward_sum, cost_sum, emission_sum,
    cool_soc, dhw_soc, bat_soc, bat_eff, bat_degraded) and, with
    ``record=True``, an extra (N_TREC, T_pad, B) per-step stream of
    district 0's (net, cooling/dhw/battery balances, SOCs, device
    outputs)."""
    D, B = soc0.shape
    T_pad = series[0].shape[0]
    grid = (D // TILE_D,)
    state_spec = pl.BlockSpec((TILE_D, B), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((D, B), jnp.float32)] * 8
    out_specs = [state_spec] * 8
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((2, T_CHUNK, B), jnp.float32)] * 10 \
        + [pltpu.SemaphoreType.DMA((2, 10))]
    if record:
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((N_TREC, T_pad, B), jnp.float32)]
        out_specs = out_specs + [hbm_spec]
        scratch = scratch + [pltpu.VMEM((N_TREC, T_CHUNK, B), jnp.float32),
                             pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[hbm_spec] * 10 + [small] * 6 + [state_spec] * 5,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_episode_kernel, n_steps=n_steps,
                               hours_ratio=hours_ratio, ratio=ratio,
                               n_knots=n_knots, record=record)
    pec_x, pec_y, cpc_x, cpc_y = curves
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(*actions, *series, bparams, pec_x, pec_y, cpc_x, cpc_y, tparams,
      csoc0, dsoc0, soc0, eff0, deg0)
