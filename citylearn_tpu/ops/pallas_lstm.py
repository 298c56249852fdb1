"""Whole-episode Pallas TPU kernel for LSTM-dynamics districts (the 2023
challenge family; reference ``building.py:2804-3158``, ``dynamics.py``).

The fourth whole-episode kernel: partial-load HVAC demand from the
``cooling_device`` action, cooling/DHW thermal blocks + battery (shared
with :mod:`citylearn_tpu.ops.pallas_thermal`), the lookback-window LSTM
temperature prediction re-run every step with carried hidden state (the
reference's shipped semantics, ``building.py:3000-3078``), and the
ComfortReward — all fused over the episode in ONE kernel launch.

LSTM-on-MXU layout: the per-building LSTM weights are packed
block-diagonally into per-layer ``(2 * LANES, 4 * LANES)`` matrices whose
input rows are [x-channel lanes | hidden lanes] and whose columns are
four 128-lane tiles, one per gate (i, f, g, o) — so every step of the
lookback window is ONE ``(TILE_D, 256) @ (256, 512)`` MXU matmul per
layer, and the gate nonlinearities slice at lane-tile boundaries (free on
TPU). HETEROGENEOUS dynamics groups (different hidden sizes, layer
counts 1 or 2, channel maps — e.g. baeda_3dem) pack into the same
matrices: each building gets its own x/h lane offsets, single-layer
buildings carry zero layer-2 blocks, and the prediction head reads from
the concatenated [h1 | h2] lanes so every building's head picks the
right layer. Channel-lane scatters (normalized cooling demand / predicted
temperature into the ring buffer's channel layout) ride one-hot matmuls
like :mod:`citylearn_tpu.ops.pallas_ev`. The lookback ring buffer is a
``(lookback + 1, TILE_D, LANES)`` VMEM scratch addressed modulo its
length — no per-step copying.

Physics bit-compatible with :func:`citylearn_tpu.core.step.district_step`
for the eligible configuration (no outage/EVs/WMs/occupants, one dynamics
group covering every building, cooling-device partial load only);
eligibility is checked by the dispatcher in
:mod:`citylearn_tpu.core.rollout_fast.run_lstm_episode`.
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
from citylearn_tpu.ops.pallas_thermal import (
    CN,
    CT_CAP,
    CT_CONV,
    DN,
    DT_CAP,
    DT_CONV,
    N_TROWS,
    _cop,
    _thermal_block,
)

ZERO = 1e-6
TILE_D = 256
T_CHUNK = 128
LANES = 128

# lstm parameter rows (lparams, (N_LROWS, LANES)); building lanes use the
# B_PAD layout (lane b = building b) except the *_CH rows (channel layout,
# lane b * F + f)
(L_NMIN_CC, L_NSPAN_CC,      # cooling-demand channel norm (B_PAD layout)
 L_NMIN_TC, L_NSPAN_TC,      # temperature channel norm (B_PAD layout)
 L_LIN_B,                    # linear head bias (B_PAD layout)
 L_COOL_ACTIVE,              # cooling_device action availability (B_PAD)
 L_BMASK,                    # 1.0 for real buildings (B_PAD)
 N_LROWS) = range(8)

# recorded per-step series rows (record=True)
(R_NET, R_CBAL, R_DBAL, R_BBAL, R_CSOC, R_DSOC, R_BSOC, R_COUT, R_DOUT,
 R_TEMP, R_REWARD, R_CDEM, R_NSLMET, N_LREC) = range(14)


def _lstm_cell(xh, w_ref, bias_row):
    """One stacked-LSTM cell: ``xh`` (TILE_D, 2 * LANES) = [x | h] lanes,
    ``w_ref`` (2 * LANES, 4 * LANES) packed weights, ``bias_row``
    (1, 4 * LANES). Returns the four gate tiles' result given cell state:
    callers apply ``c' = f * c + i * g; h' = o * tanh(c')``."""
    gates = jnp.dot(xh, w_ref[:, :], preferred_element_type=jnp.float32) \
        + bias_row
    i = jax.nn.sigmoid(gates[:, 0 * LANES:1 * LANES])
    f = jax.nn.sigmoid(gates[:, 1 * LANES:2 * LANES])
    g = jnp.tanh(gates[:, 2 * LANES:3 * LANES])
    o = jax.nn.sigmoid(gates[:, 3 * LANES:4 * LANES])
    return i, f, g, o


def _episode_kernel(  # HBM streams, (T_pad, LANES) each
                    acdev_hbm, acstor_hbm, adstor_hbm, abat_hbm,
                    nsl_hbm, solar_hbm, price_hbm, carbon_hbm,
                    cool_hbm, dhw_hbm, outdoor_hbm, mode_hbm,
                    tempi_hbm, csp_hbm, hsp_hbm, band_hbm, schan_hbm,
                    outage_hbm,
                    # VMEM params
                    bparams_ref,                                 # (8, LANES)
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,  # (P, LANES)
                    tparams_ref,                                 # (N_TROWS, LANES)
                    lparams_ref,                                 # (N_LROWS, LANES)
                    w1_ref, w2_ref,          # (2L, 4L) packed LSTM layers
                    bias_ref,                # (2, 4 * LANES)
                    linw_ref,                # (2 * LANES, LANES) head: rows
                                             # [h1-lanes | h2-lanes] so
                                             # single-layer units read h1
                    pcc_ref, ptc_ref,        # (LANES, LANES) lane scatters
                    tmask_ref,               # (1, LANES) temp-channel mask
                    # per-tile initial state
                    csoc0_ref, dsoc0_ref, soc0_ref, eff0_ref, deg0_ref,
                    # outputs
                    reward_ref, cost_ref, emission_ref,
                    csoc_ref, dsoc_ref, soc_ref, eff_ref, deg_ref, temp_ref,
                    *rest,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, lookback: int, lo_exp: float, hi_exp: float,
                    record: bool):
    n_streams = 18
    if record:
        rec_out, = rest[:1]
        bufs = rest[1:1 + n_streams]
        sems, ring, rec_buf, rec_sem = rest[1 + n_streams:]
    else:
        bufs = rest[:n_streams]
        sems, ring = rest[n_streams:]
    (acdev_buf, acstor_buf, adstor_buf, abat_buf, nsl_buf, solar_buf,
     price_buf, carbon_buf, cool_buf, dhw_buf, outdoor_buf, mode_buf,
     tempi_buf, csp_buf, hsp_buf, band_buf, schan_buf, outage_buf) = bufs
    hbms = (acdev_hbm, acstor_hbm, adstor_hbm, abat_hbm, nsl_hbm, solar_hbm,
            price_hbm, carbon_hbm, cool_hbm, dhw_hbm, outdoor_hbm, mode_hbm,
            tempi_hbm, csp_hbm, hsp_hbm, band_hbm, schan_hbm, outage_hbm)

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
    lp = lparams_ref[:, :]
    nmin_cc = lp[L_NMIN_CC, :][None, :]
    nspan_cc = lp[L_NSPAN_CC, :][None, :]
    nmin_tc = lp[L_NMIN_TC, :][None, :]
    nspan_tc = lp[L_NSPAN_TC, :][None, :]
    lin_b = lp[L_LIN_B, :][None, :]
    cool_active = lp[L_COOL_ACTIVE, :][None, :] > 0.5
    bmask = lp[L_BMASK, :][None, :]
    bias1 = bias_ref[0, :][None, :]
    bias2 = bias_ref[1, :][None, :]
    tmask = tmask_ref[0, :][None, :] > 0.5
    cdev_nominal = tparams[CN, :][None, :]

    is_tile0 = pl.program_id(0) == 0
    n_chunks = pl.cdiv(n_steps, T_CHUNK)
    RING = lookback + 1

    def chunk_dma(slot, ci):
        start = ci * T_CHUNK
        return [pltpu.make_async_copy(
            hbm.at[pl.ds(start, T_CHUNK), :], buf.at[slot], sems.at[slot, i])
            for i, (hbm, buf) in enumerate(zip(hbms, bufs))]

    for d in chunk_dma(0, 0):
        d.start()
    ring[...] = jnp.zeros(ring.shape, jnp.float32)

    def chunk_body(ci, carry):
        (csoc, dsoc, soc, eff, deg, h1, c1, h2, c2,
         rew, cost, emis, temp_prev) = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for d in chunk_dma((ci + 1) % 2, ci + 1):
                d.start()

        for d in chunk_dma(slot, ci):
            d.wait()

        def step_body(tl, carry):
            (csoc, dsoc, soc, eff, deg, h1, c1, h2, c2,
             rew, cost, emis, temp_prev) = carry
            t = ci * T_CHUNK + tl
            row = lambda buf: buf[slot, tl, :][None, :]
            a_cdev = row(acdev_buf)
            a_cstor = row(acstor_buf)
            a_dstor = row(adstor_buf)
            a_bat = row(abat_buf)
            nsl = row(nsl_buf)
            solar = row(solar_buf)
            price = row(price_buf)
            carbon = row(carbon_buf)
            cool_ideal = row(cool_buf)
            dhw_d = row(dhw_buf)
            outdoor = row(outdoor_buf)
            mode = row(mode_buf)
            temp_ideal = row(tempi_buf)
            csp = row(csp_buf)
            hsp = row(hsp_buf)
            band = row(band_buf)
            schan = row(schan_buf)
            outage = row(outage_buf)

            is_t0 = t == 0
            t0f = jnp.where(is_t0, 1.0, 0.0)

            # reset-time update_variables consumptions (prefilled demand)
            cop_c0 = _cop(tparams, CN, outdoor, False)
            cop_d0 = _cop(tparams, DN, outdoor, True)
            reset_cool = cool_ideal / cop_c0
            reset_dhw = dhw_d / cop_d0
            dev_init_c = t0f * reset_cool
            dev_init_d = t0f * reset_dhw

            # ---- partial-load cooling demand (building.py:3080-3121):
            # the device action sets available electric power; demand
            # becomes the device's max output, gated by hvac_mode, once
            # the LSTM input buffer is full (t >= lookback + 1) ----
            warm_ctl = t >= lookback + 1
            elec_c = a_cdev * cdev_nominal * hours_ratio
            limit = jnp.minimum(elec_c, cdev_nominal - dev_init_c)
            partial_c = limit * cop_c0
            partial_c = jnp.where((mode == 1.0) | (mode == 3.0),
                                  partial_c, 0.0)
            use_partial = jnp.logical_and(warm_ctl, cool_active)
            cooling_demand = jnp.where(use_partial, partial_c, cool_ideal)

            # ---- battery charge event (energy_model.py:1027-1141),
            # used for both the early (discharge-first) and late
            # (flex-clamped charge) variants under outage ----
            def battery_step(energy):
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
                bsoc = final / jnp.maximum(cap, ZERO)
                delta = final - energy_init
                balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)
                new_deg = jnp.maximum(
                    deg - (clc * cap * jnp.abs(balance)
                           / (2.0 * jnp.maximum(deg, ZERO))) * ratio, 0.0)
                return bsoc, balance, new_eff, new_deg

            flex_of = lambda accum: jnp.where(
                outage > 0.0, jnp.maximum(0.0, solar - accum), jnp.inf)

            # downward-flexibility coupling (core/step.py order): early
            # battery discharge books consumption before the thermal
            # blocks; the late (charging) variant is flex-clamped after
            # the non-shiftable load
            bat_energy = a_bat * nominal * hours_ratio
            e_soc, e_bal, e_eff, e_deg = battery_step(bat_energy)
            bat_dis = bat_energy < 0.0
            accum = t0f * (reset_cool + reset_dhw + nsl) \
                + jnp.where(bat_dis, e_bal, 0.0)

            csoc_n, cbal, cout, ccons, cop_c = _thermal_block(
                tparams, CN, CT_CAP, CT_CONV, csoc, cooling_demand, a_cstor,
                outdoor, False, dev_init_c, 1.0, ratio,
                outage=outage, solar=solar, cons_accum=accum)
            accum = accum + ccons
            dsoc_n, dbal, dout, dcons, cop_d = _thermal_block(
                tparams, DN, DT_CAP, DT_CONV, dsoc, dhw_d, a_dstor, outdoor,
                True, dev_init_d, hours_ratio, ratio,
                outage=outage, solar=solar, cons_accum=accum)
            accum = accum + dcons
            nsl_met = jnp.minimum(nsl, flex_of(accum))
            accum = accum + nsl_met

            l_soc, l_bal, l_eff, l_deg = battery_step(
                jnp.minimum(bat_energy, flex_of(accum)))
            pickb = lambda e_, l_: jnp.where(bat_dis, e_, l_)
            bsoc_n = pickb(e_soc, l_soc)
            balance = pickb(e_bal, l_bal)
            new_eff = pickb(e_eff, l_eff)
            new_deg = pickb(e_deg, l_deg)

            uv_cool = (cout + cbal) / cop_c
            uv_dhw = (dout + dbal) / cop_d
            cool_total = ccons + t0f * (reset_cool + uv_cool)
            dhw_total = dcons + t0f * (reset_dhw + uv_dhw)
            nsl_term = nsl_met + t0f * (nsl + nsl_met)
            bat_term = balance + t0f * balance
            net = cool_total + dhw_total + nsl_term + bat_term - solar
            net = jnp.where(outage > 0.0, 0.0, net)

            # ---- LSTM temperature prediction ----
            cool_obs = cout + jnp.maximum(-cbal, 0.0)        # B_PAD layout
            cool_obs_n = (cool_obs - nmin_cc) / nspan_cc
            temp_ideal_n = (temp_ideal - nmin_tc) / nspan_tc
            # scatter the dynamic channels into the (b * F + f) lane layout
            dyn_col = (jnp.dot(cool_obs_n, pcc_ref[:, :],
                               preferred_element_type=jnp.float32)
                       + jnp.dot(temp_ideal_n, ptc_ref[:, :],
                                 preferred_element_type=jnp.float32))
            # schan has zeros at the dynamic-channel lanes (dispatcher)
            new_col = jnp.broadcast_to(schan + dyn_col, (TILE_D, LANES))
            tail = t % RING
            ring[pl.ds(tail, 1), :, :] = new_col[None, :, :]

            warm = t >= lookback
            h1n, c1n, h2n, c2n = h1, c1, h2, c2
            for s in range(lookback):
                main_slot = (tail + 2 + s) % RING     # logical pos s + 1
                tmp_slot = (tail + 1 + s) % RING      # logical pos s
                xm = ring[pl.ds(main_slot, 1), :, :][0]
                xt = ring[pl.ds(tmp_slot, 1), :, :][0]
                x_s = jnp.where(tmask, xt, xm)
                i1, f1, g1, o1 = _lstm_cell(
                    jnp.concatenate([x_s, h1n], axis=1), w1_ref, bias1)
                c1n = f1 * c1n + i1 * g1
                h1n = o1 * jnp.tanh(c1n)
                i2, f2, g2, o2 = _lstm_cell(
                    jnp.concatenate([h1n, h2n], axis=1), w2_ref, bias2)
                c2n = f2 * c2n + i2 * g2
                h2n = o2 * jnp.tanh(c2n)
            pred_n = jnp.dot(jnp.concatenate([h1n, h2n], axis=1),
                             linw_ref[:, :],
                             preferred_element_type=jnp.float32) + lin_b
            pred_temp = pred_n * nspan_tc + nmin_tc
            temp_t = jnp.where(jnp.logical_and(warm, bmask > 0.5),
                               pred_temp, temp_ideal)
            # overwrite the tail's temperature channel with the prediction
            # (building.py:3060-3065) once warm
            patched = jnp.where(
                tmask, jnp.dot(pred_n, ptc_ref[:, :],
                               preferred_element_type=jnp.float32), new_col)
            upd = jnp.where(warm, patched, new_col)
            ring[pl.ds(tail, 1), :, :] = upd[None, :, :]
            # hidden state persists only once warm (building.py:3021-3024)
            h1 = jnp.where(warm, h1n, h1)
            c1 = jnp.where(warm, c1n, c1)
            h2 = jnp.where(warm, h2n, h2)
            c2 = jnp.where(warm, c2n, c2)

            # ---- ComfortReward (reward_function.py:216-340) ----
            def powe(d, e):
                if e == 1.0:
                    return d
                if e == 2.0:
                    return d * d
                if e == 3.0:
                    return d * d * d
                return jnp.power(d, e)

            heating = 0.0 > cool_obs                 # heating_obs is 0 here
            T = temp_t
            sp = jnp.where(mode == 1.0, csp, hsp)
            d_sp = jnp.abs(T - sp)
            r_single = jnp.where(
                T < sp - band,
                -jnp.where(mode == 2.0, powe(d_sp, lo_exp),
                           powe(d_sp, hi_exp)),
                jnp.where(T < sp, jnp.where(heating, 0.0, -d_sp),
                          jnp.where(T <= sp + band,
                                    jnp.where(heating, -d_sp, 0.0),
                                    -jnp.where(heating, powe(d_sp, hi_exp),
                                               powe(d_sp, lo_exp)))))
            cd = jnp.abs(T - csp)
            hd = jnp.abs(T - hsp)
            r_dual = jnp.where(
                T < hsp - band,
                -jnp.where(heating, powe(hd, lo_exp), powe(hd, hi_exp)),
                jnp.where(T < hsp, -hd,
                          jnp.where(T <= csp, 0.0,
                                    jnp.where(T < csp + band, -cd,
                                              -jnp.where(heating,
                                                         powe(cd, hi_exp),
                                                         powe(cd, lo_exp))))))
            r = jnp.where((mode == 1.0) | (mode == 2.0), r_single, r_dual)
            r = r * bmask

            if record:
                rec_buf[R_NET, pl.ds(tl, 1), :] = net[0:1, :]
                rec_buf[R_CBAL, pl.ds(tl, 1), :] = cbal[0:1, :]
                rec_buf[R_DBAL, pl.ds(tl, 1), :] = dbal[0:1, :]
                rec_buf[R_BBAL, pl.ds(tl, 1), :] = balance[0:1, :]
                rec_buf[R_CSOC, pl.ds(tl, 1), :] = csoc_n[0:1, :]
                rec_buf[R_DSOC, pl.ds(tl, 1), :] = dsoc_n[0:1, :]
                rec_buf[R_BSOC, pl.ds(tl, 1), :] = bsoc_n[0:1, :]
                rec_buf[R_COUT, pl.ds(tl, 1), :] = cout[0:1, :]
                rec_buf[R_DOUT, pl.ds(tl, 1), :] = dout[0:1, :]
                rec_buf[R_TEMP, pl.ds(tl, 1), :] = temp_t[0:1, :]
                rec_buf[R_REWARD, pl.ds(tl, 1), :] = r[0:1, :]
                rec_buf[R_CDEM, pl.ds(tl, 1), :] = \
                    jnp.broadcast_to(cooling_demand, (TILE_D, LANES))[0:1, :]
                rec_buf[R_NSLMET, pl.ds(tl, 1), :] = \
                    jnp.broadcast_to(nsl_met, (TILE_D, LANES))[0:1, :]

            live = t < n_steps
            keep = lambda new, old: jnp.where(live, new, old)
            rew = keep(rew + r, rew)
            cost = keep(cost + net * price, cost)
            emis = keep(emis + jnp.maximum(net * carbon, 0.0), emis)
            return (keep(csoc_n, csoc), keep(dsoc_n, dsoc),
                    keep(bsoc_n, soc), keep(new_eff, eff),
                    keep(new_deg, deg),
                    keep(h1, carry[5]), keep(c1, carry[6]),
                    keep(h2, carry[7]), keep(c2, carry[8]),
                    rew, cost, emis, keep(temp_t, temp_prev))

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
    init = (csoc0_ref[:, :], dsoc0_ref[:, :], soc0_ref[:, :], eff0_ref[:, :],
            deg0_ref[:, :], zeros, zeros, zeros, zeros, zeros, zeros, zeros,
            zeros)
    (csoc, dsoc, soc, eff, deg, _h1, _c1, _h2, _c2,
     rew, cost, emis, temp_last) = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                                     init)
    reward_ref[:, :] = rew
    cost_ref[:, :] = cost
    emission_ref[:, :] = emis
    csoc_ref[:, :] = csoc
    dsoc_ref[:, :] = dsoc
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg
    temp_ref[:, :] = temp_last


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "hours_ratio", "ratio", "n_knots", "lookback", "lo_exp",
    "hi_exp", "record", "interpret"))
def lstm_episode(actions: Tuple[jnp.ndarray, ...],
                 series: Tuple[jnp.ndarray, ...],
                 bparams: jnp.ndarray, curves: Tuple[jnp.ndarray, ...],
                 tparams: jnp.ndarray, lparams: jnp.ndarray,
                 w1: jnp.ndarray, w2: jnp.ndarray, bias: jnp.ndarray,
                 linw: jnp.ndarray, pcc: jnp.ndarray, ptc: jnp.ndarray,
                 tmask: jnp.ndarray,
                 csoc0: jnp.ndarray, dsoc0: jnp.ndarray, soc0: jnp.ndarray,
                 eff0: jnp.ndarray, deg0: jnp.ndarray,
                 n_steps: int, hours_ratio: float, ratio: float,
                 n_knots: int, lookback: int, lo_exp: float = 2.0,
                 hi_exp: float = 2.0, record: bool = False,
                 interpret: bool = False):
    """Full episode for a (D, B) LSTM-dynamics district batch.

    actions: 4 x (T_pad, LANES) open-loop plans (cooling_device,
    cooling_storage, dhw_storage, electrical_storage); series: 14 x
    (T_pad, LANES) float32 (nsl, solar, price, carbon, cooling_demand,
    dhw_demand, outdoor, hvac_mode, indoor_temp, cooling_sp, heating_sp,
    comfort_band, static_channels, power_outage). Returns (reward_sum, cost_sum,
    emission_sum, cool_soc, dhw_soc, bat_soc, bat_eff, bat_degraded,
    last_temp) and, with ``record=True``, an (N_LREC, T_pad, LANES)
    per-step stream of district 0."""
    D = soc0.shape[0]
    T_pad = series[0].shape[0]
    grid = (D // TILE_D,)
    state_spec = pl.BlockSpec((TILE_D, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((D, LANES), jnp.float32)] * 9
    out_specs = [state_spec] * 9
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_streams = 18
    scratch = [pltpu.VMEM((2, T_CHUNK, LANES), jnp.float32)] * n_streams \
        + [pltpu.SemaphoreType.DMA((2, n_streams)),
           pltpu.VMEM((lookback + 1, TILE_D, LANES), jnp.float32)]
    if record:
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((N_LREC, T_pad, LANES), jnp.float32)]
        out_specs = out_specs + [hbm_spec]
        scratch = scratch + [pltpu.VMEM((N_LREC, T_CHUNK, LANES), jnp.float32),
                             pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[hbm_spec] * n_streams + [small] * 14 + [state_spec] * 5,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_episode_kernel, n_steps=n_steps,
                               hours_ratio=hours_ratio, ratio=ratio,
                               n_knots=n_knots, lookback=lookback,
                               lo_exp=lo_exp, hi_exp=hi_exp, record=record)
    pec_x, pec_y, cpc_x, cpc_y = curves
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(*actions, *series, bparams, pec_x, pec_y, cpc_x, cpc_y, tparams,
      lparams, w1, w2, bias, linw, pcc, ptc, tmask,
      csoc0, dsoc0, soc0, eff0, deg0)
