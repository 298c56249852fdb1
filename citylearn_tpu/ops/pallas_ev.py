"""Whole-episode Pallas TPU kernel for EV-charger districts.

The third fast-path variant (after :mod:`pallas_battery` and
:mod:`pallas_thermal`): battery+PV buildings plus EV chargers, electric
vehicles and washing machines — the ``..._plus_evs`` configuration whose
XLA scan path is dispatch-bound (~120 tiny fusions per step; see README
"Performance"). Twelve driver/schedule series stream HBM -> VMEM in
double-buffered chunks and ALL dynamic charger<->EV indexing is done with
one-hot MXU matmuls built per step from the connected-EV index stream:

    onehot[v, c] = (iota_v == connected_ev[t, c])
    gathered_c   = state_v @ onehot            # (D_tile, V) @ (V, C)
    scattered_v  = updates_c @ onehot^T        # masked write-back

which replaces the scan path's per-step gather/scatter kernels with two
small matmuls riding the MXU.

Physics and accounting are bit-compatible with
:func:`citylearn_tpu.core.step.district_step` for the eligible
configuration (no outage/thermal/constraints): charger efficiency-curve
interpolation at |action| (``electric_vehicle_charger.py:252-329``), EV
battery charge with SOC events (force-set / unconnected drift,
``compiler/events.py``), washing-machine trigger collapse
(``energy_model.py:1289-1334``) and the Electric_Vehicles_Reward_Function
(``reward_function.py:389-517``).

Lane layout: buildings, chargers, EVs and washing machines each occupy
the first B/C/V/W lanes of their own 128-lane tiles. Actions are
per-step per-target (T, lane) open-loop streams — per-building battery
plans, PER-CHARGER EV plans and per-machine triggers — not scalars
broadcast across targets.
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
T_CHUNK = 128     # 12 double-buffered streams: keep VMEM under budget
LANES = 128

# battery parameter rows (shared layout with pallas_battery bparams)
# charger parameter rows (C lanes)
(CH_MAXC, CH_MINC, CH_MAXD, CH_MIND, N_CROWS) = range(5)
# EV battery parameter rows (V lanes)
(EV_CAP, EV_NOM, EV_LOSS, EV_INIT, EV_DOD, EV_CLC, N_EVROWS) = range(7)

# recorded per-step series rows (record=True); building-lane layout
(R_NET, R_BBAL, R_BSOC, R_CHC, R_WMC, R_REW, N_EREC) = range(7)


def _episode_kernel(abat_hbm, aev_hbm, awm_hbm,      # (T, B/C/W) action plans
                    viol_hbm,                        # (T, B) violation kWh
                    # HBM streams
                    nsl_hbm, solar_hbm, price_hbm, carbon_hbm,   # (T, B)
                    conn_hbm, req_hbm, dep_hbm,                  # (T, C)
                    force_hbm, drift_hbm,                        # (T, V)
                    wms_hbm, wme_hbm, wml_hbm,                   # (T, W)
                    # VMEM params
                    bparams_ref,                                 # (8, B)
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,  # bldg battery
                    cparams_ref,                                 # (N_CROWS, C)
                    ch_cx_ref, ch_cy_ref, ch_dx_ref, ch_dy_ref,  # charger eff
                    evparams_ref,                                # (N_EVROWS, V)
                    ev_px_ref, ev_py_ref, ev_cx_ref, ev_cy_ref,  # EV curves
                    ch_bld_ref,                                  # (C, B) onehot
                    wm_bld_ref,                                  # (W, B) onehot
                    # state in
                    soc0_ref, eff0_ref, deg0_ref,                # (TILE, B)
                    evsoc0_ref, eveff0_ref, evdeg0_ref,          # (TILE, V)
                    wmi0_ref,                                    # (TILE, W)
                    # outputs
                    reward_ref, cost_ref, emission_ref,
                    soc_ref, eff_ref, deg_ref,
                    evsoc_ref, eveff_ref, evdeg_ref, wmi_ref,
                    *rest,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, ev_knots: int, ch_knots: int,
                    ev_weights: Tuple[float, ...], use_ev_reward: bool,
                    penalty_coefficient: float, record: bool):
    if record:
        rec_out, = rest[:1]                  # (N_EREC, T_pad, LANES) HBM
        rest = rest[1:]
        (abat_buf, aev_buf, awm_buf, viol_buf,
         nsl_buf, solar_buf, price_buf, carbon_buf,
         conn_buf, req_buf, dep_buf, force_buf, drift_buf,
         wms_buf, wme_buf, wml_buf, sems, rec_buf, rec_sem) = rest
    else:
        (abat_buf, aev_buf, awm_buf, viol_buf,
         nsl_buf, solar_buf, price_buf, carbon_buf,
         conn_buf, req_buf, dep_buf, force_buf, drift_buf,
         wms_buf, wme_buf, wml_buf, sems) = rest
    cap = bparams_ref[0, :][None, :]
    nominal = bparams_ref[1, :][None, :]
    loss = bparams_ref[2, :][None, :]
    dod = bparams_ref[4, :][None, :]
    clc = bparams_ref[5, :][None, :]
    pec_x = pec_x_ref[:, :]
    pec_y = pec_y_ref[:, :]
    cpc_x = cpc_x_ref[:, :]
    cpc_y = cpc_y_ref[:, :]
    maxc = cparams_ref[CH_MAXC, :][None, :]
    minc = cparams_ref[CH_MINC, :][None, :]
    maxd = cparams_ref[CH_MAXD, :][None, :]
    mind = cparams_ref[CH_MIND, :][None, :]
    ch_bld = ch_bld_ref[:, :]
    wm_bld = wm_bld_ref[:, :]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    is_tile0 = pl.program_id(0) == 0
    n_chunks = pl.cdiv(n_steps, T_CHUNK)
    streams = [(abat_hbm, abat_buf), (aev_hbm, aev_buf), (awm_hbm, awm_buf),
               (viol_hbm, viol_buf),
               (nsl_hbm, nsl_buf), (solar_hbm, solar_buf),
               (price_hbm, price_buf), (carbon_hbm, carbon_buf),
               (conn_hbm, conn_buf), (req_hbm, req_buf), (dep_hbm, dep_buf),
               (force_hbm, force_buf), (drift_hbm, drift_buf),
               (wms_hbm, wms_buf), (wme_hbm, wme_buf), (wml_hbm, wml_buf)]

    def chunk_dma(slot, ci):
        start = ci * T_CHUNK
        return [pltpu.make_async_copy(
            hbm.at[pl.ds(start, T_CHUNK), :], buf.at[slot], sems.at[slot, i])
            for i, (hbm, buf) in enumerate(streams)]

    for d in chunk_dma(0, 0):
        d.start()

    def chunk_body(ci, carry):
        (soc, eff, deg, evsoc, eveff, evdeg, wmi, wprev_s, wprev_e,
         rew, cost, emis) = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for d in chunk_dma((ci + 1) % 2, ci + 1):
                d.start()

        for d in chunk_dma(slot, ci):
            d.wait()

        def step_body(tl, carry):
            (soc, eff, deg, evsoc, eveff, evdeg, wmi, wprev_s, wprev_e,
             rew, cost, emis) = carry
            t = ci * T_CHUNK + tl
            a_bat = abat_buf[slot, tl, :][None, :]
            a_ev = aev_buf[slot, tl, :][None, :]
            a_wm = awm_buf[slot, tl, :][None, :]
            viol = viol_buf[slot, tl, :][None, :]
            nsl = nsl_buf[slot, tl, :][None, :]
            solar = solar_buf[slot, tl, :][None, :]
            price = price_buf[slot, tl, :][None, :]
            carbon = carbon_buf[slot, tl, :][None, :]
            conn = conn_buf[slot, tl, :][None, :]        # (1, C) f32, -1 none
            req = req_buf[slot, tl, :][None, :]
            dep = dep_buf[slot, tl, :][None, :]
            force = force_buf[slot, tl, :][None, :]      # (1, V), NaN none
            drift = drift_buf[slot, tl, :][None, :]
            wm_s = wms_buf[slot, tl, :][None, :]         # (1, W)
            wm_e = wme_buf[slot, tl, :][None, :]
            wm_l = wml_buf[slot, tl, :][None, :]
            is_t0 = t == 0
            t0f = jnp.where(is_t0, 1.0, 0.0)

            # ---- building battery (identical to pallas_battery) ----
            energy = a_bat * nominal * hours_ratio
            energy_init = jnp.maximum(0.0, soc * cap * (1.0 - loss))
            soc_norm = energy_init / jnp.maximum(cap, ZERO)
            max_power = nominal * _interp(soc_norm, cpc_x, cpc_y, n_knots)
            charging = energy >= 0.0
            e_chg = jnp.minimum(jnp.minimum(max_power, nominal),
                                jnp.minimum(deg - energy_init, energy))
            eff_chg = _interp(jnp.abs(jnp.minimum(energy, max_power))
                              / jnp.maximum(nominal, ZERO), pec_x, pec_y, n_knots)
            old_rt = jnp.sqrt(eff)
            e_dod = -jnp.maximum((soc - (1.0 - dod)) * cap * old_rt, 0.0)
            e_dis = jnp.maximum(jnp.maximum(-max_power, e_dod), energy)
            eff_dis = _interp(jnp.minimum(jnp.abs(energy), max_power)
                              / jnp.maximum(nominal, ZERO), pec_x, pec_y, n_knots)
            e = jnp.where(charging, e_chg, e_dis)
            new_eff = jnp.where(charging, eff_chg, eff_dis)
            rt = jnp.sqrt(new_eff)
            final = jnp.where(e >= 0.0,
                              jnp.minimum(energy_init + e * rt, cap),
                              jnp.maximum(0.0, energy_init + e / rt))
            new_soc = final / jnp.maximum(cap, ZERO)
            delta = final - energy_init
            bat_balance = jnp.where(delta >= 0.0, delta / rt, delta * rt)
            new_deg = jnp.maximum(
                deg - (clc * cap * jnp.abs(bat_balance)
                       / (2.0 * jnp.maximum(deg, ZERO))) * ratio, 0.0)

            # ---- EV SOC events (compiler/events.py; step.py:296-305) ----
            evp = evparams_ref[:, :]
            ev_init_soc = evp[EV_INIT, :][None, :]
            base = t0f * ev_init_soc
            soc_evented = jnp.where(
                ~jnp.isnan(force), force,
                jnp.where(~jnp.isnan(drift),
                          jnp.minimum(jnp.maximum(evsoc * drift, 0.0), 1.0),
                          base))
            soc_read_v = jnp.where(is_t0, soc_evented, evsoc)

            # ---- charger<->EV one-hot (V, C): built from the index row ----
            conn_i = jnp.broadcast_to(conn, (LANES, LANES)).astype(jnp.int32)
            # non-negative guard: -1 (disconnected) must not match lane -1
            onehot = ((iota_v == conn_i)
                      & (jnp.broadcast_to(conn, (LANES, LANES)) >= 0.0)
                      ).astype(jnp.float32)
            gather = lambda x_v: jnp.dot(x_v, onehot,
                                         preferred_element_type=jnp.float32)
            connected = conn >= 0.0

            # ---- charger energy request (step.py:350-363); per-charger
            # (1, C) action row (pad lanes are inert: zero power limits
            # and conn = -1) ----
            a_c = a_ev
            chg = a_c > 0.0
            e_chg_c = jnp.maximum(jnp.minimum(a_c * maxc * hours_ratio, maxc),
                                  minc)
            e_dis_c = jnp.maximum(jnp.minimum(a_c * maxd * hours_ratio, -mind),
                                  -maxd)
            energy_c = jnp.where(chg, e_chg_c, e_dis_c)
            eff_c = jnp.where(
                chg,
                _interp(jnp.abs(a_c), ch_cx_ref[:, :], ch_cy_ref[:, :], ch_knots),
                _interp(jnp.abs(a_c), ch_dx_ref[:, :], ch_dy_ref[:, :], ch_knots))
            energy_kwh = jnp.where(chg, energy_c * eff_c, energy_c / eff_c)

            # ---- EV battery charge on the charger lanes (params gathered
            # through the same one-hot) ----
            g_cap = jnp.dot(evp[EV_CAP, :][None, :], onehot)
            g_nom = jnp.dot(evp[EV_NOM, :][None, :], onehot)
            g_loss = jnp.dot(evp[EV_LOSS, :][None, :], onehot)
            g_dod = jnp.dot(evp[EV_DOD, :][None, :], onehot)
            g_clc = jnp.dot(evp[EV_CLC, :][None, :], onehot)
            g_soc = gather(soc_read_v)
            g_eff = gather(eveff)
            g_deg = gather(evdeg)
            g_px = jnp.dot(ev_px_ref[:, :], onehot)
            g_py = jnp.dot(ev_py_ref[:, :], onehot)
            g_cx = jnp.dot(ev_cx_ref[:, :], onehot)
            g_cy = jnp.dot(ev_cy_ref[:, :], onehot)
            # disconnected/pad charger columns gather all-zero curves whose
            # zero-width segments would produce NaN in _interp; splice in an
            # identity curve there (results are gated by `applied` anyway)
            col_valid = jnp.sum(onehot, axis=0, keepdims=True)   # (1, C)
            knot_pos = jax.lax.broadcasted_iota(jnp.int32, g_px.shape, 0)
            ident_x = (knot_pos >= 1).astype(jnp.float32)        # [0,1,1,...]
            fix = 1.0 - col_valid
            g_px = g_px + fix * ident_x
            g_py = g_py + fix
            g_cx = g_cx + fix * ident_x
            g_cy = g_cy + fix

            ei_c = jnp.maximum(0.0, g_soc * g_cap * (1.0 - g_loss))
            sn_c = ei_c / jnp.maximum(g_cap, ZERO)
            mp_c = g_nom * _interp(sn_c, g_cx, g_cy, ev_knots)
            chg_e = energy_kwh >= 0.0
            ec_c = jnp.minimum(jnp.minimum(mp_c, g_nom),
                               jnp.minimum(g_deg - ei_c, energy_kwh))
            effc_c = _interp(jnp.abs(jnp.minimum(energy_kwh, mp_c))
                             / jnp.maximum(g_nom, ZERO), g_px, g_py, ev_knots)
            ort_c = jnp.sqrt(g_eff)
            edod_c = -jnp.maximum((g_soc - (1.0 - g_dod)) * g_cap * ort_c, 0.0)
            ed_c = jnp.maximum(jnp.maximum(-mp_c, edod_c), energy_kwh)
            effd_c = _interp(jnp.minimum(jnp.abs(energy_kwh), mp_c)
                             / jnp.maximum(g_nom, ZERO), g_px, g_py, ev_knots)
            e_c = jnp.where(chg_e, ec_c, ed_c)
            neweff_c = jnp.where(chg_e, effc_c, effd_c)
            rt_c = jnp.sqrt(neweff_c)
            final_c = jnp.where(e_c >= 0.0,
                                jnp.minimum(ei_c + e_c * rt_c, g_cap),
                                jnp.maximum(0.0, ei_c + e_c / rt_c))
            newsoc_c = final_c / jnp.maximum(g_cap, ZERO)
            delta_c = final_c - ei_c
            bal_c = jnp.where(delta_c >= 0.0, delta_c / rt_c, delta_c * rt_c)
            newdeg_c = jnp.maximum(
                g_deg - (g_clc * g_cap * jnp.abs(bal_c)
                         / (2.0 * jnp.maximum(g_deg, ZERO))) * ratio, 0.0)

            applied = (a_c != 0.0) & connected
            appf = applied.astype(jnp.float32)
            bal_c = jnp.where(applied, bal_c, 0.0)
            cons_c = jnp.where(applied,
                               jnp.where(bal_c >= 0.0, bal_c / eff_c,
                                         bal_c * eff_c), 0.0)
            charger_energy = jnp.where(a_c != 0.0, energy_c, 0.0)

            # scatter applied updates back to the EV lanes
            scat = lambda x_c: jnp.dot(x_c, onehot.T,
                                       preferred_element_type=jnp.float32)
            amask_v = scat(appf)
            keepm = 1.0 - amask_v
            evsoc_n = soc_evented * keepm + scat(newsoc_c * appf)
            eveff_n = eveff * keepm + scat(neweff_c * appf)
            evdeg_n = evdeg * keepm + scat(newdeg_c * appf)
            chargers_cons_b = jnp.dot(cons_c, ch_bld,
                                      preferred_element_type=jnp.float32)

            # ---- washing machines (step.py:398-416) ----
            # float-valued select: Mosaic cannot legalize selects over
            # i1 vectors
            changed_f = jnp.where(
                is_t0, 0.0,
                ((wprev_s != wm_s) | (wprev_e != wm_e)).astype(jnp.float32))
            initiated = (wmi > 0.5) & (changed_f < 0.5)
            trigger = (~initiated & (a_wm > 0.0) & (wm_s != -1.0)
                       & (wm_e != -1.0) & (wm_s <= t) & (t <= wm_e))
            wm_cons_w = jnp.where(trigger, wm_l, 0.0)
            wmi_n = (initiated | trigger).astype(jnp.float32)
            wm_cons_b = jnp.dot(wm_cons_w, wm_bld,
                                preferred_element_type=jnp.float32)

            # ---- accounting incl. the t == 0 multi-count quirks ----
            nsl_term = jnp.where(is_t0, 3.0 * nsl, nsl)
            bat_term = jnp.where(is_t0, 2.0 * bat_balance, bat_balance)
            net = nsl_term + bat_term + chargers_cons_b + wm_cons_b - solar

            # ---- reward ----
            if use_ev_reward:
                (w_ncc, w_bl, w_imposs, w_under, w_close, w_sc,
                 w_esp) = ev_weights
                neg = -net
                marl = (jnp.sign(neg) * 0.01 * (neg * neg)
                        * jnp.maximum(0.0, jnp.sum(net, axis=1, keepdims=True)))
                mult_b = 1.0 / (1.0 + jnp.abs(marl))
                mult = jnp.dot(mult_b, ch_bld.T,
                               preferred_element_type=jnp.float32)
                net_c = jnp.dot(net, ch_bld.T,
                                preferred_element_type=jnp.float32)
                soc_prev_c = gather(jnp.where(is_t0,
                                              jnp.broadcast_to(ev_init_soc,
                                                               evsoc.shape),
                                              evsoc))
                soc_now_c = gather(evsoc_n)
                min_cap = (1.0 - g_dod) * g_cap
                last = charger_energy
                cur_e = soc_prev_c * g_cap + last
                c_bl = jnp.where((cur_e > g_cap) | (cur_e < min_cap),
                                 w_bl * mult, 0.0)
                soc_diff = soc_now_c - req
                soc_diff_kwh = soc_diff * g_cap
                mpc = maxc * dep
                mpd = maxd * dep
                c_imp = jnp.where(soc_diff_kwh > mpc, w_imposs * mult, 0.0)
                at_dep = dep == 0.0
                c_under = jnp.where(
                    at_dep & (-0.25 < soc_diff) & (soc_diff <= -0.10),
                    2.0 * w_under * mult,
                    jnp.where(at_dep & (soc_diff <= -0.25),
                              (w_under * w_under) * mult, 0.0))
                c_close = jnp.where(
                    at_dep & (-0.10 < soc_diff) & (soc_diff <= 0.10),
                    w_close * mult, 0.0)
                c_close = c_close + jnp.where(
                    jnp.abs(soc_diff_kwh) <= jnp.maximum(mpc, mpd),
                    w_close * mult * (1.0 / (dep + 0.1)), 0.0)
                c_esp = jnp.where((last > 0) & (net_c < 0), w_esp * mult,
                                  jnp.where((last < 0) & (net_c < 0),
                                            -0.5 * w_esp * mult, 0.0))
                c_sc = jnp.where((last < 0) & (net_c > 0), w_sc * mult,
                                 jnp.where((last > 0) & (net_c > 0),
                                           -0.5 * w_sc * mult, 0.0))
                per_c = jnp.where(connected,
                                  c_bl + c_imp + c_under + c_close + c_esp
                                  + c_sc, 0.0)
                step_rew = jnp.dot(per_c, ch_bld,
                                   preferred_element_type=jnp.float32)
                # charging-constraint violation penalty
                # (reward_function.py:431-436; core/reward.py:173-175)
                step_rew = step_rew - penalty_coefficient \
                    * jnp.maximum(viol, 0.0)
            else:
                step_rew = -jnp.maximum(net, 0.0)

            if record:
                rec_buf[R_NET, pl.ds(tl, 1), :] = net[0:1, :]
                rec_buf[R_BBAL, pl.ds(tl, 1), :] = bat_balance[0:1, :]
                rec_buf[R_BSOC, pl.ds(tl, 1), :] = \
                    jnp.broadcast_to(new_soc, net.shape)[0:1, :]
                rec_buf[R_CHC, pl.ds(tl, 1), :] = chargers_cons_b[0:1, :]
                rec_buf[R_WMC, pl.ds(tl, 1), :] = wm_cons_b[0:1, :]
                rec_buf[R_REW, pl.ds(tl, 1), :] = step_rew[0:1, :]

            live = t < n_steps
            keep = lambda new, old: jnp.where(live, new, old)
            rew = keep(rew + step_rew, rew)
            cost = keep(cost + net * price, cost)
            emis = keep(emis + jnp.maximum(net * carbon, 0.0), emis)
            return (keep(new_soc, soc), keep(new_eff, eff), keep(new_deg, deg),
                    keep(evsoc_n, evsoc), keep(eveff_n, eveff),
                    keep(evdeg_n, evdeg), keep(wmi_n, wmi),
                    keep(wm_s + 0.0, wprev_s), keep(wm_e + 0.0, wprev_e),
                    rew, cost, emis)

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
    zv = jnp.zeros_like(evsoc0_ref[:, :])
    zw = jnp.zeros_like(wmi0_ref[:, :])
    (soc, eff, deg, evsoc, eveff, evdeg, wmi, _ws, _we,
     rew, cost, emis) = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (soc0_ref[:, :], eff0_ref[:, :], deg0_ref[:, :],
         evsoc0_ref[:, :], eveff0_ref[:, :], evdeg0_ref[:, :],
         wmi0_ref[:, :], zw - 2.0, zw - 2.0, zeros, zeros, zeros))
    reward_ref[:, :] = rew
    cost_ref[:, :] = cost
    emission_ref[:, :] = emis
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg
    evsoc_ref[:, :] = evsoc
    eveff_ref[:, :] = eveff
    evdeg_ref[:, :] = evdeg
    wmi_ref[:, :] = wmi


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "hours_ratio", "ratio", "n_knots", "ev_knots", "ch_knots",
    "ev_weights", "use_ev_reward", "penalty_coefficient", "record",
    "interpret"))
def ev_episode(actions: Tuple[jnp.ndarray, ...],
               series: Tuple[jnp.ndarray, ...],
               bparams: jnp.ndarray, curves: Tuple[jnp.ndarray, ...],
               cparams: jnp.ndarray, ch_curves: Tuple[jnp.ndarray, ...],
               evparams: jnp.ndarray, ev_curves: Tuple[jnp.ndarray, ...],
               ch_bld: jnp.ndarray, wm_bld: jnp.ndarray,
               state0: Tuple[jnp.ndarray, ...],
               n_steps: int, hours_ratio: float, ratio: float,
               n_knots: int, ev_knots: int, ch_knots: int,
               ev_weights: Tuple[float, ...], use_ev_reward: bool,
               viol: jnp.ndarray = None, penalty_coefficient: float = 1.0,
               record: bool = False, interpret: bool = False):
    """Full episode for a (D, B/C/V/W-lane) EV district batch.

    actions: 3 x (T_pad, 128) per-step per-target open-loop plans
    (electrical_storage over building lanes, electric_vehicle_storage
    over charger lanes, washing_machine over machine lanes); series: 12 x
    (T_pad, 128) streams; state0: 7 x (D, 128). Returns (reward, cost,
    emission sums + final battery/EV/WM state), each (D, 128)."""
    D = state0[0].shape[0]
    T_pad = series[0].shape[0]
    grid = (D // TILE_D,)
    state_spec = pl.BlockSpec((TILE_D, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((D, LANES), jnp.float32)] * 10
    out_specs = [state_spec] * 10
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((2, T_CHUNK, LANES), jnp.float32)] * 16 \
        + [pltpu.SemaphoreType.DMA((2, 16))]
    if record:
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((N_EREC, T_pad, LANES), jnp.float32)]
        out_specs = out_specs + [hbm_spec]
        scratch = scratch + [pltpu.VMEM((N_EREC, T_CHUNK, LANES), jnp.float32),
                             pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[hbm_spec] * 16 + [small] * 17 + [state_spec] * 7,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    if viol is None:
        viol = jnp.zeros_like(series[0])
    kernel = functools.partial(
        _episode_kernel, n_steps=n_steps, hours_ratio=hours_ratio,
        ratio=ratio, n_knots=n_knots, ev_knots=ev_knots, ch_knots=ch_knots,
        ev_weights=ev_weights, use_ev_reward=use_ev_reward,
        penalty_coefficient=penalty_coefficient, record=record)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(*actions, viol, *series, bparams, *curves, cparams, *ch_curves,
      evparams, *ev_curves, ch_bld, wm_bld, *state0)
