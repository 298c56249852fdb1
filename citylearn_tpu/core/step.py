"""The fused district step: one pure function replacing the reference's
entire ``CityLearnEnv.step`` OOP cascade (``citylearn/citylearn.py:978-1056``
-> ``building.py:1500-1834`` -> ``energy_model.py``).

Everything is elementwise over the building axis ``B`` (VPU work on TPU);
the batched API vmaps this over a district axis and ``lax.scan``s over time.

Order semantics (reference ``building.py:1566-1632``): the priority list is
reordered per building from the *signs* of the storage actions —
discharging electrical storage runs first, and a discharging end-use tank
runs before its device. Because each decision is local, we compute both
orderings of every block elementwise and select with ``jnp.where``; the
cross-block coupling (``downward_electrical_flexibility``,
``building.py:640-668``) is threaded through a consumption accumulator.

t == 0 quirks reproduced (``building.py:2526-2564, 2615-2652``): at reset
the device-energy arrays are prefilled with the raw demand series and
``update_variables`` runs once; during the first step the t == 0 branch of
``update_variables`` adds demand-derived consumption again — so device
consumptions at index 0 are triple-counted (battery: double). The episode
reward summary drops index 0 (``citylearn.py:1034``), but observations,
rewards and KPI series see these values, so parity requires them.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from citylearn_tpu.core import hvac
from citylearn_tpu.core.battery import battery_charge
from citylearn_tpu.core.dynamics import lstm_predict
from citylearn_tpu.core.reward import EVRewardInputs, RewardInputs, compute_reward
from citylearn_tpu.core.storage import tank_charge
from citylearn_tpu.core.types import (
    DistrictParams,
    EnvState,
    StaticConfig,
    StepOutput,
)

INF = jnp.inf


def _store_rounder(cfg: StaticConfig):
    """Float32 store-point rounding for parity mode.

    The reference computes each step in Python floats (float64) but stores
    every carried quantity into float32 numpy arrays (SOC/energy_balance
    ``energy_model.py:801-803``, per-device electricity_consumption
    ``energy_model.py:155``, net/cost/emission ``building.py:2559-2561``,
    demand/temperature series writes). In ``parity_f64`` mode we run the
    math in float64 and round at exactly those store points, making the
    year-long trajectory track the reference to ~1 float32 ulp. Identity
    in the normal (all-float32, TPU-fast) mode."""
    if cfg.parity_f64:
        return lambda x: x.astype(jnp.float32).astype(jnp.float64)
    return lambda x: x


class _ThermalResult(NamedTuple):
    soc: jnp.ndarray
    balance: jnp.ndarray
    device_output: jnp.ndarray          # energy_from_<end_use>_device this step
    apply_consumption: jnp.ndarray      # apply-phase device consumption (device + storage charge)


def _flex(outage, solar_abs, cons_accum):
    """``downward_electrical_flexibility`` (reference ``building.py:640-668``)."""
    cap = jnp.maximum(0.0, solar_abs - cons_accum)
    return jnp.where(outage, cap, INF)


def _thermal_block(dev, tank, soc_prev, demand, action, outdoor_t, heating: bool,
                   conv_capacity, conv_npf32, hours_ratio_applies: bool,
                   outage, solar_abs, cons_accum, dev_cons_init,
                   cfg: StaticConfig) -> Tuple[_ThermalResult, jnp.ndarray]:
    """One end-use (cooling/heating/dhw): device + its storage tank.

    ``conv_capacity`` is the capacity used for the action->energy
    conversion — the reference uses the *cooling* tank's capacity for
    heating storage and the *heating* tank's for dhw storage
    (``building.py:1720,1765``), a shipped quirk we replicate.
    ``dev_cons_init`` is the device's own consumption already booked at
    this index (nonzero only at t == 0 from the reset-time
    ``update_variables``). Returns the block result and the updated
    district-level consumption accumulator.
    """
    hours_ratio = cfg.seconds_per_time_step / 3600.0
    energy_req = action * conv_capacity * (hours_ratio if hours_ratio_applies else 1.0)
    ratio = cfg.time_step_ratio
    r32 = _store_rounder(cfg)
    # action * capacity stays FLOAT64 in the reference: actions reach
    # update_<end_use>_storage as np.float64 scalars (verified through
    # _parse_actions, citylearn.py:1063-1134), and np.float64 * np.float32
    # promotes to float64 — no rounding even for np.float32 autosized
    # capacities. (Only a weak Python-float action would round; the
    # list-of-np.float64 Gym interface never produces one.)
    round_tank = lambda tr: tr._replace(soc=r32(tr.soc),
                                        energy_balance=r32(tr.energy_balance))

    # The reference's ``min(demand, max_output)`` is a Python builtin min
    # over mixed-dtype numpy scalars: the float32 demand-series object vs
    # the float64 ``get_max_output_power`` product. Whichever OBJECT wins
    # sets the downstream division dtype — a saturated device stores an
    # UNROUNDED float64 consumption, an unsaturated one a float32-rounded
    # value (building.py:1641-1661 with energy_model.py:281,301). Emulate
    # by selecting the rounding per value in parity mode.
    def dev_cons(out, max_out, demand_side):
        raw = jnp.maximum(0.0, hvac.input_power(dev, out, outdoor_t, heating,
                                                cfg.parity_f64,
                                                round_result=False))
        if not cfg.parity_f64:
            return raw
        return jnp.where(demand_side <= max_out, r32(raw), raw)

    # ---- variant A: device first, then storage charge (action >= 0) ----
    # update_energy_from_<end_use>_device (building.py:1641-1661): storage
    # balance at t is still 0, so storage_output = 0.
    flex1 = _flex(outage, solar_abs, cons_accum)
    max_out1 = hvac.max_output_power(dev, outdoor_t, heating, flex1, dev_cons_init,
                                     cfg.parity_f64)
    out_A = jnp.minimum(demand, max_out1)
    cons_dev_A = dev_cons(out_A, max_out1, demand)
    # update_<end_use>_storage charging branch (building.py:1663-1687):
    # clamp by the device's max output given consumption booked so far.
    flex2 = _flex(outage, solar_abs, cons_accum + cons_dev_A)
    max_out2 = hvac.max_output_power(dev, outdoor_t, heating, flex2,
                                     dev_cons_init + cons_dev_A, cfg.parity_f64)
    charge_A = jnp.minimum(max_out2, energy_req)
    tank_A = round_tank(tank_charge(tank, soc_prev, charge_A / ratio, ratio,
                                    cfg.parity_f64))
    cons_store_A = r32(hvac.input_power(dev, jnp.maximum(tank_A.energy_balance, 0.0),
                                        outdoor_t, heating, cfg.parity_f64))

    # ---- variant B: storage discharge first, then device (action < 0) ----
    discharge_B = jnp.maximum(-demand, energy_req)
    tank_B = round_tank(tank_charge(tank, soc_prev, discharge_B / ratio, ratio,
                                    cfg.parity_f64))
    cons_store_B = r32(hvac.input_power(dev, jnp.maximum(tank_B.energy_balance, 0.0),
                                        outdoor_t, heating, cfg.parity_f64))  # 0 for true discharge
    storage_out_B = -jnp.minimum(tank_B.energy_balance, 0.0)
    flex_B = _flex(outage, solar_abs, cons_accum + cons_store_B)
    max_out_B = hvac.max_output_power(dev, outdoor_t, heating, flex_B,
                                      dev_cons_init + cons_store_B, cfg.parity_f64)
    # demand(f32 store) - storage_output(f32 store) rounds f32 in the ref
    residual_B = r32(demand - storage_out_B)
    out_B = jnp.minimum(residual_B, max_out_B)
    cons_dev_B = dev_cons(out_B, max_out_B, residual_B)

    discharging = action < 0.0
    pick = lambda a, b: jnp.where(discharging, b, a)
    soc = pick(tank_A.soc, tank_B.soc)
    balance = pick(tank_A.energy_balance, tank_B.energy_balance)
    device_output = pick(out_A, out_B)
    # no store-rounding on the sum: the reference's per-device
    # electricity_consumption arrays are float64 and the saturated-device
    # term keeps its unrounded float64 value (see dev_cons above)
    apply_cons = pick(cons_dev_A + cons_store_A, cons_dev_B + cons_store_B)
    return (_ThermalResult(soc=soc, balance=balance, device_output=device_output,
                           apply_consumption=apply_cons),
            cons_accum + apply_cons)


def dynamics_update(cfg: StaticConfig, params: DistrictParams, tau, t,
                    cooling_demand_obs, heating_demand_obs, temp_ideal,
                    lstm_h_in, lstm_c_in, dyn_input_in):
    """LSTM temperature dynamics for one step (building.py:2935-3078):
    channel updates, the one-step-older temperature-channel quirk,
    warm-gated hidden-state carry. Shared by :func:`district_step` and
    the neighborhood-family single-district post-pass
    (:mod:`citylearn_tpu.core.neighborhood_eval`).

    Returns ``(temp_t, lstm_h, lstm_c, dyn_input)``."""
    temp_t = temp_ideal
    lstm_h = list(lstm_h_in)
    lstm_c = list(lstm_c_in)
    dyn_input = list(dyn_input_in)
    for g, (meta, dyn) in enumerate(zip(cfg.dyn_groups, params.dynamics)):
        lookback, L, H, F, tc, cc, hc = meta
        m = dyn.member_indices
        norm = lambda v, ch: ((v - dyn.norm_min[:, ch])
                              / (dyn.norm_max[:, ch] - dyn.norm_min[:, ch]))
        vals = jnp.take(dyn.static_channels, tau, axis=0)   # (Bg, F) pre-normalized
        if cc >= 0:
            vals = vals.at[:, cc].set(norm(cooling_demand_obs[m], cc))
        if hc >= 0:
            vals = vals.at[:, hc].set(norm(heating_demand_obs[m], hc))
        vals = vals.at[:, tc].set(norm(temp_ideal[m], tc))
        buf = jnp.concatenate([dyn_input[g][:, :, 1:], vals[:, :, None]], axis=2)

        predict_warm = t >= lookback
        # model input (building.py:3039-3055): all channels use the last
        # `lookback` entries except indoor temperature which uses the
        # first `lookback` (one step older)
        main = buf[:, :, 1:]
        model_in = main.at[:, tc, :].set(buf[:, tc, :-1])
        model_in = jnp.swapaxes(model_in, 1, 2)             # (Bg, lookback, F)
        pred_norm, h_new, c_new = lstm_predict(dyn, model_in, lstm_h[g], lstm_c[g])
        buf = buf.at[:, tc, -1].set(
            jnp.where(predict_warm, pred_norm, buf[:, tc, -1]))
        pred_temp = pred_norm * (dyn.norm_max[:, tc] - dyn.norm_min[:, tc]) \
            + dyn.norm_min[:, tc]
        temp_t = temp_t.at[m].set(
            jnp.where(predict_warm, pred_temp, temp_ideal[m]))
        lstm_h[g] = jnp.where(predict_warm, h_new, lstm_h[g])
        lstm_c[g] = jnp.where(predict_warm, c_new, lstm_c[g])
        dyn_input[g] = buf
    return temp_t, tuple(lstm_h), tuple(lstm_c), tuple(dyn_input)


def occupant_update(cfg: StaticConfig, params: DistrictParams, series,
                    state, csp_data, hsp_data, hvac_mode, temp_t, t, is_t0,
                    r32):
    """Occupant thermostat interaction for one step (building.py:3160-3353,
    occupant.py:62-99): logistic interaction probability on the
    just-predicted temperature + decision-tree setpoint delta, with
    future-setpoint mutation, hold counter and reversion. Setpoint
    mutations are carried as NaN-coded overrides; the reference mutates
    the series from index t onward, so the effective setpoint is
    override-if-active else data. ``state`` needs the ``occ_*`` fields
    and ``data_offset``. Shared by :func:`district_step` and the
    neighborhood-family post-pass.

    Returns ``(csp_eff, hsp_eff, occ_state_dict)``."""
    occ = params.occupant
    csp_eff = jnp.where(jnp.isfinite(state.occ_csp_override),
                        state.occ_csp_override, csp_data)
    hsp_eff = jnp.where(jnp.isfinite(state.occ_hsp_override),
                        state.occ_hsp_override, hsp_data)
    # at t == 0 the reference reads index -1 — numpy wraps to the
    # episode's final row (building.py:3276-3285 with time_step 0)
    end_idx = state.data_offset + cfg.time_steps - 1
    at_end = lambda arr: jnp.take(arr, end_idx, axis=0)
    prev_temp = jnp.where(is_t0, at_end(series.indoor_dry_bulb_temperature),
                          state.occ_prev_temp)
    prev_csp = jnp.where(
        is_t0, at_end(series.indoor_dry_bulb_temperature_cooling_set_point),
        state.occ_prev_csp)
    prev_hsp = jnp.where(
        is_t0, at_end(series.indoor_dry_bulb_temperature_heating_set_point),
        state.occ_prev_hsp)

    heating_mode = hvac_mode == 2
    current_sp = jnp.where(heating_mode, hsp_eff, csp_eff)
    prev_sp = jnp.where(heating_mode, prev_hsp, prev_csp)

    att = lambda arr: jnp.take(arr, t, axis=0)
    sig = lambda a, b_: 1.0 / (1.0 + jnp.exp(-(a + b_ * temp_t)))
    p_inc = sig(att(occ.a_increase), att(occ.b_increase))
    p_dec = sig(att(occ.a_decrease), att(occ.b_decrease))
    rp = jnp.take(occ.random_probability, t)

    feats = jnp.stack([current_sp, prev_sp, prev_temp - prev_sp], axis=1)

    def tree_delta(k):
        node = jnp.zeros(csp_data.shape, jnp.int32)
        take_n = lambda arr: jnp.take_along_axis(
            arr[:, k, :], node[:, None], axis=1)[:, 0]
        for _ in range(cfg.occupant_tree_depth + 1):
            f = take_n(occ.tree_feature)
            thr = take_n(occ.tree_threshold)
            x = jnp.take_along_axis(feats, jnp.clip(f, 0, 2)[:, None],
                                    axis=1)[:, 0]
            left = take_n(occ.tree_children_left)
            right = take_n(occ.tree_children_right)
            nxt = jnp.where(x <= thr, left, right)
            node = jnp.where(f >= 0, nxt, node)
        return jnp.take_along_axis(occ.tree_delta[:, k, :], node[:, None],
                                   axis=1)[:, 0]

    inc_fires = (p_inc >= rp) & (p_dec < rp)
    dec_fires = (p_dec >= rp) & (p_inc < rp)
    delta = jnp.where(inc_fires, tree_delta(0),
                      jnp.where(dec_fires, -tree_delta(1), 0.0))
    warm = t >= occ.lookback     # simulate_dynamics gate (building.py:2996)
    delta = jnp.where(warm, delta, 0.0)

    trig = jnp.abs(delta) > 0.0
    new_csp_ov = jnp.where(trig & ~heating_mode, current_sp + delta,
                           state.occ_csp_override)
    new_hsp_ov = jnp.where(trig & heating_mode, current_sp + delta,
                           state.occ_hsp_override)
    counter = state.occ_hold_counter
    counter = jnp.where(trig, occ.hold_time_steps,
                        jnp.where(counter >= 0, counter - 1, counter))
    revert = counter == 0
    nan = jnp.full_like(new_csp_ov, jnp.nan)
    # effective setpoints for this step's reward/series reflect the
    # fresh mutation; reversion applies from t + 1 (building.py:3310-3317)
    csp_eff = r32(jnp.where(trig & ~heating_mode, current_sp + delta, csp_eff))
    hsp_eff = r32(jnp.where(trig & heating_mode, current_sp + delta, hsp_eff))
    new_csp_ov = r32(jnp.where(revert, nan, new_csp_ov))
    new_hsp_ov = r32(jnp.where(revert, nan, new_hsp_ov))
    counter = jnp.where(revert, -1, counter)
    occ_state = dict(
        occ_csp_override=new_csp_ov, occ_hsp_override=new_hsp_ov,
        occ_hold_counter=counter, occ_prev_temp=r32(temp_t),
        occ_prev_csp=csp_eff, occ_prev_hsp=hsp_eff)
    return csp_eff, hsp_eff, occ_state


def district_step(cfg: StaticConfig, params: DistrictParams, state: EnvState,
                  actions: Dict[str, jnp.ndarray]) -> Tuple[EnvState, StepOutput]:
    """Apply ``actions`` at the current step and return the new state plus
    all per-step quantities (reference stack §3.2 of SURVEY.md).

    ``actions``: name -> (B,) array; inactive actions must be 0.0 for
    storages (reference ``building.py:1561-1564``).
    """
    series = params.series
    t = state.t
    tau = state.data_offset + t
    is_t0 = t == 0
    ratio = cfg.time_step_ratio
    hours_ratio = cfg.seconds_per_time_step / 3600.0
    r32 = _store_rounder(cfg)

    at = lambda arr: jnp.take(arr, tau, axis=0)  # (T, B) -> (B,)
    nsl = at(series.non_shiftable_load)
    cooling_demand_ideal = at(series.cooling_demand)
    heating_demand_ideal = at(series.heating_demand)
    dhw_demand = at(series.dhw_demand)
    solar_abs = at(series.solar_generation)
    outdoor_t = at(series.outdoor_dry_bulb_temperature)
    pricing = at(series.electricity_pricing)
    carbon = at(series.carbon_intensity)
    outage = at(series.power_outage) > 0.0
    hvac_mode = at(series.hvac_mode)
    temp_ideal = at(series.indoor_dry_bulb_temperature)

    # reset-time update_variables consumption already booked at index 0
    # (building.py:2554-2558 prefill + 2618-2652): always computed from the
    # *ideal* (prefilled) demand. The heating branch uses the *dhw* device's
    # input power when the heating device is not a heat pump
    # (building.py:2629-2632) — shipped quirk.
    zero = jnp.zeros_like(nsl)
    if cfg.any_cooling:
        reset_cool = r32(hvac.input_power(params.cooling_device, cooling_demand_ideal,
                                          outdoor_t, False, cfg.parity_f64))
    else:
        reset_cool = zero
    if cfg.any_heating:
        heat_in_hp = hvac.input_power(params.heating_device, heating_demand_ideal,
                                      outdoor_t, True, cfg.parity_f64)
        heat_in_quirk = heating_demand_ideal / params.dhw_device.efficiency
        reset_heat = r32(jnp.where(params.heating_device.is_heat_pump, heat_in_hp,
                                   heat_in_quirk))
    else:
        reset_heat = zero
    if cfg.any_dhw:
        reset_dhw = r32(hvac.input_power(params.dhw_device, dhw_demand, outdoor_t,
                                         True, cfg.parity_f64))
    else:
        reset_dhw = zero
    reset_nsl = nsl
    t0 = lambda x: jnp.where(is_t0, x, 0.0)
    dev_init_cool = t0(reset_cool)
    dev_init_heat = t0(reset_heat)
    dev_init_dhw = t0(reset_dhw)
    cons_accum = t0(reset_cool + reset_heat + reset_dhw + reset_nsl)

    # ---- partial-load demand override for LSTM dynamics buildings
    # (building.py:3080-3158): the device action sets available electric
    # power; demand becomes the device's max output under that power,
    # gated by hvac_mode; ideal load is maintained during the LSTM
    # lookback warm-up (control starts once the input buffer is full,
    # i.e. t >= lookback + 1). ----
    cooling_demand = cooling_demand_ideal
    heating_demand = heating_demand_ideal
    if cfg.has_dynamics:
        coh_all = actions.get("cooling_or_heating_device", zero)
        cool_all = actions.get("cooling_device", zero)
        heat_all = actions.get("heating_device", zero)
        for meta, dyn in zip(cfg.dyn_groups, params.dynamics):
            lookback = meta[0]
            m = dyn.member_indices
            control_warm = t >= lookback + 1
            coh = coh_all[m]
            cool_act = jnp.where(dyn.cooling_or_heating_active,
                                 jnp.abs(jnp.minimum(coh, 0.0)), cool_all[m])
            heat_act = jnp.where(dyn.cooling_or_heating_active,
                                 jnp.abs(jnp.maximum(coh, 0.0)), heat_all[m])
            cool_active = dyn.cooling_device_active | dyn.cooling_or_heating_active
            heat_active = dyn.heating_device_active | dyn.cooling_or_heating_active
            gdev = lambda p: jax.tree_util.tree_map(lambda a: a[m], p)
            cool_dev = gdev(params.cooling_device)
            heat_dev = gdev(params.heating_device)
            mode = hvac_mode[m]
            out_t = outdoor_t[m]
            elec_c = cool_act * cool_dev.nominal_power * hours_ratio
            partial_c = hvac.max_output_power(cool_dev, out_t, False, elec_c,
                                              dev_init_cool[m], cfg.parity_f64)
            partial_c = r32(jnp.where((mode == 1) | (mode == 3), partial_c, 0.0))
            cooling_demand = cooling_demand.at[m].set(
                jnp.where(control_warm & cool_active, partial_c,
                          cooling_demand[m]))
            # heating uses no hours ratio (building.py:3146) — shipped quirk
            elec_h = heat_act * heat_dev.nominal_power
            partial_h = hvac.max_output_power(heat_dev, out_t, True, elec_h,
                                              dev_init_heat[m], cfg.parity_f64)
            partial_h = r32(jnp.where((mode == 2) | (mode == 3), partial_h, 0.0))
            heating_demand = heating_demand.at[m].set(
                jnp.where(control_warm & heat_active, partial_h,
                          heating_demand[m]))

    # ---- electrical storage, early variant (discharging runs first,
    # building.py:1606-1609) ----
    bat_action = actions.get("electrical_storage", zero)
    bat_energy = bat_action * params.battery.nominal_power * hours_ratio
    bat_early = battery_charge(params.battery, state.battery_soc,
                               state.battery_efficiency,
                               state.battery_degraded_capacity,
                               bat_energy / ratio, ratio, cfg.parity_f64)
    bat_early = bat_early._replace(soc=r32(bat_early.soc),
                                   energy_balance=r32(bat_early.energy_balance))
    bat_discharging = bat_action < 0.0
    cons_accum = cons_accum + jnp.where(bat_discharging, bat_early.energy_balance, 0.0)

    # ---- thermal blocks in priority order: cooling, heating, dhw.
    # Inert end-uses (no demand anywhere, no storage) prune to zeros at
    # trace time — the math is identically zero there. ----
    inert = _ThermalResult(soc=zero, balance=zero, device_output=zero,
                           apply_consumption=zero)
    if cfg.any_cooling:
        cool, cons_accum = _thermal_block(
            params.cooling_device, params.cooling_storage, state.cooling_storage_soc,
            cooling_demand, actions.get("cooling_storage", zero), outdoor_t, False,
            params.cooling_storage.capacity, params.cooling_storage.capacity_npf32,
            False, outage, solar_abs, cons_accum, dev_init_cool, cfg)
    else:
        cool = inert._replace(soc=state.cooling_storage_soc)
    if cfg.any_heating:
        heat, cons_accum = _thermal_block(
            params.heating_device, params.heating_storage, state.heating_storage_soc,
            heating_demand, actions.get("heating_storage", zero), outdoor_t, True,
            params.cooling_storage.capacity,  # quirk: building.py:1720
            params.cooling_storage.capacity_npf32,
            True, outage, solar_abs, cons_accum, dev_init_heat, cfg)
    else:
        heat = inert._replace(soc=state.heating_storage_soc)
    if cfg.any_dhw:
        dhw, cons_accum = _thermal_block(
            params.dhw_device, params.dhw_storage, state.dhw_storage_soc,
            dhw_demand, actions.get("dhw_storage", zero), outdoor_t, True,
            params.heating_storage.capacity,  # quirk: building.py:1765
            params.heating_storage.capacity_npf32,
            True, outage, solar_abs, cons_accum, dev_init_dhw, cfg)
    else:
        dhw = inert._replace(soc=state.dhw_storage_soc)

    # ---- non-shiftable load (building.py:1784-1789) ----
    nsl_met = r32(jnp.minimum(nsl, _flex(outage, solar_abs, cons_accum)))
    cons_accum = cons_accum + nsl_met

    # ---- electrical storage, late variant (charging, building.py:1791-1812) ----
    bat_energy_late = jnp.minimum(bat_energy, _flex(outage, solar_abs, cons_accum))
    bat_late = battery_charge(params.battery, state.battery_soc,
                              state.battery_efficiency,
                              state.battery_degraded_capacity,
                              bat_energy_late / ratio, ratio, cfg.parity_f64)
    bat_late = bat_late._replace(soc=r32(bat_late.soc),
                                 energy_balance=r32(bat_late.energy_balance))
    pickb = lambda e, l: jnp.where(bat_discharging, e, l)
    bat_soc = pickb(bat_early.soc, bat_late.soc)
    bat_balance = pickb(bat_early.energy_balance, bat_late.energy_balance)
    bat_eff = pickb(bat_early.efficiency, bat_late.efficiency)
    bat_degraded = pickb(bat_early.degraded_capacity, bat_late.degraded_capacity)

    # ---- EV chargers (electric_vehicle_charger.py:283-329 + the offline
    # event tensors from compiler/events.py) ----
    B = nsl.shape[0]
    chargers_cons_b = jnp.zeros_like(nsl)
    cc_violation_b = jnp.zeros_like(nsl)
    cc_building_headroom = jnp.zeros_like(nsl)
    cc_phase_headroom = jnp.zeros((cfg.n_charging_phases,), jnp.float32)
    ev_soc_new = state.ev_soc
    ev_eff_new = state.ev_efficiency
    ev_deg_new = state.ev_degraded_capacity
    charger_energy = None
    charger_applied = None
    charger_soc_now = None
    charger_soc_prev = None
    charger_cons_c = None
    if cfg.has_evs:
        ch = params.chargers
        evp = params.evs
        force = jnp.take(evp.force_soc, t, axis=0)        # (V,) episode-relative
        drift = jnp.take(evp.drift_mult, t, axis=0)
        base = jnp.where(is_t0, evp.battery.initial_soc, 0.0)
        soc_evented = jnp.where(
            jnp.isfinite(force), force,
            jnp.where(jnp.isfinite(drift),
                      jnp.clip(state.ev_soc * drift, 0.0, 1.0), base))
        # Battery.charge reads soc[t-1], except at t == 0 where it reads the
        # (possibly force-set) soc[0] (energy_model.py:662-666,1046-1047)
        soc_read = jnp.where(is_t0, soc_evented, state.ev_soc)

        a = actions.get("electric_vehicle_storage", jnp.zeros(cfg.n_chargers))
        # ---- charging constraints (building.py:901-989): positive kW
        # requests scaled to building then phase limits; scaled-down
        # violations tracked in kWh ----
        if cfg.has_charging_constraints:
            pos = (a > 0.0) & (ch.max_charging_power > 0.0)
            req = jnp.where(pos, a * ch.max_charging_power, 0.0)
            tot_b = jax.ops.segment_sum(req, ch.building_index, num_segments=B)
            blim = ch.cc_building_limit
            over_b = jnp.isfinite(blim) & (tot_b > blim)
            scale_b = jnp.where(over_b,
                                jnp.where(blim == 0.0, 0.0,
                                          blim / jnp.maximum(tot_b, 1e-12)), 1.0)
            viol_b = jnp.where(over_b, tot_b - blim, 0.0)
            scaled1 = req * scale_b[ch.building_index]
            pidx = jnp.where(ch.cc_phase_index >= 0, ch.cc_phase_index,
                             cfg.n_charging_phases)
            tot_p = jax.ops.segment_sum(scaled1, pidx,
                                        num_segments=cfg.n_charging_phases + 1
                                        )[:cfg.n_charging_phases]
            plim = ch.cc_phase_limit
            over_p = jnp.isfinite(plim) & (tot_p > plim)
            scale_p = jnp.where(over_p,
                                jnp.where(plim == 0.0, 0.0,
                                          plim / jnp.maximum(tot_p, 1e-12)), 1.0)
            viol_p = jnp.where(over_p, tot_p - plim, 0.0)
            viol_b = viol_b + jax.ops.segment_sum(
                viol_p, ch.cc_phase_building, num_segments=B)
            scale_p_full = jnp.concatenate([scale_p, jnp.ones((1,))])
            target = scaled1 * scale_p_full[pidx]
            a = jnp.where(pos,
                          jnp.maximum(0.0, jnp.minimum(
                              a, target / jnp.maximum(ch.max_charging_power, 1e-12))),
                          jnp.where((a > 0.0) & (ch.max_charging_power <= 0.0),
                                    0.0, a))
            used_b = jax.ops.segment_sum(target, ch.building_index, num_segments=B)
            used_p = jax.ops.segment_sum(target, pidx,
                                         num_segments=cfg.n_charging_phases + 1
                                         )[:cfg.n_charging_phases]
            cc_building_headroom = jnp.where(jnp.isfinite(blim), blim - used_b, 0.0)
            cc_phase_headroom = jnp.where(jnp.isfinite(plim), plim - used_p, 0.0)
            cc_violation_b = viol_b * hours_ratio

        charging = a > 0.0
        e_chg = jnp.maximum(jnp.minimum(a * ch.max_charging_power * hours_ratio,
                                        ch.max_charging_power), ch.min_charging_power)
        e_dis = jnp.maximum(jnp.minimum(a * ch.max_discharging_power * hours_ratio,
                                        -ch.min_discharging_power), -ch.max_discharging_power)
        energy = jnp.where(charging, e_chg, e_dis)
        # power-dependent efficiency interpolated at |action|
        # (charger.py:252-281, 283-329); the packed curves are constant at
        # the scalar efficiency when the schema sets none
        interp = jax.vmap(jnp.interp)
        eff = jnp.where(charging,
                        interp(jnp.abs(a), ch.charge_eff_x, ch.charge_eff_y),
                        interp(jnp.abs(a), ch.discharge_eff_x, ch.discharge_eff_y))
        energy_kwh = jnp.where(charging, energy * eff, energy / eff)

        conn = jnp.take(ch.connected_ev, t, axis=0)       # (C,)
        connected = conn >= 0
        gidx = jnp.clip(conn, 0, None)
        gather = lambda arr: jnp.take(arr, gidx, axis=0)
        bp_c = jax.tree_util.tree_map(gather, evp.battery)
        # EV battery charge is called with energy_kwh directly — no
        # _convert_energy_for_storage pre-division (charger.py:316)
        res = battery_charge(bp_c, gather(soc_read),
                             gather(state.ev_efficiency),
                             gather(state.ev_degraded_capacity),
                             energy_kwh, 1.0, cfg.parity_f64)
        res = res._replace(soc=r32(res.soc), energy_balance=r32(res.energy_balance))
        applied = (a != 0.0) & connected
        balance = jnp.where(applied, res.energy_balance, 0.0)
        cons_c = r32(jnp.where(applied,
                               jnp.where(balance >= 0.0, balance / eff, balance * eff),
                               0.0))
        charger_energy = jnp.where(a != 0.0, energy, 0.0)  # past_charging_action kWh
        charger_applied = applied
        charger_soc_prev = jnp.where(is_t0, gather(evp.battery.initial_soc),
                                     gather(state.ev_soc))
        # scatter only the applied charges: unapplied chargers use an
        # out-of-range index so their (stale) values are dropped instead of
        # colliding on EV 0 via the clipped -1 index
        sidx = jnp.where(applied, gidx, cfg.n_evs)
        ev_soc_new = soc_evented.at[sidx].set(res.soc, mode="drop")
        ev_eff_new = state.ev_efficiency.at[sidx].set(res.efficiency, mode="drop")
        ev_deg_new = state.ev_degraded_capacity.at[sidx].set(
            res.degraded_capacity, mode="drop")
        charger_soc_now = ev_soc_new[gidx]
        charger_cons_c = cons_c
        chargers_cons_b = r32(jax.ops.segment_sum(cons_c, ch.building_index,
                                                  num_segments=B))

    # ---- washing machines (energy_model.py:1289-1334) ----
    wm_cons_b = jnp.zeros_like(nsl)
    wm_initiated_new = state.wm_initiated
    if cfg.has_washing_machines:
        wmp = params.washing_machines
        a_wm = actions.get("washing_machine", jnp.zeros(cfg.n_washing_machines))
        start = jnp.take(wmp.wm_start, t, axis=0)
        end = jnp.take(wmp.wm_end, t, axis=0)
        prev_i = jnp.maximum(t - 1, 0)
        changed = (t > 0) & (
            (jnp.take(wmp.wm_start, prev_i, axis=0) != start)
            | (jnp.take(wmp.wm_end, prev_i, axis=0) != end))
        initiated = state.wm_initiated & ~changed
        trigger = (~initiated & (a_wm > 0.0) & (start != -1) & (end != -1)
                   & (start <= t) & (t <= end))
        wm_cons_w = jnp.where(trigger, jnp.take(wmp.triggered_load, t, axis=0), 0.0)
        wm_initiated_new = initiated | trigger
        wm_cons_b = r32(jax.ops.segment_sum(wm_cons_w, wmp.building_index,
                                            num_segments=B))

    # ---- update_variables accounting (building.py:2615-2703) ----
    # apply-phase totals per device
    cool_cons = cool.apply_consumption
    heat_cons = heat.apply_consumption
    dhw_cons = dhw.apply_consumption
    bat_cons = bat_balance

    # t == 0 branch of update_variables re-adds demand-derived consumption
    if cfg.any_cooling:
        uv_cool = r32(hvac.input_power(params.cooling_device,
                                       r32(cool.device_output) + cool.balance,
                                       outdoor_t, False, cfg.parity_f64))
    else:
        uv_cool = zero
    if cfg.any_heating:
        uv_heat_hp = hvac.input_power(params.heating_device,
                                      r32(heat.device_output) + heat.balance,
                                      outdoor_t, True, cfg.parity_f64)
        uv_heat = r32(jnp.where(
            params.heating_device.is_heat_pump, uv_heat_hp,
            (r32(heat.device_output) + heat.balance) / params.dhw_device.efficiency))
    else:
        uv_heat = zero
    if cfg.any_dhw:
        uv_dhw = r32(hvac.input_power(params.dhw_device,
                                      r32(dhw.device_output) + dhw.balance,
                                      outdoor_t, True, cfg.parity_f64))
    else:
        uv_dhw = zero

    # the per-device electricity_consumption arrays are float64 in the
    # reference — only the net store rounds to float32 (building.py:2559)
    cool_total = cool_cons + t0(reset_cool + uv_cool)
    heat_total = heat_cons + t0(reset_heat + uv_heat)
    dhw_total = dhw_cons + t0(reset_dhw + uv_dhw)
    nsl_total = nsl_met + t0(reset_nsl + nsl_met)
    bat_total = bat_cons + t0(bat_balance)

    solar_neg = r32(-solar_abs)
    net = (cool_total + heat_total + dhw_total + nsl_total + bat_total + solar_neg
           + chargers_cons_b + wm_cons_b)
    net = r32(jnp.where(outage, 0.0, net))
    cost = r32(net * pricing)
    emission = r32(jnp.maximum(0.0, net * carbon))

    # storage electricity consumption series for counterfactual KPIs
    # (building.py:414-464): device input power of the tank balance.
    cool_store_cons = r32(hvac.input_power(params.cooling_device, cool.balance,
                                           outdoor_t, False, cfg.parity_f64)) if cfg.any_cooling else zero
    heat_store_cons = r32(hvac.input_power(params.heating_device, heat.balance,
                                           outdoor_t, True, cfg.parity_f64)) if cfg.any_heating else zero
    dhw_store_cons = r32(hvac.input_power(params.dhw_device, dhw.balance,
                                          outdoor_t, True, cfg.parity_f64)) if cfg.any_dhw else zero

    # ---- LSTM temperature dynamics (building.py:2935-3078) ----
    # fresh demand observations (building.py:1435-1437)
    cooling_demand_obs = r32(cool.device_output) + jnp.maximum(-cool.balance, 0.0)
    heating_demand_obs = r32(heat.device_output) + jnp.maximum(-heat.balance, 0.0)
    temp_t, lstm_h, lstm_c, dyn_input = dynamics_update(
        cfg, params, tau, t, cooling_demand_obs, heating_demand_obs,
        temp_ideal, state.lstm_h, state.lstm_c, state.dyn_input)

    # ---- occupant thermostat interaction (building.py:3160-3353,
    # occupant.py:62-99): logistic interaction probability on the
    # just-predicted temperature + decision-tree setpoint delta, with
    # future-setpoint mutation, hold counter and reversion. Setpoint
    # mutations are carried as NaN-coded overrides; the reference mutates
    # the series from index t onward, so the effective setpoint is
    # override-if-active else data. ----
    csp_data = at(series.indoor_dry_bulb_temperature_cooling_set_point)
    hsp_data = at(series.indoor_dry_bulb_temperature_heating_set_point)
    csp_eff, hsp_eff = csp_data, hsp_data
    occ_state = {}
    if cfg.has_occupant:
        csp_eff, hsp_eff, occ_state = occupant_update(
            cfg, params, series, state, csp_data, hsp_data, hvac_mode,
            temp_t, t, is_t0, r32)

    # ---- debug-mode physics assertions (reference building.py:1825-1834,
    # 657-665; SURVEY.md §5.2) — compiled in only when
    # core.debug.enable_checks(True) was set before tracing ----
    from citylearn_tpu.core import debug as _debug
    if _debug.checks_enabled():
        eps = 1e-3
        checks = {
            "soc_prev_in_[0,1]": (
                (state.battery_soc >= -eps) & (state.battery_soc <= 1 + eps)
                & (state.cooling_storage_soc >= -eps)
                & (state.cooling_storage_soc <= 1 + eps)
                & (state.heating_storage_soc >= -eps)
                & (state.heating_storage_soc <= 1 + eps)
                & (state.dhw_storage_soc >= -eps)
                & (state.dhw_storage_soc <= 1 + eps)),
            "soc_new_in_[0,1]": (
                (bat_soc >= -eps) & (bat_soc <= 1 + eps)
                & (cool.soc >= -eps) & (cool.soc <= 1 + eps)
                & (heat.soc >= -eps) & (heat.soc <= 1 + eps)
                & (dhw.soc >= -eps) & (dhw.soc <= 1 + eps)),
            # device apply-phase consumption >= 0 (building.py:1831-1834)
            "consumption_nonnegative": (
                (cool.apply_consumption >= -eps)
                & (heat.apply_consumption >= -eps)
                & (dhw.apply_consumption >= -eps) & (nsl_met >= -eps)),
            # met demand never exceeds requested demand (building.py:1825)
            "output_at_most_demand": (
                (cool.device_output <= cooling_demand + eps)
                & (heat.device_output <= heating_demand + eps)
                & (dhw.device_output <= dhw_demand + eps)),
            "net_finite": jnp.isfinite(net),
        }
        if cfg.has_evs:
            checks["ev_soc_in_[0,1]"] = ((ev_soc_new >= -eps)
                                         & (ev_soc_new <= 1 + eps))
        _debug.runtime_check(checks)

    new_state = state.replace(
        t=t + 1,
        battery_soc=bat_soc,
        battery_efficiency=bat_eff,
        battery_degraded_capacity=bat_degraded,
        cooling_storage_soc=cool.soc,
        heating_storage_soc=heat.soc,
        dhw_storage_soc=dhw.soc,
        lstm_h=lstm_h,
        lstm_c=lstm_c,
        dyn_input=dyn_input,
        ev_soc=ev_soc_new,
        ev_efficiency=ev_eff_new,
        ev_degraded_capacity=ev_deg_new,
        wm_initiated=wm_initiated_new,
        **occ_state,
    )

    ev_reward_inputs = None
    if cfg.has_evs and cfg.reward_type == "Electric_Vehicles_Reward_Function":
        ch = params.chargers
        evp = params.evs
        conn = jnp.take(ch.connected_ev, t, axis=0)
        gidx = jnp.clip(conn, 0, None)
        ev_reward_inputs = EVRewardInputs(
            building_index=ch.building_index,
            connected=conn >= 0,
            last_charged_kwh=charger_energy,
            soc_prev=charger_soc_prev,
            soc_now=charger_soc_now,
            capacity=jnp.take(evp.battery.capacity, gidx),
            depth_of_discharge=jnp.take(evp.battery.depth_of_discharge, gidx),
            required_soc=jnp.take(ch.required_soc, t, axis=0),
            hours_until_departure=jnp.take(ch.departure_time, t, axis=0),
            max_charging_power=ch.max_charging_power,
            max_discharging_power=ch.max_discharging_power,
            violation_kwh=cc_violation_b,
        )

    reward = compute_reward(cfg, ev=ev_reward_inputs, x=RewardInputs(
        net=net,
        solar=solar_abs,
        battery_soc=bat_soc,
        cooling_storage_soc=cool.soc,
        heating_storage_soc=heat.soc,
        dhw_storage_soc=dhw.soc,
        battery_capacity=params.battery.capacity,
        cooling_storage_capacity=params.cooling_storage.capacity,
        heating_storage_capacity=params.heating_storage.capacity,
        dhw_storage_capacity=params.dhw_storage.capacity,
        indoor_temperature=temp_t,
        hvac_mode=hvac_mode,
        cooling_set_point=csp_eff,
        heating_set_point=hsp_eff,
        comfort_band=at(series.comfort_band),
        cooling_demand=cooling_demand_obs,
        heating_demand=heating_demand_obs,
    ))

    out = StepOutput(
        net_electricity_consumption=net,
        net_electricity_consumption_cost=cost,
        net_electricity_consumption_emission=emission,
        reward=reward,
        cooling_consumption=cool_total,
        heating_consumption=heat_total,
        dhw_consumption=dhw_total,
        non_shiftable_consumption=nsl_total,
        battery_consumption=bat_total,
        cooling_storage_consumption=cool_store_cons,
        heating_storage_consumption=heat_store_cons,
        dhw_storage_consumption=dhw_store_cons,
        solar_generation=solar_neg,
        battery_soc=bat_soc,
        cooling_storage_soc=cool.soc,
        heating_storage_soc=heat.soc,
        dhw_storage_soc=dhw.soc,
        cooling_demand_met=cool.device_output,
        heating_demand_met=heat.device_output,
        dhw_demand_met=dhw.device_output,
        non_shiftable_load_met=nsl_met,
        cooling_storage_balance=cool.balance,
        heating_storage_balance=heat.balance,
        dhw_storage_balance=dhw.balance,
        battery_balance=bat_balance,
        cooling_demand_actual=cooling_demand,
        heating_demand_actual=heating_demand,
        indoor_temperature=temp_t,
        chargers_consumption=chargers_cons_b,
        washing_machines_consumption=wm_cons_b,
        ev_soc=ev_soc_new,
        cooling_set_point=csp_eff,
        heating_set_point=hsp_eff,
        charging_violation_kwh=cc_violation_b,
        charging_building_headroom=cc_building_headroom,
        charging_phase_headroom=cc_phase_headroom,
        charger_consumption=charger_cons_c,
        charger_action_kwh=charger_energy,
    )
    return new_state, out
