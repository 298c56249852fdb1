"""Fused in-graph KPI evaluation for batched district rollouts.

The reference computes KPIs host-side from per-building numpy series
(``citylearn.py:1136-1323``); the Gym adapter mirrors that in
``envs/environment.py:evaluate``. Here the same normalized KPI table is
computed for thousands of vectorized districts in ONE device computation:
a ``lax.scan`` rollout stacks the per-step quantities, and the
``core.kpi.*_jnp`` reductions produce control/baseline-normalized values
without any host sync.

Covered KPIs — the full building table (``cost_function.py:10-388``):
district ramping_average, daily/monthly one-minus-load-factor, daily and
all-time peak; per-building electricity_consumption_total,
zero_net_energy, carbon_emissions_total, cost_total, the discomfort
9-tuple, one-minus-thermal-resilience and power-outage/annual normalized
unserved energy. Baselines = ``without_storage[_and_partial_load][_and_pv]``
counterfactuals (``building.py:308-476,2863-2933``). The final
*unwritten* row matches the host path exactly, including the live
occupant setpoint override patch
(``envs/environment.py:_sync_unwritten_row``) applied from the carried
``final_state`` — pinned batched-vs-host on the synthesized
``quebec_occ`` dataset in ``tests/test_evaluate_batched.py``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from citylearn_tpu.core import kpi
from citylearn_tpu.core.step import district_step
from citylearn_tpu.core.types import DistrictParams, EnvState, StaticConfig


def _safe_div_jnp(c: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference normalization semantics (``citylearn.py:1172-1189``):
    0/0 -> 1.0; x/0 -> NaN (the host API returns None there)."""
    c = jnp.where(jnp.isfinite(c), c, 0.0)
    b = jnp.where(jnp.isfinite(b), b, 0.0)
    return jnp.where(b == 0.0, jnp.where(c == 0.0, 1.0, jnp.nan),
                     c / jnp.where(b == 0.0, 1.0, b))


def collect_episode(cfg: StaticConfig, params: DistrictParams,
                    state: EnvState, policy_fn: Callable, n_steps: int
                    ) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Scan ``n_steps`` with an in-graph policy, stacking everything the
    KPI table needs: (S, B) per-building series."""
    def body(st, _):
        tau = st.data_offset + st.t
        st, out = district_step(cfg, params, st, policy_fn(params, st))
        ys = dict(
            net=out.net_electricity_consumption,
            cost=out.net_electricity_consumption_cost,
            emission=out.net_electricity_consumption_emission,
            storage=(out.cooling_storage_consumption
                     + out.heating_storage_consumption
                     + out.dhw_storage_consumption
                     + out.battery_consumption
                     + out.chargers_consumption),
            solar=out.solar_generation,             # negative kWh
            pricing=jnp.take(params.series.electricity_pricing, tau, axis=0),
            carbon=jnp.take(params.series.carbon_intensity, tau, axis=0),
            # thermal/resilience inputs (cost_function.py:224-388)
            indoor_t=out.indoor_temperature,
            cooling_sp=out.cooling_set_point,
            heating_sp=out.heating_set_point,
            cooling_demand_actual=out.cooling_demand_actual,
            heating_demand_actual=out.heating_demand_actual,
            # served = met demand + storage discharge per end use + met
            # non-shiftable load (envs/environment.py evaluate())
            served=(out.cooling_demand_met
                    + jnp.clip(-out.cooling_storage_balance, 0.0, None)
                    + out.heating_demand_met
                    + jnp.clip(-out.heating_storage_balance, 0.0, None)
                    + out.dhw_demand_met
                    + jnp.clip(-out.dhw_storage_balance, 0.0, None)
                    + out.non_shiftable_load_met),
        )
        return st, ys

    return jax.lax.scan(body, state, None, length=n_steps)


def kpi_table(cfg: StaticConfig, params: DistrictParams,
              collected: Dict[str, jnp.ndarray], start_tau: jnp.ndarray,
              baseline_condition: str = "_without_storage",
              final_state: EnvState = None) -> Dict[str, jnp.ndarray]:
    """Normalized KPI dict for ONE district from collected (S, B) series.

    Reproduces the host ``evaluate()`` including its series-length quirk:
    the control district series has S rows (one per step taken) while
    counterfactual baselines have S + 1 rows — the final, unwritten index
    contributes zeros except data-driven solar (``citylearn.py:645-700,
    1888-1918``; ``envs/environment.py``)."""
    S = collected["net"].shape[0]
    and_pv = baseline_condition.endswith("_and_pv")
    partial_load = "_and_partial_load" in baseline_condition
    ser = params.series
    # episode window incl. the final unwritten row: sim-range rows
    # [start_tau, start_tau + S]; ``start_tau`` is the sim-range index of
    # the FIRST collected row (data_offset + the state's t at collection
    # start)
    win = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start_tau, S + 1, axis=0)

    net_c = collected["net"]                               # (S, B)
    base = net_c - collected["storage"]
    if and_pv:
        base = base - collected["solar"]
    tau_end = start_tau + S
    extra = (ser.solar_generation[tau_end]                 # positive kWh
             if and_pv else
             jnp.zeros(net_c.shape[1], net_c.dtype))[None, :]
    price_end = ser.electricity_pricing[tau_end][None, :]
    carbon_end = ser.carbon_intensity[tau_end][None, :]
    net_b = jnp.concatenate([base, extra], axis=0)         # (S + 1, B)

    # controlled demand over the full window; the final unwritten row
    # reads as ideal demand fully met (building.py:2554-2558 prefill)
    cool_ideal_w = win(ser.cooling_demand)
    heat_ideal_w = win(ser.heating_demand)
    cool_act = jnp.concatenate([collected["cooling_demand_actual"],
                                cool_ideal_w[-1:]], axis=0)
    heat_act = jnp.concatenate([collected["heating_demand_actual"],
                                heat_ideal_w[-1:]], axis=0)
    if partial_load:
        # DynamicsBuilding counterfactual (building.py:2863-2933): add back
        # the ideal-vs-partial consumption delta. Heating quirk: the
        # reference evaluates the heat-pump input power at the *scalar*
        # outdoor temperature of the final row for the whole series
        # (building.py:2893-2897).
        from citylearn_tpu.core import hvac
        outdoor_w = win(ser.outdoor_dry_bulb_temperature)
        cool_diff = cool_ideal_w - cool_act
        heat_diff = heat_ideal_w - heat_act
        net_b = net_b + hvac.input_power(params.cooling_device, cool_diff,
                                         outdoor_w, False)
        heat_in_hp = hvac.input_power(params.heating_device, heat_diff,
                                      outdoor_w[-1:], True)
        net_b = net_b + jnp.where(params.heating_device.is_heat_pump, heat_in_hp,
                                  heat_diff / params.dhw_device.efficiency)
    price_b = jnp.concatenate([collected["pricing"], price_end], axis=0)
    carbon_b = jnp.concatenate([collected["carbon"], carbon_end], axis=0)
    cost_b = net_b * price_b
    em_b = jnp.clip(net_b * carbon_b, 0.0, None)

    cost_c = collected["cost"]
    em_c = collected["emission"]
    # pricing/carbon-sum gates (citylearn.py:1246-1260 via envs adapter)
    price_sum = jnp.sum(price_b, axis=0)
    carbon_sum = jnp.sum(carbon_b, axis=0)

    building = {
        "electricity_consumption_total": _safe_div_jnp(
            kpi.electricity_consumption_jnp(net_c),
            kpi.electricity_consumption_jnp(net_b)),
        "zero_net_energy": _safe_div_jnp(
            kpi.zero_net_energy_jnp(net_c), kpi.zero_net_energy_jnp(net_b)),
        "carbon_emissions_total": _safe_div_jnp(
            kpi.carbon_emissions_jnp(em_c),
            jnp.where(carbon_sum != 0, kpi.carbon_emissions_jnp(em_b), 0.0)),
        "cost_total": _safe_div_jnp(
            kpi.cost_jnp(cost_c),
            jnp.where(price_sum != 0, kpi.cost_jnp(cost_b), 0.0)),
    }

    # ---- thermal comfort + resilience (cost_function.py:224-388); these
    # are raw (un-normalized) values like the host table ----
    indoor = jnp.concatenate(
        [collected["indoor_t"], win(ser.indoor_dry_bulb_temperature)[-1:]], axis=0)
    csp_end = win(ser.indoor_dry_bulb_temperature_cooling_set_point)[-1:]
    hsp_end = win(ser.indoor_dry_bulb_temperature_heating_set_point)[-1:]
    if cfg.has_occupant and final_state is not None:
        # the host patches the final UNWRITTEN row's setpoints with the
        # live occupant override when one is active
        # (envs/environment._sync_unwritten_row; reference occupant
        # mutation building.py:3248-3353 mutates the series from t on)
        csp_end = jnp.where(jnp.isfinite(final_state.occ_csp_override),
                            final_state.occ_csp_override, csp_end)
        hsp_end = jnp.where(jnp.isfinite(final_state.occ_hsp_override),
                            final_state.occ_hsp_override, hsp_end)
    csp = jnp.concatenate([collected["cooling_sp"], csp_end], axis=0)
    hsp = jnp.concatenate([collected["heating_sp"], hsp_end], axis=0)
    band_w = win(ser.comfort_band)
    occ_w = win(ser.occupant_count)
    outage_w = win(ser.power_outage)
    dis = kpi.discomfort_jnp(indoor, csp, hsp, band_w, occ_w)
    dhw_w = win(ser.dhw_demand)
    nsl_w = win(ser.non_shiftable_load)
    expected = cool_act + heat_act + dhw_w + nsl_w
    served_end = (cool_ideal_w[-1:] + heat_ideal_w[-1:] + dhw_w[-1:] + nsl_w[-1:])
    served = jnp.concatenate([collected["served"], served_end], axis=0)
    building.update({
        "discomfort_proportion": dis[0],
        "discomfort_cold_proportion": dis[1],
        "discomfort_hot_proportion": dis[2],
        "discomfort_cold_delta_minimum": dis[3],
        "discomfort_cold_delta_maximum": dis[4],
        "discomfort_cold_delta_average": dis[5],
        "discomfort_hot_delta_minimum": dis[6],
        "discomfort_hot_delta_maximum": dis[7],
        "discomfort_hot_delta_average": dis[8],
        "one_minus_thermal_resilience_proportion":
            kpi.one_minus_thermal_resilience_jnp(
                outage_w, indoor, csp, hsp, band_w, occ_w),
        "power_outage_normalized_unserved_energy_total":
            kpi.normalized_unserved_energy_jnp(expected, served, outage_w),
        "annual_normalized_unserved_energy_total":
            kpi.normalized_unserved_energy_jnp(expected, served),
    })

    # district: control series drops the final index (length quirk above)
    dc = jnp.sum(net_c, axis=1)                            # (S,)
    db = jnp.sum(net_b, axis=1)                            # (S + 1,)
    district = {
        "ramping_average": _safe_div_jnp(kpi.ramping_jnp(dc), kpi.ramping_jnp(db)),
        "daily_one_minus_load_factor_average": _safe_div_jnp(
            kpi.one_minus_load_factor_jnp(dc, 24),
            kpi.one_minus_load_factor_jnp(db, 24)),
        "monthly_one_minus_load_factor_average": _safe_div_jnp(
            kpi.one_minus_load_factor_jnp(dc, 730),
            kpi.one_minus_load_factor_jnp(db, 730)),
        "daily_peak_average": _safe_div_jnp(
            kpi.peak_jnp(dc, 24), kpi.peak_jnp(db, 24)),
        "all_time_peak_average": _safe_div_jnp(
            kpi.peak_jnp(dc, cfg.time_steps), kpi.peak_jnp(db, cfg.time_steps)),
    }
    # the host's district row averages district KPIs with building-KPI means
    out = {f"building|{k}": v for k, v in building.items()}
    out.update({f"district|{k}": v for k, v in district.items()})
    # pandas groupby-mean skips None/NaN building values (skipna)
    out.update({f"district|{k}": jnp.nanmean(v) for k, v in building.items()})
    return out


def evaluate_districts_fn(cfg: StaticConfig, policy_fn: Callable,
                          n_steps: int = None,
                          baseline_condition: str = "_without_storage"
                          ) -> Callable:
    """Build the (unjitted) batched evaluator ``f(params, states) ->
    {kpi: array}`` so callers can jit it ONCE and reuse it — wrapping in
    ``jax.jit`` per call would retrace the year-long scan every time."""
    S = (cfg.time_steps - 1) if n_steps is None else n_steps

    def run(params, states):
        def one(state):
            st, collected = collect_episode(cfg, params, state, policy_fn, S)
            return kpi_table(cfg, params, collected,
                             state.data_offset + state.t, baseline_condition,
                             final_state=st)

        return jax.vmap(one)(states)

    return run


def evaluate_districts(cfg: StaticConfig, params: DistrictParams,
                       states: EnvState, policy_fn: Callable,
                       n_steps: int = None,
                       baseline_condition: str = "_without_storage"
                       ) -> Dict[str, jnp.ndarray]:
    """One-shot jitted KPI tables for a (D, ...) batch of districts.
    Returns ``building|<kpi>`` -> (D, B) and ``district|<kpi>`` -> (D,)
    arrays. For repeated evaluation, jit :func:`evaluate_districts_fn`
    once instead.

    When ``policy_fn`` is a :class:`citylearn_tpu.core.evaluate_fast.ScriptedPolicy`
    (an open-loop plan — hour-RBC tables or per-building per-step arrays)
    and the configuration is kernel-eligible with fresh identical states,
    the episode runs as ONE whole-episode Pallas kernel launch with
    per-step series recording instead of the XLA scan — same table,
    kernel speed."""
    from citylearn_tpu.core.evaluate_fast import (
        ScriptedPolicy,
        evaluate_scripted,
        kernel_family,
    )

    if isinstance(policy_fn, ScriptedPolicy):
        from citylearn_tpu.core import rollout_fast

        import numpy as np

        D = states.t.shape[0]
        # the kernel evaluates ONE district from the packed initial state
        # at the batch's (shared) episode-window offset and broadcasts —
        # so every district state must EQUAL that fresh state (a caller's
        # hand-modified SOCs at t=0, mixed offsets, or an advanced t
        # would otherwise be silently ignored); anything else falls back
        # to the scan
        from citylearn_tpu.core.params import initial_state

        offs = np.asarray(states.data_offset)
        off0 = int(offs.ravel()[0]) if offs.size else 0
        init = initial_state(cfg, params, off0)
        fresh = all(
            bool(np.all(np.asarray(s_leaf) == np.asarray(i_leaf)[None]))
            for s_leaf, i_leaf in zip(jax.tree_util.tree_leaves(states),
                                      jax.tree_util.tree_leaves(init)))
        family = kernel_family(cfg)
        if family == "lstm" and not rollout_fast.lstm_packable(cfg, params):
            family = None
        if family == "neighborhood" \
                and not rollout_fast.neighborhood_packable(cfg, params):
            family = None
        if off0 and cfg.has_stochastic_outage:
            family = None           # needs a caller-rebaked signal; scan
        if family is not None and fresh:
            table = evaluate_scripted(cfg, params, policy_fn, n_steps,
                                      baseline_condition, data_offset=off0)
            # identical fresh districts -> identical tables; broadcast
            return {k: jnp.broadcast_to(v, (D,) + v.shape)
                    for k, v in table.items()}
        S = (cfg.time_steps - 1) if n_steps is None else int(n_steps)
        policy_fn = policy_fn.as_policy_fn(cfg, params, S)
    run = jax.jit(evaluate_districts_fn(cfg, policy_fn, n_steps,
                                        baseline_condition))
    D = states.t.shape[0]
    from citylearn_tpu.core.rollout import _ev_scan_chunked, _scan_safe_chunk

    if _ev_scan_chunked(cfg, D):
        # the XLA charger/large-neighborhood scan programs crash the TPU
        # worker at large batches (see rollout.EV_SCAN_SAFE_D /
        # DYN_SCAN_SAFE_D) — chunk the batch
        import warnings

        chunk = _scan_safe_chunk(cfg)
        warnings.warn(
            f"chunking EV evaluate_districts into {chunk}-district "
            "launches (TPU scan crash guard; see "
            "core/rollout.EV_SCAN_SAFE_D)", RuntimeWarning, stacklevel=2)
        tables = []
        for lo in range(0, D, chunk):
            sub = jax.tree_util.tree_map(
                lambda x: x[lo:lo + chunk], states)
            tables.append(run(params, sub))
        return {k: jnp.concatenate([t[k] for t in tables], axis=0)
                for k in tables[0]}
    return run(params, states)
