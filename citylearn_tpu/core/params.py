"""Pack a compiled :class:`DistrictSpec` into device tensors + static config.

Data layout is time-major ``(T, B)`` so each scanned step gathers one
contiguous ``(B,)`` slab per field (HBM-friendly; replaces the reference's
per-step ``TimeSeriesData.__getattr__`` slicing, ``data.py:313``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from citylearn_tpu.compiler.spec import BuildingSpec, DistrictSpec
from citylearn_tpu.compiler.spaces import heat_pump_cop_np
from citylearn_tpu.core.types import (
    BatteryParams,
    ChargerParams,
    DistrictParams,
    DynamicsParams,
    EnvState,
    EVParams,
    HVACParams,
    SeriesData,
    StaticConfig,
    StorageTankParams,
    WashingMachineParams,
)

PERIODIC_MAX = {"hour": 24, "day_type": 7, "month": 12, "minutes": 60}
DYNAMIC_CHANNELS = ("indoor_dry_bulb_temperature", "cooling_demand", "heating_demand")

# Observation names whose returned-at-t value is state-derived and therefore
# *zero* at any index the step has not written yet (the reference returns
# observations at t+1 before anything is written there; see
# envs/environment.py and SURVEY.md §A.8 gotcha 5).
DERIVED_ZERO_OBSERVATIONS = frozenset({
    "cooling_storage_soc", "heating_storage_soc", "dhw_storage_soc",
    "electrical_storage_soc", "net_electricity_consumption",
    "cooling_electricity_consumption", "heating_electricity_consumption",
    "dhw_electricity_consumption", "cooling_storage_electricity_consumption",
    "heating_storage_electricity_consumption",
    "dhw_storage_electricity_consumption",
    "electrical_storage_electricity_consumption",
    "washing_machine_electricity_consumption",
})


@dataclasses.dataclass(frozen=True)
class ObsLayout:
    """Static observation metadata: the union column order and each
    building's active subset (as indices into the union)."""
    union_names: Tuple[str, ...]
    building_indices: Tuple[Tuple[int, ...], ...]   # per building

    def column(self, name: str) -> int:
        return self.union_names.index(name)


def _stack(spec: DistrictSpec, key: str, dtype=np.float32) -> np.ndarray:
    """(T, B) stack of one series over the simulation range."""
    sl = slice(spec.simulation_start_time_step, spec.simulation_end_time_step + 1)
    cols = [b.series[key][sl] for b in spec.buildings]
    return np.stack(cols, axis=1).astype(dtype)


def _obs_series(b: BuildingSpec, name: str, sl: slice) -> np.ndarray:
    """Data-driven value of observation ``name`` for one building over the
    simulation range (reference ``building.py:1336-1481`` data paths)."""
    s = b.series
    n = sl.stop - sl.start if sl.stop is not None else len(s["hour"])
    if name in DERIVED_ZERO_OBSERVATIONS:
        return np.zeros(len(s["hour"][sl]), np.float32)
    if name == "power_outage":
        # obs reads the resolved signal (building.py:1458): zeros unless the
        # CSV signal is simulated; stochastic signals are overridden at
        # runtime by the adapter.
        if b.simulate_power_outage and not b.stochastic_power_outage:
            return s["power_outage"][sl]
        return np.zeros(len(s["hour"][sl]), np.float32)
    if name == "solar_generation":
        return np.abs(b.pv_nominal_power * s["solar_generation"][sl] / 1000.0)
    if name == "cooling_device_efficiency":
        return heat_pump_cop_np(s["outdoor_dry_bulb_temperature"][sl],
                                b.cooling_device.efficiency,
                                b.cooling_device.target_cooling_temperature, False)
    if name == "heating_device_efficiency":
        if b.heating_device.is_heat_pump:
            return heat_pump_cop_np(s["outdoor_dry_bulb_temperature"][sl],
                                    b.heating_device.efficiency,
                                    b.heating_device.target_heating_temperature, True)
        return np.full(len(s["hour"][sl]), b.heating_device.efficiency, np.float32)
    if name == "dhw_device_efficiency":
        if b.dhw_device.is_heat_pump:
            return heat_pump_cop_np(s["outdoor_dry_bulb_temperature"][sl],
                                    b.dhw_device.efficiency,
                                    b.dhw_device.target_heating_temperature, True)
        return np.full(len(s["hour"][sl]), b.dhw_device.efficiency, np.float32)
    if name == "indoor_dry_bulb_temperature_cooling_delta":
        return (s["indoor_dry_bulb_temperature"][sl]
                - s["indoor_dry_bulb_temperature_cooling_set_point"][sl])
    if name == "indoor_dry_bulb_temperature_heating_delta":
        return (s["indoor_dry_bulb_temperature"][sl]
                - s["indoor_dry_bulb_temperature_heating_set_point"][sl])
    if name in s:
        return s[name][sl]
    return np.zeros(len(s["hour"][sl]), np.float32)


def build_obs_layout(spec: DistrictSpec) -> ObsLayout:
    union: List[str] = []
    for b in spec.buildings:
        for k in b.active_observations:
            if k not in union:
                union.append(k)
    indices = tuple(tuple(union.index(k) for k in b.active_observations)
                    for b in spec.buildings)
    return ObsLayout(union_names=tuple(union), building_indices=indices)


def pack(spec: DistrictSpec, param_dtype=np.float32
         ) -> Tuple[StaticConfig, DistrictParams, ObsLayout]:
    B = spec.n_buildings
    sl = slice(spec.simulation_start_time_step, spec.simulation_end_time_step + 1)

    solar = np.stack(
        [b.pv_nominal_power * b.series["solar_generation"][sl] / 1000.0
         for b in spec.buildings], axis=1).astype(np.float32)
    # Outage signals: data-driven from the CSV; stochastic models resolve
    # deterministically per reset in the reference (fresh RandomState(seed)
    # each time, building.py:2566-2594), so the default-window signal can
    # be baked here — the Gym adapter re-bakes per episode window at reset
    # for rolling/random splits (envs/environment.py:_refresh_outage_signals)
    ep_steps_bake = spec.episode_time_steps
    if ep_steps_bake is None:
        ep_steps_bake = spec.simulation_time_steps
    elif isinstance(ep_steps_bake, list):
        ep_steps_bake = ep_steps_bake[0][1] - ep_steps_bake[0][0] + 1
    ep_steps_bake = int(ep_steps_bake)
    T_sim = spec.simulation_time_steps
    outage_cols = []
    for b in spec.buildings:
        if b.simulate_power_outage and b.stochastic_power_outage:
            from citylearn_tpu.envs.outage import building_outage_signal
            ep_sl = slice(spec.simulation_start_time_step,
                          spec.simulation_start_time_step + ep_steps_bake)
            col = np.zeros(T_sim, np.float32)
            col[:ep_steps_bake] = building_outage_signal(
                b, ep_steps_bake, spec.seconds_per_time_step, ep_sl)
            outage_cols.append(col)
        elif b.simulate_power_outage:
            outage_cols.append(b.series["power_outage"][sl])
        else:
            outage_cols.append(np.zeros_like(b.series["power_outage"][sl]))
    outage = np.stack(outage_cols, axis=1).astype(np.float32)

    series = SeriesData(
        non_shiftable_load=jnp.asarray(_stack(spec, "non_shiftable_load")),
        cooling_demand=jnp.asarray(_stack(spec, "cooling_demand")),
        heating_demand=jnp.asarray(_stack(spec, "heating_demand")),
        dhw_demand=jnp.asarray(_stack(spec, "dhw_demand")),
        solar_generation=jnp.asarray(solar),
        outdoor_dry_bulb_temperature=jnp.asarray(_stack(spec, "outdoor_dry_bulb_temperature")),
        electricity_pricing=jnp.asarray(_stack(spec, "electricity_pricing")),
        carbon_intensity=jnp.asarray(_stack(spec, "carbon_intensity")),
        power_outage=jnp.asarray(outage),
        hvac_mode=jnp.asarray(_stack(spec, "hvac_mode", np.int32)),
        hour=jnp.asarray(_stack(spec, "hour", np.int32)),
        indoor_dry_bulb_temperature=jnp.asarray(_stack(spec, "indoor_dry_bulb_temperature")),
        indoor_dry_bulb_temperature_cooling_set_point=jnp.asarray(
            _stack(spec, "indoor_dry_bulb_temperature_cooling_set_point")),
        indoor_dry_bulb_temperature_heating_set_point=jnp.asarray(
            _stack(spec, "indoor_dry_bulb_temperature_heating_set_point")),
        comfort_band=jnp.asarray(_stack(spec, "comfort_band")),
        occupant_count=jnp.asarray(_stack(spec, "occupant_count")),
    )

    # ``param_dtype``: device parameters are Python floats in the
    # reference (schema JSON values); parity mode packs them at float64
    # while the fast path uses float32 (see envs/environment.py)
    f32 = lambda vals: jnp.asarray(np.asarray(vals, param_dtype))
    battery = BatteryParams(
        capacity=f32([b.battery.capacity for b in spec.buildings]),
        nominal_power=f32([b.battery.nominal_power for b in spec.buildings]),
        efficiency=f32([b.battery.efficiency for b in spec.buildings]),
        loss_coefficient=f32([b.battery.loss_coefficient for b in spec.buildings]),
        initial_soc=f32([b.battery.initial_soc for b in spec.buildings]),
        depth_of_discharge=f32([b.battery.depth_of_discharge for b in spec.buildings]),
        capacity_loss_coefficient=f32([b.battery.capacity_loss_coefficient for b in spec.buildings]),
        power_efficiency_curve_x=f32([b.battery.power_efficiency_curve_x for b in spec.buildings]),
        power_efficiency_curve_y=f32([b.battery.power_efficiency_curve_y for b in spec.buildings]),
        capacity_power_curve_x=f32([b.battery.capacity_power_curve_x for b in spec.buildings]),
        capacity_power_curve_y=f32([b.battery.capacity_power_curve_y for b in spec.buildings]),
        capacity_weak=jnp.asarray([b.battery.capacity_weak for b in spec.buildings]),
        dod_weak=jnp.asarray([b.battery.dod_weak for b in spec.buildings]),
    )

    def hvac_params(get) -> HVACParams:
        return HVACParams(
            is_heat_pump=jnp.asarray([get(b).is_heat_pump for b in spec.buildings]),
            nominal_power=f32([get(b).nominal_power for b in spec.buildings]),
            efficiency=f32([get(b).efficiency for b in spec.buildings]),
            target_cooling_temperature=f32([get(b).target_cooling_temperature for b in spec.buildings]),
            target_heating_temperature=f32([get(b).target_heating_temperature for b in spec.buildings]),
        )

    def tank_params(get) -> StorageTankParams:
        return StorageTankParams(
            capacity=f32([get(b).capacity for b in spec.buildings]),
            efficiency=f32([get(b).efficiency for b in spec.buildings]),
            loss_coefficient=f32([get(b).loss_coefficient for b in spec.buildings]),
            initial_soc=f32([get(b).initial_soc for b in spec.buildings]),
            max_input_power=f32([get(b).max_input_power for b in spec.buildings]),
            max_output_power=f32([get(b).max_output_power for b in spec.buildings]),
            capacity_weak=jnp.asarray([get(b).capacity_weak for b in spec.buildings]),
            capacity_npf32=jnp.asarray([get(b).capacity_npf32 for b in spec.buildings]),
        )

    layout = build_obs_layout(spec)
    T = spec.simulation_time_steps
    obs_static = np.zeros((T, B, len(layout.union_names)), np.float32)
    ev_obs_cols = _ev_obs_columns(spec, T)
    for bi, b in enumerate(spec.buildings):
        for ki, name in enumerate(layout.union_names):
            if name not in b.active_observations:
                continue
            if (bi, name) in ev_obs_cols:
                col = ev_obs_cols[(bi, name)]
                obs_static[:len(col), bi, ki] = col[:T]
            else:
                obs_static[:, bi, ki] = _obs_series(b, name, sl)

    episode_steps = spec.episode_time_steps
    if episode_steps is None:
        episode_steps = spec.simulation_time_steps
    elif isinstance(episode_steps, list):
        episode_steps = episode_steps[0][1] - episode_steps[0][0] + 1
    episode_steps = int(episode_steps)

    dynamics, dyn_cfg = _pack_dynamics(spec, sl)
    occupant, occ_cfg = _pack_occupant(spec, episode_steps)
    chargers, evs, wms, ev_cfg = _pack_evs(spec, episode_steps, param_dtype)

    params = DistrictParams(
        series=series,
        battery=battery,
        cooling_device=hvac_params(lambda b: b.cooling_device),
        heating_device=hvac_params(lambda b: b.heating_device),
        dhw_device=hvac_params(lambda b: b.dhw_device),
        cooling_storage=tank_params(lambda b: b.cooling_storage),
        heating_storage=tank_params(lambda b: b.heating_storage),
        dhw_storage=tank_params(lambda b: b.dhw_storage),
        obs_static=jnp.asarray(obs_static),
        dynamics=dynamics,
        occupant=occupant,
        chargers=chargers,
        evs=evs,
        washing_machines=wms,
    )

    reward_block = spec.schema.get("reward_function") or {}
    raw_type = reward_block.get("type")
    raw_attrs = reward_block.get("attributes") or {}
    reward_per_building = None
    if isinstance(raw_type, dict):
        # MultiBuildingRewardFunction (reference citylearn.py:2108-2141):
        # per-building dotted paths with 'default' fallback (else the first
        # entry); attributes dict follows the same fallback
        default_type = raw_type.get("default")
        if default_type is None and raw_type:
            default_type = next(iter(raw_type.values()))
        default_attrs = raw_attrs.get("default")
        if default_attrs is None and raw_attrs:
            default_attrs = next(iter(raw_attrs.values()))
        per = []
        for b in spec.buildings:
            t = raw_type.get(b.name, default_type)
            if t is None:
                raise ValueError(f"no reward function for building {b.name!r} "
                                 "and no default provided")
            a = raw_attrs.get(b.name, default_attrs) or {}
            per.append((t.rsplit(".", 1)[-1],
                        float(a.get("exponent") or 1.0),
                        None if a.get("band") is None else float(a["band"]),
                        float(a.get("lower_exponent") or 2.0),
                        float(a.get("higher_exponent") or 2.0),
                        tuple(a.get("coefficients") or (1.0, 1.0))))
        reward_per_building = tuple(per)
        reward_type = "MultiBuildingRewardFunction"
        reward_attrs = {}
    else:
        reward_type = (raw_type or
                       "citylearn.reward_function.RewardFunction").rsplit(".", 1)[-1]
        reward_attrs = raw_attrs

    cfg = StaticConfig(
        n_buildings=B,
        time_steps=int(episode_steps),
        central_agent=spec.central_agent,
        seconds_per_time_step=spec.seconds_per_time_step,
        time_step_ratio=spec.time_step_ratio,
        simulate_power_outage=tuple(b.simulate_power_outage for b in spec.buildings),
        has_stochastic_outage=any(b.simulate_power_outage
                                  and b.stochastic_power_outage
                                  for b in spec.buildings),
        reward_type=reward_type,
        reward_exponent=float(reward_attrs.get("exponent") or 1.0),
        reward_band=(None if reward_attrs.get("band") is None
                     else float(reward_attrs["band"])),
        reward_lower_exponent=float(reward_attrs.get("lower_exponent") or 2.0),
        reward_higher_exponent=float(reward_attrs.get("higher_exponent") or 2.0),
        reward_coefficients=tuple(reward_attrs.get("coefficients") or (1.0, 1.0)),
        reward_per_building=reward_per_building,
        any_cooling=bool(
            any(float(b.series["cooling_demand"][sl].max()) > 0
                or b.cooling_storage.capacity > 0 for b in spec.buildings)
            or dyn_cfg.get("has_dynamics", False)),
        any_heating=bool(
            any(float(b.series["heating_demand"][sl].max()) > 0
                or b.heating_storage.capacity > 0 for b in spec.buildings)
            or dyn_cfg.get("has_dynamics", False)),
        any_dhw=bool(any(float(b.series["dhw_demand"][sl].max()) > 0
                         or b.dhw_storage.capacity > 0 for b in spec.buildings)),
        **dyn_cfg,
        **occ_cfg,
        **ev_cfg,
    )
    return cfg, params, layout


def rebake_outage(spec: DistrictSpec, cfg: StaticConfig,
                  params: DistrictParams, data_offset: int
                  ) -> DistrictParams:
    """Re-bake stochastic-outage signals for the episode window starting
    at sim-range row ``data_offset`` (the default ``pack`` bakes rows
    [0, episode_steps) only). Returns params with the signal written at
    rows [data_offset, data_offset + episode_steps); CSV-driven outage
    columns are untouched (they are sim-range data already). Mirrors
    ``envs/environment._refresh_outage_signals`` for batched/kernel
    paths (VERDICT r4 #4)."""
    from citylearn_tpu.envs.outage import building_outage_signal

    if not cfg.has_stochastic_outage or data_offset == 0:
        return params
    ep_steps = spec.episode_time_steps
    if ep_steps is None:
        ep_steps = spec.simulation_time_steps
    elif isinstance(ep_steps, list):
        ep_steps = ep_steps[0][1] - ep_steps[0][0] + 1
    ep_steps = int(ep_steps)
    full = np.array(np.asarray(params.series.power_outage))
    off = int(data_offset)
    for bi, b in enumerate(spec.buildings):
        if not (b.simulate_power_outage and b.stochastic_power_outage):
            continue
        start = spec.simulation_start_time_step + off
        sig = building_outage_signal(b, ep_steps,
                                     spec.seconds_per_time_step,
                                     slice(start, start + ep_steps))
        full[:, bi] = 0.0
        n = min(ep_steps, full.shape[0] - off)
        full[off:off + n, bi] = sig[:n]
    return params.replace(series=params.series.replace(
        power_outage=jnp.asarray(full)))


def _pack_occupant(spec: DistrictSpec, episode_steps: int):
    """Stack occupant interaction models over buildings; precompute the
    per-step seeded uniform draws (``occupant.py:69-71``: a fresh
    ``RandomState(max(seed, 1) + t)`` per step — building-independent
    because every occupant shares the env seed)."""
    from citylearn_tpu.core.types import OccupantParams

    occs = [b.occupant for b in spec.buildings]
    if all(o is None for o in occs):
        return None, {}
    assert all(o is not None for o in occs), \
        "mixed occupant/plain dynamics districts not yet supported"
    n_nodes = max(o.tree_children_left.shape[1] for o in occs)
    depth = max(o.max_depth for o in occs)

    def pad_nodes(a, fill):
        out = np.full((len(occs), 2, n_nodes), fill, a[0].dtype)
        for i, arr in enumerate(a):
            out[i, :, :arr.shape[1]] = arr
        return jnp.asarray(out)

    seed = max(spec.random_seed, 1)
    rand = np.asarray([np.random.RandomState(seed + t).uniform()
                       for t in range(episode_steps)], np.float32)

    series = lambda get: jnp.asarray(np.stack(
        [get(o)[:episode_steps] for o in occs], axis=1).astype(np.float32))
    occ = OccupantParams(
        a_increase=series(lambda o: o.a_increase),
        b_increase=series(lambda o: o.b_increase),
        a_decrease=series(lambda o: o.a_decrease),
        b_decrease=series(lambda o: o.b_decrease),
        random_probability=jnp.asarray(rand),
        tree_children_left=pad_nodes([o.tree_children_left for o in occs], -1),
        tree_children_right=pad_nodes([o.tree_children_right for o in occs], -1),
        tree_feature=pad_nodes([o.tree_feature for o in occs], -2),
        tree_threshold=pad_nodes([o.tree_threshold for o in occs], 0.0),
        tree_delta=pad_nodes([o.tree_delta for o in occs], 0.0),
        hold_time_steps=jnp.asarray(
            [min(o.set_point_hold_time_steps, 2 ** 30) for o in occs], jnp.int32),
        lookback=jnp.asarray(
            [b.dynamics.lookback if b.dynamics else 0 for b in spec.buildings],
            jnp.int32),
    )
    return occ, dict(has_occupant=True, occupant_tree_depth=depth)


def _ev_obs_columns(spec: DistrictSpec, T: int):
    """Data-driven values for per-charger / per-WM observation columns
    (reference ``building.py:1221-1331``). The SOC column holds the value
    visible at *observation* time: the forced arrival SOC when an EV just
    (re)connected, else the reference's stale 0.0."""
    from citylearn_tpu.compiler.events import resolve_ev_events

    cols = {}
    n_evs = len(spec.electric_vehicles)
    any_chargers = any(b.chargers for b in spec.buildings)
    force = None
    if any_chargers and n_evs:
        force, _ = resolve_ev_events(spec.buildings, n_evs, T,
                                     drift_seed=spec.random_seed)
    for bi, b in enumerate(spec.buildings):
        for ch in b.chargers:
            cid = ch.charger_id
            conn = ch.connected_ev >= 0
            inc = ch.incoming_ev >= 0
            n = len(conn)
            soc_col = np.full(n, -0.1, np.float32)
            if force is not None:
                f = force[np.arange(min(n, len(force))),
                          np.clip(ch.connected_ev[:len(force)], 0, None)]
                soc_vis = np.where(np.isfinite(f), f, 0.0)
                soc_col[:len(f)] = np.where(conn[:len(f)], soc_vis, -0.1)
            cols[(bi, f"electric_vehicle_charger_{cid}_connected_state")] = \
                conn.astype(np.float32)
            cols[(bi, f"connected_electric_vehicle_at_charger_{cid}_departure_time")] = \
                np.where(conn, ch.departure_time, -1).astype(np.float32)
            cols[(bi, f"connected_electric_vehicle_at_charger_{cid}_required_soc_departure")] = \
                np.where(conn, ch.required_soc, -0.1).astype(np.float32)
            cols[(bi, f"connected_electric_vehicle_at_charger_{cid}_soc")] = soc_col
            cols[(bi, f"connected_electric_vehicle_at_charger_{cid}_battery_capacity")] = \
                np.where(conn, ch.capacity_kwh, -1.0).astype(np.float32)
            cols[(bi, f"electric_vehicle_charger_{cid}_incoming_state")] = \
                inc.astype(np.float32)
            cols[(bi, f"incoming_electric_vehicle_at_charger_{cid}_estimated_arrival_time")] = \
                np.where(inc, ch.arrival_time, -1).astype(np.float32)
            cols[(bi, f"incoming_electric_vehicle_at_charger_{cid}_estimated_soc_arrival")] = \
                np.where(inc, ch.estimated_soc_arrival, -0.1).astype(np.float32)
        for wm in b.washing_machines:
            cols[(bi, f"{wm.name}_start_time_step")] = wm.wm_start.astype(np.float32)
            cols[(bi, f"{wm.name}_end_time_step")] = wm.wm_end.astype(np.float32)
        # charging-constraint phase one-hots are static data; headroom and
        # violation columns stay zero and are overridden at runtime
        cc = b.charging_constraints
        if cc and (cc.get("observations") or {}).get("phase_encoding"):
            phase_map = {cid: (p.get("name") or "")
                         for p in (cc.get("phases") or [])
                         for cid in (p.get("chargers") or [])}
            for name in b.active_observations:
                if name.startswith("charging_phase_one_hot_"):
                    rest = name[len("charging_phase_one_hot_"):]
                    for ch in b.chargers:
                        if rest.startswith(ch.charger_id + "_"):
                            pn = rest[len(ch.charger_id) + 1:]
                            assigned = phase_map.get(ch.charger_id, "unassigned")
                            cols[(bi, name)] = np.full(
                                T, 1.0 if assigned == pn else 0.0, np.float32)
    return cols


def _pack_evs(spec: DistrictSpec, episode_steps: int, param_dtype=np.float32):
    """Stack chargers/EVs/washing machines + precompile SOC event tensors."""
    from citylearn_tpu.compiler.events import resolve_ev_events

    all_chargers = [ch for b in spec.buildings for ch in b.chargers]
    all_wms = [wm for b in spec.buildings for wm in b.washing_machines]
    n_evs = len(spec.electric_vehicles)
    cfg = dict(has_evs=len(all_chargers) > 0,
               has_washing_machines=len(all_wms) > 0,
               n_chargers=len(all_chargers), n_evs=n_evs,
               n_washing_machines=len(all_wms))
    reward_block = spec.schema.get("reward_function") or {}
    weights = (reward_block.get("attributes") or {}).get("weights")
    if weights:
        cfg["ev_reward_weights"] = (
            float(weights.get("no_car_charging", -5.0)),
            float(weights.get("battery_limits", -2.0)),
            float(weights.get("soc_impossible", -10.0)),
            float(weights.get("soc_under", -5.0)),
            float(weights.get("close_soc", 10.0)),
            float(weights.get("self_ev_consumption", 5.0)),
            float(weights.get("extra_self_production", 5.0)))

    chargers = evs = wms = None
    f32 = lambda vals: jnp.asarray(np.asarray(vals, param_dtype))
    if all_chargers:
        def sched(field):
            # pad/trim schedule arrays to the episode length (indexed by
            # episode-relative t, like the reference's un-windowed data)
            cols = []
            for ch in all_chargers:
                a = np.asarray(getattr(ch, field), np.float32)
                if len(a) < episode_steps:
                    a = np.pad(a, (0, episode_steps - len(a)), constant_values=-1)
                cols.append(a[:episode_steps])
            return jnp.asarray(np.stack(cols, axis=1))

        # charging-constraint tables (building.py:764-994)
        B = spec.n_buildings
        cc_building = np.full(B, np.inf, np.float32)
        cc_phase_index = np.full(len(all_chargers), -1, np.int32)
        cc_phase_limits, cc_phase_buildings = [], []
        has_cc = False
        cid_to_slot = {ch.charger_id: i for i, ch in enumerate(all_chargers)}
        for b in spec.buildings:
            cc = b.charging_constraints
            if not cc:
                continue
            has_cc = True
            if cc.get("building_limit_kw") is not None:
                cc_building[b.index] = float(cc["building_limit_kw"])
            for phase in (cc.get("phases") or []):
                limit = phase.get("limit_kw")
                pid = len(cc_phase_limits)
                cc_phase_limits.append(np.inf if limit is None else float(limit))
                cc_phase_buildings.append(b.index)
                for cid in (phase.get("chargers") or []):
                    if cid in cid_to_slot:
                        cc_phase_index[cid_to_slot[cid]] = pid
        if not cc_phase_limits:
            cc_phase_limits, cc_phase_buildings = [np.inf], [0]
        cfg["has_charging_constraints"] = has_cc
        cfg["n_charging_phases"] = len(cc_phase_limits)
        rb_attrs = (spec.schema.get("reward_function") or {}).get("attributes") or {}
        cfg["charging_penalty_coefficient"] = float(
            rb_attrs.get("charging_constraint_penalty_coefficient") or 1.0)

        chargers = ChargerParams(
            cc_phase_index=jnp.asarray(cc_phase_index),
            cc_building_limit=jnp.asarray(cc_building),
            cc_phase_limit=jnp.asarray(np.asarray(cc_phase_limits, np.float32)),
            cc_phase_building=jnp.asarray(np.asarray(cc_phase_buildings, np.int32)),
            efficiency=f32([ch.efficiency for ch in all_chargers]),
            charge_eff_x=f32([ch.charge_eff_x for ch in all_chargers]),
            charge_eff_y=f32([ch.charge_eff_y for ch in all_chargers]),
            discharge_eff_x=f32([ch.discharge_eff_x for ch in all_chargers]),
            discharge_eff_y=f32([ch.discharge_eff_y for ch in all_chargers]),
            max_charging_power=f32([ch.max_charging_power for ch in all_chargers]),
            min_charging_power=f32([ch.min_charging_power for ch in all_chargers]),
            max_discharging_power=f32([ch.max_discharging_power for ch in all_chargers]),
            min_discharging_power=f32([ch.min_discharging_power for ch in all_chargers]),
            building_index=jnp.asarray([ch.building_index for ch in all_chargers],
                                       jnp.int32),
            connected_ev=sched("connected_ev").astype(jnp.int32),
            departure_time=sched("departure_time"),
            required_soc=sched("required_soc"),
            capacity_kwh=sched("capacity_kwh"),
        )
        force, drift = resolve_ev_events(spec.buildings, n_evs, episode_steps,
                                         drift_seed=spec.random_seed)
        bat = lambda get: f32([get(e.battery) for e in spec.electric_vehicles])
        evs = EVParams(
            battery=BatteryParams(
                capacity=bat(lambda b: b.capacity),
                nominal_power=bat(lambda b: b.nominal_power),
                efficiency=bat(lambda b: b.efficiency),
                loss_coefficient=bat(lambda b: b.loss_coefficient),
                initial_soc=bat(lambda b: b.initial_soc),
                depth_of_discharge=bat(lambda b: b.depth_of_discharge),
                capacity_loss_coefficient=bat(lambda b: b.capacity_loss_coefficient),
                power_efficiency_curve_x=bat(lambda b: b.power_efficiency_curve_x),
                power_efficiency_curve_y=bat(lambda b: b.power_efficiency_curve_y),
                capacity_power_curve_x=bat(lambda b: b.capacity_power_curve_x),
                capacity_power_curve_y=bat(lambda b: b.capacity_power_curve_y),
                capacity_weak=jnp.asarray(
                    [e.battery.capacity_weak for e in spec.electric_vehicles]),
                dod_weak=jnp.asarray(
                    [e.battery.dod_weak for e in spec.electric_vehicles]),
            ),
            force_soc=jnp.asarray(force),
            drift_mult=jnp.asarray(drift),
        )
    if all_wms:
        starts, ends, loads = [], [], []
        for wm in all_wms:
            s = np.asarray(wm.wm_start, np.int32)[:episode_steps]
            e = np.asarray(wm.wm_end, np.int32)[:episode_steps]
            tl = np.zeros(episode_steps, np.float32)
            for t in range(min(episode_steps, len(wm.load_profiles))):
                profile = wm.load_profiles[t]
                # reference energy_model.py:1327-1330: only entries whose
                # (unused) target step fits the episode are added — and all
                # of them land on the trigger step
                profile = np.atleast_1d(profile)
                n_fit = max(0, min(len(profile), episode_steps - t))
                tl[t] = float(np.sum(profile[:n_fit]))
            starts.append(s); ends.append(e); loads.append(tl)
        wms = WashingMachineParams(
            building_index=jnp.asarray([wm.building_index for wm in all_wms], jnp.int32),
            wm_start=jnp.asarray(np.stack(starts, axis=1)),
            wm_end=jnp.asarray(np.stack(ends, axis=1)),
            triggered_load=jnp.asarray(np.stack(loads, axis=1)),
        )
    return chargers, evs, wms, cfg


def _pack_dynamics(spec: DistrictSpec, sl: slice):
    """Group buildings by identical LSTM shape/channels and stack each
    group's weights + precomputed static input channels."""
    dyn_specs = [(bi, b.dynamics) for bi, b in enumerate(spec.buildings)
                 if b.dynamics is not None]
    if not dyn_specs:
        return (), {}
    assert len(dyn_specs) == len(spec.buildings), \
        "mixed dynamics/plain building districts not yet supported"

    T = sl.stop - sl.start

    def channel_series(b, name) -> np.ndarray:
        if name in DYNAMIC_CHANNELS:
            return np.zeros(T, np.float32)
        for k, xmax in PERIODIC_MAX.items():
            if name == f"{k}_sin":
                return np.sin(2 * np.pi * b.series[k][sl] / xmax).astype(np.float32)
            if name == f"{k}_cos":
                return np.cos(2 * np.pi * b.series[k][sl] / xmax).astype(np.float32)
        if name in b.series:
            return b.series[name][sl].astype(np.float32)
        raise NotImplementedError(f"dynamics input channel {name}")

    # partition into shape-identical groups (preserving building order)
    groups: dict = {}
    for bi, d in dyn_specs:
        key = (tuple(d.input_observation_names), d.hidden_size, d.num_layers,
               d.lookback)
        groups.setdefault(key, []).append(bi)

    f32 = lambda arrs: jnp.asarray(np.stack(arrs).astype(np.float32))
    packed = []
    metas = []
    max_lookback = 0
    for (names, H, L, lookback), members in groups.items():
        names = list(names)
        F = len(names)
        max_lookback = max(max_lookback, lookback)
        ds = [spec.buildings[bi].dynamics for bi in members]
        static = np.zeros((T, len(members), F), np.float32)
        for gi, bi in enumerate(members):
            b = spec.buildings[bi]
            d = b.dynamics
            for fi, name in enumerate(names):
                if name in DYNAMIC_CHANNELS:
                    continue
                v = channel_series(b, name)
                lo, hi = d.norm_min[fi], d.norm_max[fi]
                static[:, gi, fi] = (v - lo) / (hi - lo)
        packed.append(DynamicsParams(
            member_indices=jnp.asarray(members, jnp.int32),
            w_ih=tuple(f32([d.w_ih[l] for d in ds]) for l in range(L)),
            w_hh=tuple(f32([d.w_hh[l] for d in ds]) for l in range(L)),
            bias=tuple(f32([d.bias[l] for d in ds]) for l in range(L)),
            lin_w=f32([d.lin_w for d in ds]),
            lin_b=jnp.asarray(np.asarray([d.lin_b for d in ds], np.float32)),
            norm_min=f32([d.norm_min for d in ds]),
            norm_max=f32([d.norm_max for d in ds]),
            static_channels=jnp.asarray(static),
            cooling_device_active=jnp.asarray(
                ["cooling_device" in spec.buildings[bi].active_actions
                 for bi in members]),
            heating_device_active=jnp.asarray(
                ["heating_device" in spec.buildings[bi].active_actions
                 for bi in members]),
            cooling_or_heating_active=jnp.asarray(
                ["cooling_or_heating_device" in spec.buildings[bi].active_actions
                 for bi in members]),
        ))
        metas.append((lookback, L, H, F,
                      names.index("indoor_dry_bulb_temperature"),
                      names.index("cooling_demand") if "cooling_demand" in names else -1,
                      names.index("heating_demand") if "heating_demand" in names else -1))

    dyn_cfg = dict(has_dynamics=True, dyn_groups=tuple(metas),
                   max_lookback=max_lookback)
    return tuple(packed), dyn_cfg


def initial_state(cfg: StaticConfig, params: DistrictParams,
                  data_offset: int = 0) -> EnvState:
    """Episode-start state (reference ``Building.reset`` semantics:
    SOC index 0 = initial_soc, efficiency history truncated to its base,
    capacity history truncated to nominal capacity —
    ``building.py:2526-2564``, ``energy_model.py:797-803,1237-1242``)."""
    B = params.battery.capacity.shape[0]
    if cfg.has_evs:
        ev_soc = params.evs.battery.initial_soc
        ev_eff = params.evs.battery.efficiency
        ev_deg = params.evs.battery.capacity
    else:
        ev_soc = ev_eff = ev_deg = jnp.zeros((0,), jnp.float32)
    wm_initiated = jnp.zeros((cfg.n_washing_machines,), bool)
    lstm_h, dyn_input = [], []
    for meta, dyn in zip(cfg.dyn_groups, params.dynamics):
        lookback, L, H, F, *_ = meta
        Bg = dyn.member_indices.shape[0]
        lstm_h.append(jnp.zeros((L, Bg, H), jnp.float32))
        dyn_input.append(jnp.zeros((Bg, F, lookback + 1), jnp.float32))
    lstm_h, dyn_input = tuple(lstm_h), tuple(dyn_input)
    nanB = jnp.full((B,), jnp.nan, jnp.float32)
    if cfg.has_occupant:
        occ_state = dict(
            occ_csp_override=nanB, occ_hsp_override=nanB,
            occ_hold_counter=jnp.full((B,), -1, jnp.int32),
            occ_prev_temp=jnp.zeros((B,), jnp.float32),
            occ_prev_csp=jnp.zeros((B,), jnp.float32),
            occ_prev_hsp=jnp.zeros((B,), jnp.float32))
    else:
        z0 = jnp.zeros((0,), jnp.float32)
        occ_state = dict(occ_csp_override=z0, occ_hsp_override=z0,
                         occ_hold_counter=jnp.zeros((0,), jnp.int32),
                         occ_prev_temp=z0, occ_prev_csp=z0, occ_prev_hsp=z0)
    return EnvState(
        t=jnp.asarray(0, jnp.int32),
        data_offset=jnp.asarray(data_offset, jnp.int32),
        **occ_state,
        battery_soc=params.battery.initial_soc,
        battery_efficiency=params.battery.efficiency,
        battery_degraded_capacity=params.battery.capacity,
        cooling_storage_soc=params.cooling_storage.initial_soc,
        heating_storage_soc=params.heating_storage.initial_soc,
        dhw_storage_soc=params.dhw_storage.initial_soc,
        lstm_h=lstm_h,
        lstm_c=tuple(jnp.zeros_like(h) for h in lstm_h),
        dyn_input=dyn_input,
        ev_soc=ev_soc,
        ev_efficiency=ev_eff,
        ev_degraded_capacity=ev_deg,
        wm_initiated=wm_initiated,
    )
