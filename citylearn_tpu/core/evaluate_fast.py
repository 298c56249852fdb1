"""Kernel-backed batched evaluation: the user-facing KPI table served by
the whole-episode Pallas kernels.

The reference's ``evaluate()`` (``citylearn.py:1136-1323``) consumes the
per-step series the env accumulated while stepping. Here, for
kernel-eligible configurations (battery+PV 2022, thermal 2021,
LSTM-dynamics 2023 and EV/charger/washing-machine plus_evs families)
under an *open-loop* policy (hour-indexed RBC tables or arbitrary
per-target per-step plans), the episode runs as ONE Pallas kernel
launch with per-step series recording (``ops/pallas_{battery,thermal,
lstm,ev}`` with ``record=True``); every other KPI input for those
configurations is
data-driven, so the recorded (net, balances, SOCs, outputs) streams are
sufficient to assemble the exact ``collected`` dict of
:func:`citylearn_tpu.core.evaluate.collect_episode` and reuse
:func:`citylearn_tpu.core.evaluate.kpi_table` unchanged — the full
normalized building + district KPI table at kernel speed.

Dispatch surfaces:
- :func:`citylearn_tpu.core.evaluate.evaluate_districts` routes here when
  handed a :class:`ScriptedPolicy` on an eligible config;
- ``BatchedSAC.evaluate(policy=ScriptedPolicy(...))``;
- ``citylearn-tpu simulate <schema> evaluate --fast`` for hour-RBC agents.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from citylearn_tpu.core import hvac
from citylearn_tpu.core import rollout_fast
from citylearn_tpu.core.rollout import ACTION_KEYS
from citylearn_tpu.core.types import DistrictParams, StaticConfig

#: action names a scripted plan may script, per kernel family
BATTERY_KEYS = ("electrical_storage",)
THERMAL_KEYS = ("cooling_storage", "dhw_storage", "electrical_storage")
#: non-building-axis action classes (per-charger / per-machine plans)
EXTRA_KEYS = ("electric_vehicle_storage", "washing_machine")


class ScriptedPolicy:
    """An open-loop action plan: ``{action_name: (24,) hour table | (S,)
    per-step series | (S, n) per-target plan}`` (targets: buildings;
    chargers for ``electric_vehicle_storage``; machines for
    ``washing_machine``).

    A length-24 leading axis is by default interpreted as an hour-indexed
    table (reference HourRBC semantics). For a 24-STEP per-step plan
    pass ``hour_tables=False``; with the default (auto) a 24-leading
    plan on a 24-step episode resolves as an hour table WITH a warning
    — pass ``hour_tables=True`` to silence it, ``False`` to flip it.

    Scripted policies are state-independent, which is what lets the
    whole-episode kernels serve them; they also act as ordinary
    in-graph policies on the XLA scan path via :meth:`as_policy_fn`
    (the fallback for non-eligible configurations)."""

    def __init__(self, plans: Dict[str, np.ndarray],
                 hour_tables: Optional[bool] = None):
        unknown = set(plans) - set(ACTION_KEYS) - set(EXTRA_KEYS)
        if unknown:
            raise ValueError(f"unknown action names: {sorted(unknown)}")
        self.plans = {k: np.asarray(v, np.float32) for k, v in plans.items()}
        self.hour_tables = hour_tables

    def _is_hour_table(self, v: np.ndarray, n: int, n_steps: int) -> bool:
        shaped = (v.ndim == 1 and v.shape[0] == 24) or \
            (v.ndim == 2 and v.shape[0] == 24 and v.shape[1] == n)
        if not shaped or self.hour_tables is False:
            return False
        if self.hour_tables is None and n_steps == 24:
            import warnings

            warnings.warn(
                "a 24-leading action plan on a 24-step episode is "
                "ambiguous; resolving as an HOUR-INDEXED table — pass "
                "ScriptedPolicy(..., hour_tables=False) for a per-step "
                "plan (or True to silence this warning)", stacklevel=3)
        return True

    @classmethod
    def from_hour_rbc(cls, agent, n_buildings: int,
                      spec=None) -> "ScriptedPolicy":
        """Build (24, n) plans from an :class:`citylearn_tpu.agents.rbc.HourRBC`
        agent's resolved per-building hour maps (reference
        ``agents/rbc.py:80-136``). A central agent carries ONE name-keyed
        map shared by every building. Pass the compiled ``spec`` to route
        per-charger (``electric_vehicle_storage_<id>``) and
        washing-machine hour maps onto their district-wide plan axes."""
        plans: Dict[str, np.ndarray] = {}
        maps = agent.action_map
        if len(maps) == 1 and n_buildings > 1:
            maps = maps * n_buildings           # central: shared hour map
        ch_slot, wm_slot, n_ch, n_wm = {}, {}, 0, 0
        if spec is not None:
            for b in spec.buildings:
                for ch in b.chargers:
                    ch_slot[f"electric_vehicle_storage_{ch.charger_id}"] = n_ch
                    n_ch += 1
                for wm in b.washing_machines:
                    wm_slot[wm.name] = n_wm
                    n_wm += 1

        def col_of(table):
            return np.asarray([table[h] for h in range(1, 25)], np.float32)

        for b, m in enumerate(maps):
            for name, table in m.items():
                if table is None:
                    continue
                if name in ACTION_KEYS:
                    plan = plans.setdefault(
                        name, np.zeros((24, n_buildings), np.float32))
                    plan[:, b] = col_of(table)
                elif name in ch_slot:
                    plan = plans.setdefault(
                        "electric_vehicle_storage",
                        np.zeros((24, n_ch), np.float32))
                    plan[:, ch_slot[name]] = col_of(table)
                elif name in wm_slot:
                    plan = plans.setdefault(
                        "washing_machine", np.zeros((24, n_wm), np.float32))
                    plan[:, wm_slot[name]] = col_of(table)
        return cls(plans)

    def expanded(self, cfg: StaticConfig, params: DistrictParams,
                 n_steps: int, data_offset: int = 0) -> Dict[str, np.ndarray]:
        """Normalize every plan to (S, n) over its target axis —
        buildings for building-level actions, chargers for
        ``electric_vehicle_storage``, machines for ``washing_machine``.
        Hour tables resolve against the episode window's hours
        (``data_offset``); explicit plans are episode-relative."""
        hours = np.asarray(params.series.hour)[data_offset:data_offset
                                               + n_steps, 0]
        out = {}
        for k, v in self.plans.items():
            n = {"electric_vehicle_storage": max(cfg.n_chargers, 1),
                 "washing_machine": max(cfg.n_washing_machines, 1),
                 }.get(k, cfg.n_buildings)
            if self._is_hour_table(v, n, n_steps):
                out[k] = (v[hours - 1] if v.ndim == 2
                          else np.broadcast_to(v[hours - 1][:, None],
                                               (n_steps, n)).copy())
            else:
                assert v.shape[0] >= n_steps, \
                    f"per-step plan for {k} too short: {v.shape}"
                plan = v[:n_steps]
                if plan.ndim == 1:
                    plan = np.broadcast_to(plan[:, None], (n_steps, n)).copy()
                out[k] = plan
        return out

    def as_policy_fn(self, cfg: StaticConfig, params: DistrictParams,
                     n_steps: int) -> Callable:
        """In-graph policy for the XLA scan fallback. Hour tables are
        expanded over the FULL simulation range and indexed by the
        sim-range step (so shifted episode windows keep the right hours);
        explicit (S,)/(S, B) plans are episode-relative and index by the
        episode step."""
        hours_full = np.asarray(params.series.hour)[:, 0]
        B = cfg.n_buildings
        widths = {"electric_vehicle_storage": max(cfg.n_chargers, 1),
                  "washing_machine": max(cfg.n_washing_machines, 1)}
        by_tau, by_t = {}, {}
        for k, v in self.plans.items():
            n = widths.get(k, B)
            if self._is_hour_table(v, n, n_steps):
                if v.ndim == 1:
                    by_tau[k] = jnp.asarray(
                        np.broadcast_to(v[hours_full - 1][:, None],
                                        (hours_full.shape[0], n)).copy())
                else:
                    by_tau[k] = jnp.asarray(v[hours_full - 1])
            else:
                plan = np.asarray(v, np.float32)[:n_steps]
                if plan.ndim == 1:
                    plan = np.broadcast_to(plan[:, None],
                                           (n_steps, n)).copy()
                by_t[k] = jnp.asarray(plan)
        zero = jnp.zeros((B,), jnp.float32)
        keys = list(ACTION_KEYS)
        if cfg.has_evs:
            keys.append("electric_vehicle_storage")
        if cfg.has_washing_machines:
            keys.append("washing_machine")

        def policy(params, st):
            out = {}
            for k in keys:
                if k in by_tau:
                    out[k] = jnp.take(by_tau[k], st.data_offset + st.t, axis=0)
                elif k in by_t:
                    out[k] = jnp.take(by_t[k], st.t, axis=0)
                elif k in widths:
                    out[k] = jnp.zeros((widths[k],), jnp.float32)
                else:
                    out[k] = zero
            return out
        return policy


def kernel_family(cfg: StaticConfig) -> Optional[str]:
    """Which whole-episode kernel serves this configuration, if any."""
    if rollout_fast.eligible(cfg):
        return "battery"
    if rollout_fast.eligible_thermal(cfg):
        return "thermal"
    if rollout_fast.eligible_lstm(cfg):
        return "lstm"
    if rollout_fast.eligible_ev(cfg):
        return "ev"
    if rollout_fast.eligible_neighborhood(cfg):
        return "neighborhood"
    return None


def _with_t0_double(bal: jnp.ndarray) -> jnp.ndarray:
    """Battery electricity-consumption series: the t == 0 row double-counts
    the balance (``building.py:2643-2652``; core/step.py bat_total)."""
    return jnp.concatenate([bal[:1] * 2.0, bal[1:]], axis=0)


def _assembler(cfg: StaticConfig, family: str, S: int,
               baseline_condition: str) -> Callable:
    """Jitted (params, rec, start_tau) -> KPI dict for one district,
    reusing :func:`citylearn_tpu.core.evaluate.kpi_table` on a
    ``collected`` dict rebuilt from the kernel's recorded streams + the
    data series of the episode window ``[start_tau, start_tau + S)``."""
    from citylearn_tpu.core.evaluate import kpi_table

    def run(params: DistrictParams, rec: jnp.ndarray, start_tau):
        ser = params.series
        w = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start_tau, S,
                                                     axis=0)
        if family == "battery":
            net, bbal, _soc = rec[0], rec[1], rec[2]
            storage = _with_t0_double(bbal)
            served = w(ser.non_shiftable_load)
            cool_met = jnp.zeros_like(net)
            cool_bal = jnp.zeros_like(net)
            dhw_met = jnp.zeros_like(net)
            dhw_bal = jnp.zeros_like(net)
        elif family == "ev":
            from citylearn_tpu.ops.pallas_ev import R_BBAL, R_CHC, R_NET
            net = rec[R_NET]
            # without_storage subtracts charger consumption too
            # (building.py:360-366); washing machines are NOT storage
            storage = _with_t0_double(rec[R_BBAL]) + rec[R_CHC]
            served = w(ser.non_shiftable_load)
            cool_met = jnp.zeros_like(net)
            cool_bal = jnp.zeros_like(net)
            dhw_met = jnp.zeros_like(net)
            dhw_bal = jnp.zeros_like(net)
        elif family == "lstm":
            from citylearn_tpu.ops.pallas_lstm import (
                R_BBAL, R_CBAL, R_CDEM, R_COUT, R_DBAL, R_DOUT, R_NET,
                R_NSLMET, R_TEMP)
            net = rec[R_NET]
            outdoor = w(ser.outdoor_dry_bulb_temperature)
            cool_cons = hvac.input_power(params.cooling_device, rec[R_CBAL],
                                         outdoor, False)
            dhw_cons = hvac.input_power(params.dhw_device, rec[R_DBAL],
                                        outdoor, True)
            storage = (cool_cons + dhw_cons + _with_t0_double(rec[R_BBAL]))
            served = (rec[R_COUT] + jnp.clip(-rec[R_CBAL], 0.0, None)
                      + rec[R_DOUT] + jnp.clip(-rec[R_DBAL], 0.0, None)
                      + rec[R_NSLMET])
            pricing = w(ser.electricity_pricing)
            carbon = w(ser.carbon_intensity)
            collected = dict(
                net=net,
                cost=net * pricing,
                emission=jnp.clip(net * carbon, 0.0, None),
                storage=storage,
                solar=-w(ser.solar_generation),
                pricing=pricing,
                carbon=carbon,
                indoor_t=rec[R_TEMP],
                cooling_sp=w(ser.indoor_dry_bulb_temperature_cooling_set_point),
                heating_sp=w(ser.indoor_dry_bulb_temperature_heating_set_point),
                cooling_demand_actual=rec[R_CDEM],
                heating_demand_actual=w(ser.heating_demand),
                served=served,
            )
            return kpi_table(cfg, params, collected, start_tau,
                             baseline_condition)
        else:
            from citylearn_tpu.ops.pallas_thermal import (
                R_BBAL, R_CBAL, R_COUT, R_DBAL, R_DOUT, R_NET)
            net = rec[R_NET]
            outdoor = w(ser.outdoor_dry_bulb_temperature)
            cool_cons = hvac.input_power(params.cooling_device, rec[R_CBAL],
                                         outdoor, False)
            dhw_cons = hvac.input_power(params.dhw_device, rec[R_DBAL],
                                        outdoor, True)
            storage = (cool_cons + dhw_cons + _with_t0_double(rec[R_BBAL]))
            cool_met, cool_bal = rec[R_COUT], rec[R_CBAL]
            dhw_met, dhw_bal = rec[R_DOUT], rec[R_DBAL]
            served = (cool_met + jnp.clip(-cool_bal, 0.0, None)
                      + dhw_met + jnp.clip(-dhw_bal, 0.0, None)
                      + w(ser.non_shiftable_load))
        pricing = w(ser.electricity_pricing)
        carbon = w(ser.carbon_intensity)
        collected = dict(
            net=net,
            cost=net * pricing,
            emission=jnp.clip(net * carbon, 0.0, None),
            storage=storage,
            solar=-w(ser.solar_generation),
            pricing=pricing,
            carbon=carbon,
            indoor_t=w(ser.indoor_dry_bulb_temperature),
            cooling_sp=w(ser.indoor_dry_bulb_temperature_cooling_set_point),
            heating_sp=w(ser.indoor_dry_bulb_temperature_heating_set_point),
            cooling_demand_actual=w(ser.cooling_demand),
            heating_demand_actual=w(ser.heating_demand),
            served=served,
        )
        return kpi_table(cfg, params, collected, start_tau,
                         baseline_condition)

    return jax.jit(run)


def _assembler_neighborhood(cfg: StaticConfig, S: int,
                            baseline_condition: str) -> Callable:
    """Neighborhood-family KPI assembly: the kernel records the physics
    series; the temperature/setpoint series and final occupant state come
    from the single-district post-pass
    (:func:`citylearn_tpu.core.neighborhood_eval.temp_setpoint_series`)."""
    from citylearn_tpu.core.evaluate import kpi_table
    from citylearn_tpu.ops.pallas_neighborhood import (
        R_BBAL, R_CDEM, R_COUT, R_DOUT, R_HDEM, R_HOUT, R_NET)

    def run(params: DistrictParams, rec: jnp.ndarray, start_tau,
            temp, csp, hsp, final_state):
        ser = params.series
        w = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start_tau, S,
                                                     axis=0)
        net = rec[R_NET]
        # all tanks are inert on this family (neighborhood_packable) —
        # storage consumption is the battery alone (building.py:345-366)
        storage = _with_t0_double(rec[R_BBAL])
        served = (rec[R_COUT] + rec[R_HOUT] + rec[R_DOUT]
                  + w(ser.non_shiftable_load))
        pricing = w(ser.electricity_pricing)
        carbon = w(ser.carbon_intensity)
        collected = dict(
            net=net,
            cost=net * pricing,
            emission=jnp.clip(net * carbon, 0.0, None),
            storage=storage,
            solar=-w(ser.solar_generation),
            pricing=pricing,
            carbon=carbon,
            indoor_t=temp,
            cooling_sp=csp,
            heating_sp=hsp,
            cooling_demand_actual=rec[R_CDEM],
            heating_demand_actual=rec[R_HDEM],
            served=served,
        )
        return kpi_table(cfg, params, collected, start_tau,
                         baseline_condition, final_state=final_state)

    return jax.jit(run)


_ASSEMBLER_CACHE: Dict[Tuple, Callable] = {}


def evaluate_scripted(cfg: StaticConfig, params: DistrictParams,
                      policy: ScriptedPolicy, n_steps: int = None,
                      baseline_condition: str = "_without_storage",
                      n_districts: int = None, interpret: bool = False,
                      return_series: bool = False, data_offset: int = 0,
                      mesh=None):
    """Full normalized KPI table for ONE district under an open-loop
    policy, computed on a whole-episode Pallas kernel.

    Requires a kernel-eligible configuration (``kernel_family(cfg)``).
    Returns the same ``building|<kpi>`` -> (B,) / ``district|<kpi>`` ->
    scalar dict as :func:`citylearn_tpu.core.evaluate.kpi_table`; with
    ``return_series=True`` also returns the raw recorded (N_REC, S, B)
    per-step stream (see the kernel modules' row constants).

    ``data_offset`` evaluates a shifted episode window [off, off + S) —
    the reference's rolling/random splits (``base.py:76-129``): driver
    series, hour tables and the KPI window all follow the offset.
    Stochastic-outage signals are baked for the default window only
    (core/params.py) — rebake via
    :func:`citylearn_tpu.core.params.rebake_outage` for other windows.

    ``mesh`` (1-D ``dp`` :class:`jax.sharding.Mesh`) shards the district
    batch over devices: one collective-free kernel launch per device
    (``rollout_fast._shard_launch``); the KPI assembly runs once from
    shard 0's recorded stream."""
    family = kernel_family(cfg)
    if family is None:
        raise ValueError("configuration is not kernel-eligible; use "
                         "evaluate_districts (XLA scan) instead")
    off = int(data_offset)
    if off and cfg.has_stochastic_outage:
        raise ValueError(
            "shifted windows on a stochastic-outage dataset need the "
            "signal rebaked for that window: params = "
            "rebake_outage(spec, cfg, params, data_offset)  "
            "(core/params.py) — or pass the rebaked params here")
    # Pallas TPU kernels have no compiled CPU lowering — run the
    # interpreter there (tests / CPU-only hosts) and compile on TPU
    interpret = interpret or jax.default_backend() == "cpu"
    S = (cfg.time_steps - 1) if n_steps is None else int(n_steps)
    plans = policy.expanded(cfg, params, S, data_offset=off)
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    if family == "battery":
        D = n_districts or rollout_fast.TILE_D * n_shards
        out = rollout_fast.run_battery_episode(
            cfg, params, D, plans.get("electrical_storage",
                                      np.zeros((S, cfg.n_buildings),
                                               np.float32)),
            n_steps=S, interpret=interpret, record_series=True,
            data_offset=off, mesh=mesh)
        rec = out[-1]
    elif family == "lstm":
        if not rollout_fast.lstm_packable(cfg, params):
            raise ValueError("LSTM configuration not kernel-packable; use "
                             "evaluate_districts (XLA scan) instead")
        from citylearn_tpu.ops.pallas_lstm import TILE_D as TILE_D_L
        D = n_districts or TILE_D_L * n_shards
        out = rollout_fast.run_lstm_episode(
            cfg, params, D, plans, n_steps=S, interpret=interpret,
            record_series=True, data_offset=off, mesh=mesh)
        rec = out[-1]
    elif family == "ev":
        from citylearn_tpu.ops.pallas_ev import TILE_D as TILE_D_E
        D = n_districts or TILE_D_E * n_shards
        out = rollout_fast.run_ev_episode(
            cfg, params, D, plans, n_steps=S, interpret=interpret,
            record_series=True, data_offset=off, mesh=mesh)
        rec = out[-1]
    elif family == "neighborhood":
        if not rollout_fast.neighborhood_packable(cfg, params):
            raise ValueError("configuration not neighborhood-packable; "
                             "use evaluate_districts (XLA scan) instead")
        from citylearn_tpu.core.neighborhood_eval import temp_setpoint_series
        from citylearn_tpu.ops.pallas_neighborhood import (
            R_COUT as N_RCOUT,
            R_HOUT as N_RHOUT,
            TILE_D as TILE_D_N,
        )
        D = n_districts or TILE_D_N * n_shards
        out = rollout_fast.run_neighborhood_episode(
            cfg, params, D, plans, n_steps=S, interpret=interpret,
            record_series=True, data_offset=off, mesh=mesh)
        rec = out[-1]
        # single-district temperature/occupant post-pass: tanks are inert
        # so the demand observations are the device outputs alone
        temp, csp, hsp, final_state = temp_setpoint_series(
            cfg, params, rec[N_RCOUT], rec[N_RHOUT], S, data_offset=off)
        key = (cfg, family, S, baseline_condition)
        if key not in _ASSEMBLER_CACHE:
            _ASSEMBLER_CACHE[key] = _assembler_neighborhood(
                cfg, S, baseline_condition)
        table = _ASSEMBLER_CACHE[key](params, rec, jnp.int32(off),
                                      temp, csp, hsp, final_state)
        if return_series:
            return table, rec
        return table
    else:
        from citylearn_tpu.ops.pallas_thermal import TILE_D as TILE_D_TH
        D = n_districts or TILE_D_TH * n_shards
        out = rollout_fast.run_thermal_episode(
            cfg, params, D, plans, n_steps=S, interpret=interpret,
            record_series=True, data_offset=off, mesh=mesh)
        rec = out[-1]

    key = (cfg, family, S, baseline_condition)
    if key not in _ASSEMBLER_CACHE:
        _ASSEMBLER_CACHE[key] = _assembler(cfg, family, S, baseline_condition)
    table = _ASSEMBLER_CACHE[key](params, rec, jnp.int32(off))
    if return_series:
        return table, rec
    return table
