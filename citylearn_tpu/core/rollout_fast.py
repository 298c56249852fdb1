"""Fast-path episode dispatcher: route eligible configurations to the
whole-episode Pallas kernels — ``ops/pallas_battery`` (battery+PV 2022
family), ``ops/pallas_thermal`` (thermal 2021 family), ``ops/pallas_lstm``
(LSTM-dynamics 2023 family), ``ops/pallas_ev`` (EV/charger/washing-machine
plus_evs family), ``ops/pallas_neighborhood`` (EULP county neighborhoods
+ quebec occupant family) — together covering all 25 bundled datasets —
falling back to the general XLA scan otherwise. All kernels take
per-target (T, lane) open-loop action streams, support per-step series
recording for the kernel-backed KPI evaluation
(:mod:`citylearn_tpu.core.evaluate_fast`), shifted episode windows
(``data_offset``) and dp-mesh sharding (``mesh`` via
:func:`_shard_launch`)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from citylearn_tpu.core.types import DistrictParams, StaticConfig
from citylearn_tpu.ops.pallas_battery import T_CHUNK, TILE_D, battery_episode

B_PAD = 128   # TPU lane tiling: the building axis pads to one lane tile

_REWARD_OK = ("RewardFunction", "IndependentSACReward")
# IndependentSACReward min(-net, 0) == -max(net, 0) == the default reward
# at exponent 1 (reward_function.py:65-88,159-168)


def eligible(cfg: StaticConfig) -> bool:
    """Battery+PV-only districts with no outage/dynamics/EV/WM and the
    default exponent-1 reward — the vectorized-training workhorse
    configuration (2022 challenge family)."""
    return (not cfg.any_cooling and not cfg.any_heating and not cfg.any_dhw
            and not cfg.has_dynamics and not cfg.has_evs
            and not cfg.has_washing_machines and not cfg.any_outage
            and cfg.reward_type == "RewardFunction"
            and cfg.reward_exponent == 1.0)


def eligible_thermal(cfg: StaticConfig) -> bool:
    """Cooling/DHW + battery districts (the 2021 challenge family):
    thermal tanks and heat-pump/heater devices fused whole-episode; no
    heating end-use, outage, dynamics, EVs, WMs or occupants.

    central_agent is allowed (VERDICT r4 #5): central agency only changes
    reward AGGREGATION and observation layout, never the physics or the
    KPI series the kernel records — exactly the LSTM gate's reasoning.
    The kernel's reward_sum output stays per-building; the central
    default reward (``-max(district_net, 0)``, reference
    ``reward_function.py:77-80``) is NOT its sum, so consumers needing
    the central reward use the scan path — kernel-backed *evaluation*
    (the product surface) never reads rewards."""
    return ((cfg.any_cooling or cfg.any_dhw) and not cfg.any_heating
            and not cfg.has_dynamics and not cfg.has_evs
            and not cfg.has_washing_machines and not cfg.any_outage
            and not cfg.has_occupant
            and cfg.reward_per_building is None
            and cfg.reward_type in _REWARD_OK
            and cfg.reward_exponent == 1.0)


#: When set to a list, every ``_shard_launch`` also lowers+compiles its
#: shard-mapped module and appends the HLO text — used by the
#: ``dryrun_multichip`` structural gate to assert the sharded kernel
#: surfaces stay collective-free.
HLO_CAPTURE = None

#: shard-mapped launch callables, keyed by (mesh devices, caller key):
#: rebuilding shard_map around a fresh closure every call would miss the
#: jit trace cache and re-lower (a ~10 s Mosaic recompile per call,
#: observed as a 14x eval_fast_sharded slowdown)
_SHARD_CACHE = {}


def _shard_launch(mesh, fn, shared, state_args, n_state_outs: int,
                  record: bool, n_rec: int, cache_key=None):
    """Run a whole-episode kernel launch under the ``dp`` district mesh
    via ``shard_map`` — share-nothing data parallelism over district
    tiles (SURVEY §5.8): every shard runs its own kernel launch on its
    local districts; driver series/params replicate; the compiled module
    is collective-free (asserted by ``__graft_entry__.dryrun_multichip``
    gate 5).

    ``fn(shared, state_args)`` -> tuple of (D, ...) state outputs (+ the
    (n_rec, T, B) record stream when ``record``). Each shard records its
    own district-tile 0; shards' records stack on axis 0 and shard 0's
    is returned (identical-district launches record identical streams).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:                         # older jax spelling
        from jax.experimental.shard_map import shard_map
    out_specs = tuple([P("dp")] * n_state_outs
                      + ([P("dp")] if record else []))
    full_key = None if cache_key is None else (
        tuple(mesh.devices.ravel().tolist()), cache_key)
    smapped = _SHARD_CACHE.get(full_key) if full_key is not None else None
    if smapped is None:
        # check_vma off: the pallas_call's ShapeDtypeStruct outputs carry
        # no varying-mesh-axes annotation; the launch is share-nothing by
        # construction (asserted collective-free by dryrun gate 5)
        smapped = jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(), P("dp")),
                                    out_specs=out_specs, check_vma=False))
        if full_key is not None:
            _SHARD_CACHE[full_key] = smapped
    if HLO_CAPTURE is not None:
        HLO_CAPTURE.append(smapped
                           .lower(shared, state_args).compile().as_text())
    out = smapped(shared, state_args)
    if record:
        out = tuple(out[:-1]) + (out[-1][:n_rec],)
    return out


def _pad_time(arr: np.ndarray, t_pad: int, off: int = 0) -> np.ndarray:
    """Pad the episode window ``[off, off + t_pad)`` of a sim-range
    series to the kernel's chunked length (zeros past the range)."""
    out = np.zeros((t_pad,) + arr.shape[1:], arr.dtype)
    win = arr[off:off + t_pad]
    out[:win.shape[0]] = win
    return out


def expand_action_plan(arr, hours: np.ndarray, S: int, B: int) -> np.ndarray:
    """Normalize an action input to an (S, B) open-loop plan: a (24,)
    hour-indexed table broadcasts over buildings, an (S,) series
    broadcasts over buildings, an (S, B) plan passes through."""
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1 and arr.shape[0] == 24:
        arr = arr[hours - 1]
    if arr.ndim == 1:
        assert arr.shape[0] >= S, f"per-step plan too short: {arr.shape}"
        arr = np.broadcast_to(arr[:S, None], (S, B))
    assert arr.shape[0] >= S and arr.shape[1] == B, f"bad plan shape {arr.shape}"
    return arr[:S]


def run_battery_episode(cfg: StaticConfig, params: DistrictParams,
                        n_districts: int, action_table: np.ndarray,
                        n_steps: Optional[int] = None,
                        interpret: bool = False,
                        record_series: bool = False,
                        data_offset: int = 0,
                        mesh=None):
    """Whole-episode rollout for ``n_districts`` identical district copies
    under an open-loop action plan ((24,) hour table, (S,) series or
    (S, B) per-building plan). Returns per-district per-building
    reward/cost/emission sums and final battery state; with
    ``record_series=True`` an extra (3, S, B) per-step stream of district
    0's (net, raw battery balance, soc) is appended.

    ``data_offset`` selects a shifted episode window [off, off + S) of
    the sim range (the reference's rolling/random ``EpisodeTracker``
    splits, ``base.py:76-129``): driver series and hour tables follow the
    window; explicit per-step plans stay episode-relative.

    ``mesh`` (a 1-D ``dp`` :class:`jax.sharding.Mesh`) shards the
    ``n_districts`` batch over devices via ``shard_map`` — one
    collective-free kernel launch per device (see :func:`_shard_launch`)."""
    assert eligible(cfg), "configuration not eligible for the battery fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    assert n_districts % (TILE_D * n_shards) == 0, \
        f"n_districts must be a multiple of {TILE_D} x {n_shards} shards"
    off = int(data_offset)

    B = params.battery.capacity.shape[0]
    assert B <= B_PAD, f"at most {B_PAD} buildings on the fast path"

    def pad_b(arr):
        arr = np.asarray(arr, np.float32)
        out = np.zeros(arr.shape[:-1] + (B_PAD,), np.float32)
        out[..., :B] = arr
        return out

    series_np = [pad_b(x) for x in (
        params.series.non_shiftable_load, params.series.solar_generation,
        params.series.electricity_pricing, params.series.carbon_intensity)]
    t_pad = ((S + T_CHUNK - 1) // T_CHUNK) * T_CHUNK
    series = tuple(jnp.asarray(_pad_time(x, t_pad, off)) for x in series_np)

    hours = np.asarray(params.series.hour)[off:off + S, 0]
    actions = np.zeros((t_pad, B_PAD), np.float32)
    actions[:S, :B] = expand_action_plan(action_table, hours, S, B)

    bat = params.battery
    bparams = jnp.asarray(np.stack([pad_b(x) for x in (
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        np.zeros(B), np.zeros(B))]))

    def pad_curve_rows(x, identity):
        # knot-major (P, B): each knot is a contiguous lane row in VMEM
        # (see ops/pallas_battery._interp)
        arr = np.asarray(x, np.float32)
        out = np.tile(identity[None, :].astype(np.float32), (B_PAD, 1))
        out[:B] = arr
        return jnp.asarray(out.T.copy())

    P = bat.power_efficiency_curve_x.shape[1]
    # 2-knot identity for padded building columns (then pad-repeated like
    # compiler/seeding.pad_curve) so it never inflates the trimmed count
    ident_x = np.concatenate([[0.0], np.ones(P - 1)])
    curves = (pad_curve_rows(bat.power_efficiency_curve_x, ident_x),
              pad_curve_rows(bat.power_efficiency_curve_y, np.ones(P)),
              pad_curve_rows(bat.capacity_power_curve_x, ident_x),
              pad_curve_rows(bat.capacity_power_curve_y, np.ones(P)))
    # trim trailing pad-repeated knots (compiler/seeding.pad_curve repeats
    # the last knot): the kernel's unrolled select chains scale with
    # n_knots, so fewer knots = much faster Mosaic compile. Repeated tail
    # knots never win the reference's strict `x < q` count, so trimming is
    # semantics-preserving.
    n_knots = 2
    for cx in (curves[0], curves[2]):
        x = np.asarray(cx)                      # (P, B) knot-major
        diffs = np.any(x[1:] != x[:-1], axis=1)  # knot k+1 differs from k
        if diffs.any():
            n_knots = max(n_knots, int(np.max(np.nonzero(diffs)[0])) + 2)
    curves = tuple(c[:n_knots] for c in curves)

    D = n_districts
    tile = lambda v: jnp.asarray(
        np.broadcast_to(pad_b(np.asarray(v))[None, :], (D, B_PAD)).copy())
    shared = (jnp.asarray(actions), series, bparams, curves)
    state_args = (tile(bat.initial_soc), tile(bat.efficiency),
                  tile(bat.capacity))

    def launch(shared, state):
        acts, ser, bp, cv = shared
        return battery_episode(
            acts, ser, bp, cv, *state,
            n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
            ratio=cfg.time_step_ratio, n_knots=n_knots,
            record=record_series, interpret=interpret)

    if mesh is None:
        out = launch(shared, state_args)
    else:
        out = _shard_launch(
            mesh, launch, shared, state_args, 6, record_series, 3,
            cache_key=("battery", cfg, S, n_knots, record_series, interpret))
    sliced = tuple(o[:, :B] for o in out[:6])
    if record_series:
        sliced = sliced + (out[6][:, :S, :B],)
    return sliced


def _pad_b(arr, fill=0.0):
    arr = np.asarray(arr, np.float32)
    out = np.full(arr.shape[:-1] + (B_PAD,), fill, np.float32)
    out[..., : arr.shape[-1]] = arr
    return out


def _pad_curves_rows(xs, ys, n: int, knots: Optional[int] = None):
    """(N, P) knot curves -> knot-major (P, 128) with identity pad columns
    and the trailing repeated knots trimmed (see run_battery_episode).
    Pass ``knots`` to force a shared trim across curve pairs."""
    P = np.asarray(xs).shape[1]
    ident_x = np.concatenate([[0.0], np.ones(P - 1)])
    out_x = np.tile(ident_x[None, :].astype(np.float32), (B_PAD, 1))
    out_y = np.ones((B_PAD, P), np.float32)
    out_x[:n] = np.asarray(xs, np.float32)
    out_y[:n] = np.asarray(ys, np.float32)
    cx, cy = out_x.T.copy(), out_y.T.copy()
    if knots is None:
        knots = 2
        diffs = np.any(cx[1:] != cx[:-1], axis=1)
        if diffs.any():
            knots = max(knots, int(np.max(np.nonzero(diffs)[0])) + 2)
    return jnp.asarray(cx[:knots]), jnp.asarray(cy[:knots]), knots


def eligible_ev(cfg: StaticConfig) -> bool:
    """Battery+PV buildings with EV chargers and washing machines (the
    ``..._plus_evs`` and charging-constraints configurations): no thermal
    end-uses, outage, dynamics or occupants. Charging constraints are
    action-only math, precomputed host-side by the dispatcher
    (scaled per-charger plans + violation streams).

    central_agent is allowed — same reasoning as
    :func:`eligible_thermal`: only reward aggregation and observation
    layout change, not physics; kernel reward_sum stays per-building."""
    return (cfg.has_evs and not cfg.any_cooling and not cfg.any_heating
            and not cfg.any_dhw and not cfg.has_dynamics
            and not cfg.any_outage and not cfg.has_occupant
            and cfg.reward_per_building is None
            and (cfg.reward_type == "Electric_Vehicles_Reward_Function"
                 or (cfg.reward_type in _REWARD_OK
                     and cfg.reward_exponent == 1.0)))


def apply_charging_constraints_np(cfg: StaticConfig, params: DistrictParams,
                                  a: np.ndarray):
    """Numpy replication of the building/phase charging-constraint
    scaling (reference ``building.py:901-989``; core/step.py:351-388) for
    an (S, C) open-loop charger plan — constraints depend only on the
    ACTIONS and static limits, so the kernel path precomputes the scaled
    plan and the per-building violation kWh stream host-side."""
    ch = params.chargers
    B = cfg.n_buildings
    S, C = a.shape
    maxc = np.asarray(ch.max_charging_power)
    bld = np.asarray(ch.building_index)
    blim = np.asarray(ch.cc_building_limit)
    pidx = np.asarray(ch.cc_phase_index)
    plim = np.asarray(ch.cc_phase_limit)
    pbld = np.asarray(ch.cc_phase_building)
    P = cfg.n_charging_phases
    hours_ratio = cfg.seconds_per_time_step / 3600.0

    pos = (a > 0.0) & (maxc > 0.0)[None, :]
    req = np.where(pos, a * maxc[None, :], 0.0)
    tot_b = np.zeros((S, B))
    np.add.at(tot_b, (slice(None), bld), 0)  # shape only
    for c in range(C):
        tot_b[:, bld[c]] += req[:, c]
    over_b = np.isfinite(blim)[None, :] & (tot_b > blim[None, :])
    scale_b = np.where(over_b,
                       np.where(blim[None, :] == 0.0, 0.0,
                                blim[None, :] / np.maximum(tot_b, 1e-12)), 1.0)
    viol_b = np.where(over_b, tot_b - blim[None, :], 0.0)
    scaled1 = req * scale_b[:, bld]
    tot_p = np.zeros((S, P))
    for c in range(C):
        if pidx[c] >= 0:
            tot_p[:, pidx[c]] += scaled1[:, c]
    over_p = np.isfinite(plim)[None, :] & (tot_p > plim[None, :])
    scale_p = np.where(over_p,
                       np.where(plim[None, :] == 0.0, 0.0,
                                plim[None, :] / np.maximum(tot_p, 1e-12)), 1.0)
    viol_p = np.where(over_p, tot_p - plim[None, :], 0.0)
    for pi in range(P):
        viol_b[:, pbld[pi]] += viol_p[:, pi]
    scale_p_full = np.concatenate([scale_p, np.ones((S, 1))], axis=1)
    pidx_full = np.where(pidx >= 0, pidx, P)
    target = scaled1 * scale_p_full[:, pidx_full]
    a_out = np.where(
        pos, np.maximum(0.0, np.minimum(a, target / np.maximum(
            maxc[None, :], 1e-12))),
        np.where((a > 0.0) & (maxc <= 0.0)[None, :], 0.0, a))
    return a_out.astype(np.float32), (viol_b * hours_ratio).astype(np.float32)


def run_ev_episode(cfg: StaticConfig, params: DistrictParams,
                   n_districts: int, action_tables: dict,
                   n_steps: Optional[int] = None,
                   interpret: bool = False,
                   record_series: bool = False,
                   data_offset: int = 0,
                   mesh=None):
    """Whole-episode rollout on the EV kernel
    (:func:`citylearn_tpu.ops.pallas_ev.ev_episode`) for ``n_districts``
    identical district copies; ``action_tables``: open-loop plans per
    action class — ``electrical_storage`` ((24,) | (S,) | (S, B) over
    buildings), ``electric_vehicle_storage`` (... over the C chargers),
    ``washing_machine`` (... over the W machines); missing keys act 0.

    Returns (reward_sum, cost_sum, emission_sum, battery_soc, battery_eff,
    battery_degraded, ev_soc, ev_eff, ev_degraded, wm_initiated) — the
    first six (D, B), the EV triple (D, V), wm (D, W); with
    ``record_series=True`` an (N_EREC, S, B) per-step stream of district
    0 is appended (net, raw battery balance/soc, charger and washing-
    machine consumptions, reward)."""
    from citylearn_tpu.ops.pallas_ev import (
        LANES,
        N_CROWS,
        N_EVROWS,
        T_CHUNK as T_CHUNK_EV,
        TILE_D as TILE_D_EV,
        ev_episode,
    )

    assert eligible_ev(cfg), "configuration not eligible for the EV fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    assert n_districts % (TILE_D_EV * n_shards) == 0
    off = int(data_offset)
    B = params.battery.capacity.shape[0]
    C, V, W = cfg.n_chargers, cfg.n_evs, cfg.n_washing_machines
    assert max(B, C, V, W) <= LANES

    ser = params.series
    ch = params.chargers
    evp = params.evs
    t_pad = ((S + T_CHUNK_EV - 1) // T_CHUNK_EV) * T_CHUNK_EV

    def stream(arr, fill=0.0, win_off=0):
        # win_off = off for sim-range series; charger/EV/WM event tensors
        # are episode-relative (indexed by t on the scan path,
        # core/step.py:352,421,461) and stay un-shifted
        a = _pad_b(np.asarray(arr, np.float32)[win_off:win_off + t_pad],
                   fill)
        out = np.full((t_pad,) + a.shape[1:], fill, np.float32)
        out[:a.shape[0]] = a
        return jnp.asarray(out)

    series = (
        stream(ser.non_shiftable_load, win_off=off),
        stream(ser.solar_generation, win_off=off),
        stream(ser.electricity_pricing, win_off=off),
        stream(ser.carbon_intensity, win_off=off),
        stream(np.asarray(ch.connected_ev, np.float32), -1.0),
        stream(ch.required_soc), stream(ch.departure_time),
        stream(np.asarray(evp.force_soc), np.nan),
        stream(np.asarray(evp.drift_mult), np.nan),
    )
    if cfg.has_washing_machines:
        wmp = params.washing_machines
        series = series + (
            stream(np.asarray(wmp.wm_start, np.float32), -1.0),
            stream(np.asarray(wmp.wm_end, np.float32), -1.0),
            stream(wmp.triggered_load))
        wm_bidx = np.asarray(wmp.building_index)
    else:
        z = jnp.asarray(np.full((t_pad, LANES), -1.0, np.float32))
        series = series + (z, z, jnp.asarray(np.zeros((t_pad, LANES), np.float32)))
        wm_bidx = np.zeros((0,), np.int64)

    hours = np.asarray(ser.hour)[off:off + S, 0]
    viol = np.zeros((t_pad, LANES), np.float32)
    actions = []
    for k, n in (("electrical_storage", B),
                 ("electric_vehicle_storage", C),
                 ("washing_machine", max(W, 1))):
        col = np.zeros((t_pad, LANES), np.float32)
        tbl = action_tables.get(k)
        if tbl is not None:
            plan = expand_action_plan(tbl, hours, S, n)
            if k == "electric_vehicle_storage" and cfg.has_charging_constraints:
                plan, v = apply_charging_constraints_np(cfg, params, plan)
                viol[:S, :B] = v
            col[:S, :n] = plan
        actions.append(jnp.asarray(col))

    bat = params.battery
    bparams = jnp.asarray(np.stack([_pad_b(x) for x in (
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        np.zeros(B), np.zeros(B))]))
    _, _, k1 = _pad_curves_rows(bat.power_efficiency_curve_x,
                                bat.power_efficiency_curve_y, B)
    _, _, k2 = _pad_curves_rows(bat.capacity_power_curve_x,
                                bat.capacity_power_curve_y, B)
    n_knots = max(k1, k2)
    pcx, pcy, _ = _pad_curves_rows(bat.power_efficiency_curve_x,
                                   bat.power_efficiency_curve_y, B, n_knots)
    ccx, ccy, _ = _pad_curves_rows(bat.capacity_power_curve_x,
                                   bat.capacity_power_curve_y, B, n_knots)
    curves = (pcx, pcy, ccx, ccy)

    cparams = np.zeros((N_CROWS, LANES), np.float32)
    cparams[0, :C] = np.asarray(ch.max_charging_power)
    cparams[1, :C] = np.asarray(ch.min_charging_power)
    cparams[2, :C] = np.asarray(ch.max_discharging_power)
    cparams[3, :C] = np.asarray(ch.min_discharging_power)
    _, _, k3 = _pad_curves_rows(ch.charge_eff_x, ch.charge_eff_y, C)
    _, _, k4 = _pad_curves_rows(ch.discharge_eff_x, ch.discharge_eff_y, C)
    ch_knots = max(k3, k4)
    hcx, hcy, _ = _pad_curves_rows(ch.charge_eff_x, ch.charge_eff_y, C, ch_knots)
    hdx, hdy, _ = _pad_curves_rows(ch.discharge_eff_x, ch.discharge_eff_y, C,
                                   ch_knots)
    ch_curves = (hcx, hcy, hdx, hdy)

    eb = evp.battery
    evparams = np.zeros((N_EVROWS, LANES), np.float32)
    for row, v in enumerate((eb.capacity, eb.nominal_power,
                             eb.loss_coefficient, eb.initial_soc,
                             eb.depth_of_discharge,
                             eb.capacity_loss_coefficient)):
        evparams[row, :V] = np.asarray(v)
    _, _, k5 = _pad_curves_rows(eb.power_efficiency_curve_x,
                                eb.power_efficiency_curve_y, V)
    _, _, k6 = _pad_curves_rows(eb.capacity_power_curve_x,
                                eb.capacity_power_curve_y, V)
    ev_knots = max(k5, k6)
    epx, epy, _ = _pad_curves_rows(eb.power_efficiency_curve_x,
                                   eb.power_efficiency_curve_y, V, ev_knots)
    ecx, ecy, _ = _pad_curves_rows(eb.capacity_power_curve_x,
                                   eb.capacity_power_curve_y, V, ev_knots)
    ev_curves = (epx, epy, ecx, ecy)

    def onehot_rows(idx, n_rows):
        out = np.zeros((LANES, LANES), np.float32)
        for i, b in enumerate(np.asarray(idx)):
            if i < n_rows:
                out[i, int(b)] = 1.0
        return jnp.asarray(out)

    ch_bld = onehot_rows(np.asarray(ch.building_index), C)
    wm_bld = onehot_rows(wm_bidx, W)

    D = n_districts
    tile = lambda v, n: jnp.asarray(np.broadcast_to(
        _pad_b(np.asarray(v))[None, :], (D, LANES)).copy())
    state0 = (tile(bat.initial_soc, B), tile(bat.efficiency, B),
              tile(bat.capacity, B),
              tile(eb.initial_soc, V), tile(eb.efficiency, V),
              tile(eb.capacity, V),
              jnp.zeros((D, LANES), jnp.float32))

    from citylearn_tpu.ops.pallas_ev import N_EREC

    shared = (tuple(actions), series, bparams, curves, jnp.asarray(cparams),
              ch_curves, jnp.asarray(evparams), ev_curves, ch_bld, wm_bld,
              jnp.asarray(viol))

    def launch(shared, state0):
        (acts, ser2, bp, cv, cp, chc, evp2, evc, chb, wmb, vl) = shared
        return ev_episode(
            acts, ser2, bp, cv, cp, chc, evp2, evc, chb, wmb, state0,
            n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
            ratio=cfg.time_step_ratio, n_knots=n_knots, ev_knots=ev_knots,
            ch_knots=ch_knots, ev_weights=tuple(cfg.ev_reward_weights),
            use_ev_reward=(cfg.reward_type
                           == "Electric_Vehicles_Reward_Function"),
            viol=vl,
            penalty_coefficient=float(cfg.charging_penalty_coefficient),
            record=record_series, interpret=interpret)

    if mesh is None:
        out = launch(shared, state0)
    else:
        out = _shard_launch(
            mesh, launch, shared, state0, 10, record_series, N_EREC,
            cache_key=("ev", cfg, S, n_knots, ev_knots, ch_knots,
                       record_series, interpret))
    slices = (B, B, B, B, B, B, V, V, V, max(W, 1))
    sliced = tuple(o[:, :n] for o, n in zip(out, slices))
    if record_series:
        sliced = sliced + (out[10][:, :S, :B],)
    return sliced


def eligible_lstm(cfg: StaticConfig) -> bool:
    """LSTM-dynamics districts (the 2023 challenge family): one dynamics
    group, cooling-device partial load, DHW + battery, ComfortReward; no
    outage/EVs/WMs/occupants. Data-level conditions (single group covering
    every building, two LSTM layers, packable channel widths, inert
    heating) are checked by :func:`run_lstm_episode`."""
    # central_agent is allowed: it only changes reward AGGREGATION and
    # observation layout, not physics — the kernel's reward_sum output is
    # per-building either way (sum host-side for the central scalar)
    return (cfg.has_dynamics and len(cfg.dyn_groups) >= 1
            and not cfg.has_occupant and not cfg.has_evs
            and not cfg.has_washing_machines
            and not cfg.has_charging_constraints
            and cfg.reward_per_building is None
            and cfg.reward_type == "ComfortReward")


def _lstm_units(cfg: StaticConfig, params: DistrictParams):
    """Per-building packing metadata for the (possibly heterogeneous)
    dynamics groups: building index -> (group, row-in-group, L, H, F,
    temp-channel, cool-channel) plus cumulative x/h lane offsets."""
    B = cfg.n_buildings
    units = [None] * B
    for g, (meta, dyn) in enumerate(zip(cfg.dyn_groups, params.dynamics)):
        lookback, L, H, F, tc, cc, hc = meta
        for row, b in enumerate(np.asarray(dyn.member_indices)):
            units[int(b)] = dict(g=g, row=row, L=int(L), H=int(H), F=int(F),
                                 tc=int(tc), cc=int(cc), hc=int(hc),
                                 lookback=int(lookback))
    x_off, h_off = [], []
    xa = ha = 0
    for u in units:
        x_off.append(xa)
        h_off.append(ha)
        xa += u["F"]
        ha += u["H"]
    return units, x_off, h_off, xa, ha


def lstm_packable(cfg: StaticConfig, params: DistrictParams) -> bool:
    """Data-level eligibility for the LSTM kernel: every building covered
    by some group, layer counts 1-2, shared lookback, combined channel and
    hidden lanes within one 128-lane tile each, no heating-side dynamics,
    inert heating end-use."""
    if not eligible_lstm(cfg):
        return False
    B = cfg.n_buildings
    covered = np.concatenate([np.asarray(d.member_indices)
                              for d in params.dynamics])
    if not np.array_equal(np.sort(covered), np.arange(B)):
        return False
    units, _, _, x_total, h_total = _lstm_units(cfg, params)
    lookbacks = {u["lookback"] for u in units}
    if len(lookbacks) != 1 or x_total > 128 or h_total > 128:
        return False
    for u in units:
        if u["L"] not in (1, 2) or u["cc"] < 0 or u["hc"] >= 0:
            return False
    for dyn in params.dynamics:
        if (np.asarray(dyn.heating_device_active).any()
                or np.asarray(dyn.cooling_or_heating_active).any()):
            return False
    # heating end-use must be inert (zero demand, zero tank)
    if float(np.asarray(params.series.heating_demand).max()) > 0.0:
        return False
    if float(np.asarray(params.heating_storage.capacity).max()) > 0.0:
        return False
    return True


def run_lstm_episode(cfg: StaticConfig, params: DistrictParams,
                     n_districts: int, action_tables: dict,
                     n_steps: Optional[int] = None,
                     interpret: bool = False,
                     record_series: bool = False,
                     data_offset: int = 0,
                     mesh=None):
    """Whole-episode rollout on the LSTM-dynamics kernel
    (:func:`citylearn_tpu.ops.pallas_lstm.lstm_episode`) for
    ``n_districts`` identical district copies under open-loop plans
    ``{action_name: (24,) hour table | (S,) | (S, B)}`` over
    cooling_device / cooling_storage / dhw_storage / electrical_storage.

    Returns (reward_sum, cost_sum, emission_sum, cool_soc, dhw_soc,
    bat_soc, bat_eff, bat_degraded, last_temp), each (D, B); with
    ``record_series=True`` an (N_LREC, S, B) per-step stream of district
    0 is appended."""
    from citylearn_tpu.ops.pallas_lstm import (
        LANES as L_LANES,
        N_LROWS,
        T_CHUNK as T_CHUNK_L,
        TILE_D as TILE_D_L,
        lstm_episode,
    )
    from citylearn_tpu.ops.pallas_thermal import N_TROWS

    assert lstm_packable(cfg, params), \
        "configuration not eligible for the LSTM fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    assert n_districts % (TILE_D_L * n_shards) == 0
    off = int(data_offset)
    B = cfg.n_buildings
    units, x_off, h_off, _, _ = _lstm_units(cfg, params)
    lookback = units[0]["lookback"]

    ser = params.series
    t_pad = ((S + T_CHUNK_L - 1) // T_CHUNK_L) * T_CHUNK_L

    def stream(arr, fill=0.0):
        # sim-range series: episode window [off, off + S)
        a = _pad_b(np.asarray(arr, np.float32)[off:off + t_pad], fill)
        out = np.full((t_pad, L_LANES), fill, np.float32)
        out[:a.shape[0]] = a
        return jnp.asarray(out)

    band_cfg = cfg.reward_band
    band_src = (np.full((S, B), band_cfg, np.float32) if band_cfg is not None
                else np.asarray(ser.comfort_band)[off:off + S])
    # static channels -> (T, sum F) per-building channel-lane layout,
    # dynamic (cooling-demand / temperature) lanes zeroed; tau-indexed
    # like the scan path (core/step.py:542)
    schan = np.zeros((t_pad, L_LANES), np.float32)
    scs = [np.asarray(d.static_channels)[off:off + S]
           for d in params.dynamics]
    for b, u in enumerate(units):
        xo, F = x_off[b], u["F"]
        schan[:S, xo:xo + F] = scs[u["g"]][:, u["row"], :]
        schan[:S, xo + u["cc"]] = 0.0
        schan[:S, xo + u["tc"]] = 0.0

    series = (
        stream(ser.non_shiftable_load), stream(ser.solar_generation),
        stream(ser.electricity_pricing), stream(ser.carbon_intensity),
        stream(ser.cooling_demand), stream(ser.dhw_demand),
        stream(ser.outdoor_dry_bulb_temperature),
        stream(np.asarray(ser.hvac_mode, np.float32)),
        stream(ser.indoor_dry_bulb_temperature),
        stream(ser.indoor_dry_bulb_temperature_cooling_set_point),
        stream(ser.indoor_dry_bulb_temperature_heating_set_point),
        stream(band_src),
        jnp.asarray(schan),
        stream(ser.power_outage),
    )

    hours = np.asarray(ser.hour)[off:off + S, 0]
    actions = []
    for k in ("cooling_device", "cooling_storage", "dhw_storage",
              "electrical_storage"):
        col = np.zeros((t_pad, L_LANES), np.float32)
        tbl = action_tables.get(k)
        if tbl is not None:
            col[:S, :B] = expand_action_plan(tbl, hours, S, B)
        actions.append(jnp.asarray(col))

    bat = params.battery
    bparams = jnp.asarray(np.stack([_pad_b(x) for x in (
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        np.zeros(B), np.zeros(B))]))
    _, _, k1 = _pad_curves_rows(bat.power_efficiency_curve_x,
                                bat.power_efficiency_curve_y, B)
    _, _, k2 = _pad_curves_rows(bat.capacity_power_curve_x,
                                bat.capacity_power_curve_y, B)
    n_knots = max(k1, k2)
    pcx, pcy, _ = _pad_curves_rows(bat.power_efficiency_curve_x,
                                   bat.power_efficiency_curve_y, B, n_knots)
    ccx, ccy, _ = _pad_curves_rows(bat.capacity_power_curve_x,
                                   bat.capacity_power_curve_y, B, n_knots)
    curves = (pcx, pcy, ccx, ccy)

    cd, dd = params.cooling_device, params.dhw_device
    ct, dt = params.cooling_storage, params.dhw_storage
    ht = params.heating_storage
    rows = [
        _pad_b(cd.nominal_power), _pad_b(cd.efficiency, 1.0),
        _pad_b(cd.target_cooling_temperature),
        _pad_b(np.asarray(cd.is_heat_pump, np.float32)),
        _pad_b(dd.nominal_power), _pad_b(dd.efficiency, 1.0),
        _pad_b(dd.target_heating_temperature),
        _pad_b(np.asarray(dd.is_heat_pump, np.float32)),
        _pad_b(ct.capacity), _pad_b(np.sqrt(np.asarray(ct.efficiency)), 1.0),
        _pad_b(ct.loss_coefficient), _pad_b(ct.max_input_power, np.inf),
        _pad_b(ct.max_output_power, np.inf),
        _pad_b(ct.capacity),
        _pad_b(dt.capacity), _pad_b(np.sqrt(np.asarray(dt.efficiency)), 1.0),
        _pad_b(dt.loss_coefficient), _pad_b(dt.max_input_power, np.inf),
        _pad_b(dt.max_output_power, np.inf),
        _pad_b(ht.capacity),                       # dhw quirk: building.py:1765
    ]
    assert len(rows) == N_TROWS
    tparams = jnp.asarray(np.stack(rows))

    # ---- LSTM packing (per-building lane offsets; heterogeneous
    # groups pack into the same matrices, single-layer buildings carry
    # zero layer-2 blocks and head rows reading layer 1) ----
    lrows = np.zeros((N_LROWS, L_LANES), np.float32)
    # pad-lane norm spans stay 1.0: a 0/0 NaN in a dead lane would poison
    # the one-hot channel-scatter matmuls (NaN * 0 = NaN)
    lrows[1, :] = 1.0
    lrows[3, :] = 1.0
    W = [np.zeros((2 * L_LANES, 4 * L_LANES), np.float32) for _ in range(2)]
    bias_rows = np.zeros((2, 4 * L_LANES), np.float32)
    linw = np.zeros((2 * L_LANES, L_LANES), np.float32)
    pcc = np.zeros((L_LANES, L_LANES), np.float32)
    ptc = np.zeros((L_LANES, L_LANES), np.float32)
    tmask = np.zeros((1, L_LANES), np.float32)
    for b, u in enumerate(units):
        dyn = params.dynamics[u["g"]]
        row, F, H, L = u["row"], u["F"], u["H"], u["L"]
        cc, tc = u["cc"], u["tc"]
        xo, ho = x_off[b], h_off[b]
        nmin = np.asarray(dyn.norm_min)[row]
        nmax = np.asarray(dyn.norm_max)[row]
        lrows[0, b] = nmin[cc]
        lrows[1, b] = nmax[cc] - nmin[cc]
        lrows[2, b] = nmin[tc]
        lrows[3, b] = nmax[tc] - nmin[tc]
        lrows[4, b] = np.asarray(dyn.lin_b)[row]
        lrows[5, b] = float(np.asarray(dyn.cooling_device_active)[row])
        lrows[6, b] = 1.0
        w_ih = [np.asarray(w)[row] for w in dyn.w_ih]   # (4H, F) / (4H, H)
        w_hh = [np.asarray(w)[row] for w in dyn.w_hh]
        biases = [np.asarray(x)[row] for x in dyn.bias]
        for g in range(4):
            for j in range(H):
                col = g * L_LANES + ho + j
                W[0][xo:xo + F, col] = w_ih[0][g * H + j, :]
                W[0][L_LANES + ho:L_LANES + ho + H, col] = w_hh[0][g * H + j, :]
                bias_rows[0, col] = biases[0][g * H + j]
                if L >= 2:
                    W[1][ho:ho + H, col] = w_ih[1][g * H + j, :]
                    W[1][L_LANES + ho:L_LANES + ho + H, col] = \
                        w_hh[1][g * H + j, :]
                    bias_rows[1, col] = biases[1][g * H + j]
        # head reads layer 2 when present, layer 1 otherwise ([h1 | h2])
        head_off = (L_LANES + ho) if L >= 2 else ho
        linw[head_off:head_off + H, b] = np.asarray(dyn.lin_w)[row]
        pcc[b, xo + cc] = 1.0
        ptc[b, xo + tc] = 1.0
        tmask[0, xo + tc] = 1.0

    from citylearn_tpu.ops.pallas_lstm import N_LREC

    D = n_districts
    tile = lambda v: jnp.asarray(
        np.broadcast_to(_pad_b(np.asarray(v))[None, :], (D, L_LANES)).copy())
    shared = (tuple(actions), series, bparams, curves, tparams,
              jnp.asarray(lrows), jnp.asarray(W[0]), jnp.asarray(W[1]),
              jnp.asarray(bias_rows), jnp.asarray(linw), jnp.asarray(pcc),
              jnp.asarray(ptc), jnp.asarray(tmask))
    state_args = (tile(ct.initial_soc), tile(dt.initial_soc),
                  tile(bat.initial_soc), tile(bat.efficiency),
                  tile(bat.capacity))

    def launch(shared, state):
        return lstm_episode(
            *shared, *state,
            n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
            ratio=cfg.time_step_ratio, n_knots=n_knots,
            lookback=int(lookback),
            lo_exp=float(cfg.reward_lower_exponent),
            hi_exp=float(cfg.reward_higher_exponent),
            record=record_series, interpret=interpret)

    if mesh is None:
        out = launch(shared, state_args)
    else:
        out = _shard_launch(
            mesh, launch, shared, state_args, 9, record_series, N_LREC,
            cache_key=("lstm", cfg, S, n_knots, int(lookback),
                       record_series, interpret))
    sliced = tuple(o[:, :B] for o in out[:9])
    if record_series:
        sliced = sliced + (out[9][:, :S, :B],)
    return sliced


def run_thermal_episode(cfg: StaticConfig, params: DistrictParams,
                        n_districts: int, action_tables: dict,
                        n_steps: Optional[int] = None,
                        interpret: bool = False,
                        record_series: bool = False,
                        data_offset: int = 0,
                        mesh=None):
    """Whole-episode rollout on the thermal kernel
    (:func:`citylearn_tpu.ops.pallas_thermal.thermal_episode`) for
    ``n_districts`` identical district copies under open-loop action
    plans ``{action_name: (24,) hour table | (S,) | (S, B)}``
    (cooling_storage / dhw_storage / electrical_storage; missing keys
    act 0).

    Returns (reward_sum, cost_sum, emission_sum, cooling_soc, dhw_soc,
    battery_soc, battery_eff, battery_degraded), each (D, B); with
    ``record_series=True`` an extra (N_TREC, S, B) per-step stream of
    district 0 is appended (see :mod:`citylearn_tpu.ops.pallas_thermal`
    row constants)."""
    from citylearn_tpu.ops.pallas_thermal import (
        N_TROWS,
        T_CHUNK as T_CHUNK_TH,
        TILE_D as TILE_D_TH,
        thermal_episode,
    )

    assert eligible_thermal(cfg), "configuration not eligible for the thermal fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    assert n_districts % (TILE_D_TH * n_shards) == 0
    off = int(data_offset)
    B = params.battery.capacity.shape[0]
    assert B <= B_PAD

    ser = params.series
    series_np = [_pad_b(np.asarray(x)) for x in (
        ser.non_shiftable_load, ser.solar_generation, ser.electricity_pricing,
        ser.carbon_intensity, ser.cooling_demand, ser.dhw_demand,
        ser.outdoor_dry_bulb_temperature)]
    t_pad = ((S + T_CHUNK_TH - 1) // T_CHUNK_TH) * T_CHUNK_TH
    series = tuple(jnp.asarray(_pad_time(x, t_pad, off)) for x in series_np)

    hours = np.asarray(ser.hour)[off:off + S, 0]
    actions = []
    for k in ("cooling_storage", "dhw_storage", "electrical_storage"):
        col = np.zeros((t_pad, B_PAD), np.float32)
        tbl = action_tables.get(k)
        if tbl is not None:
            col[:S, :B] = expand_action_plan(tbl, hours, S, B)
        actions.append(jnp.asarray(col))

    bat = params.battery
    bparams = jnp.asarray(np.stack([_pad_b(x) for x in (
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        np.zeros(B), np.zeros(B))]))

    def pad_curve_rows(x, identity):
        arr = np.asarray(x, np.float32)
        out = np.tile(identity[None, :].astype(np.float32), (B_PAD, 1))
        out[:B] = arr
        return jnp.asarray(out.T.copy())

    P = bat.power_efficiency_curve_x.shape[1]
    ident_x = np.concatenate([[0.0], np.ones(P - 1)])
    curves = (pad_curve_rows(bat.power_efficiency_curve_x, ident_x),
              pad_curve_rows(bat.power_efficiency_curve_y, np.ones(P)),
              pad_curve_rows(bat.capacity_power_curve_x, ident_x),
              pad_curve_rows(bat.capacity_power_curve_y, np.ones(P)))
    n_knots = 2
    for cx in (curves[0], curves[2]):
        x = np.asarray(cx)
        diffs = np.any(x[1:] != x[:-1], axis=1)
        if diffs.any():
            n_knots = max(n_knots, int(np.max(np.nonzero(diffs)[0])) + 2)
    curves = tuple(c[:n_knots] for c in curves)

    # thermal parameter rows (ops/pallas_thermal row order); pad columns
    # carry inert defaults (efficiency 1, capacity 0, infinite power caps)
    cd, dd = params.cooling_device, params.dhw_device
    ct, dt = params.cooling_storage, params.dhw_storage
    ht = params.heating_storage
    rows = [
        _pad_b(cd.nominal_power), _pad_b(cd.efficiency, 1.0),
        _pad_b(cd.target_cooling_temperature),
        _pad_b(np.asarray(cd.is_heat_pump, np.float32)),
        _pad_b(dd.nominal_power), _pad_b(dd.efficiency, 1.0),
        _pad_b(dd.target_heating_temperature),
        _pad_b(np.asarray(dd.is_heat_pump, np.float32)),
        _pad_b(ct.capacity), _pad_b(np.sqrt(np.asarray(ct.efficiency)), 1.0),
        _pad_b(ct.loss_coefficient), _pad_b(ct.max_input_power, np.inf),
        _pad_b(ct.max_output_power, np.inf),
        _pad_b(ct.capacity),                       # cooling converts by itself
        _pad_b(dt.capacity), _pad_b(np.sqrt(np.asarray(dt.efficiency)), 1.0),
        _pad_b(dt.loss_coefficient), _pad_b(dt.max_input_power, np.inf),
        _pad_b(dt.max_output_power, np.inf),
        _pad_b(ht.capacity),                       # dhw quirk: building.py:1765
    ]
    assert len(rows) == N_TROWS
    tparams = jnp.asarray(np.stack(rows))

    from citylearn_tpu.ops.pallas_thermal import N_TREC

    D = n_districts
    tile = lambda v: jnp.asarray(
        np.broadcast_to(_pad_b(np.asarray(v))[None, :], (D, B_PAD)).copy())
    shared = (tuple(actions), series, bparams, curves, tparams)
    state_args = (tile(ct.initial_soc), tile(dt.initial_soc),
                  tile(bat.initial_soc), tile(bat.efficiency),
                  tile(bat.capacity))

    def launch(shared, state):
        return thermal_episode(
            *shared, *state,
            n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
            ratio=cfg.time_step_ratio, n_knots=n_knots,
            record=record_series, interpret=interpret)

    if mesh is None:
        out = launch(shared, state_args)
    else:
        out = _shard_launch(
            mesh, launch, shared, state_args, 8, record_series, N_TREC,
            cache_key=("thermal", cfg, S, n_knots, record_series,
                       interpret))
    sliced = tuple(o[:, :B] for o in out[:8])
    if record_series:
        sliced = sliced + (out[8][:, :S, :B],)
    return sliced


def eligible_neighborhood(cfg: StaticConfig) -> bool:
    """LSTM-dynamics districts NOT servable by the single-tile LSTM
    kernel — the EULP neighborhoods (47-100 heterogeneous buildings,
    signed cooling_or_heating partial load, default reward) and the
    quebec occupant family (heating-side partial load, ComfortReward,
    occupant interaction). The kernel runs the O(D) physics; the O(1)
    temperature/occupant sequence runs in the single-district post-pass
    (core/neighborhood_eval.py). Data-level conditions (all tanks inert,
    shared lookback, full dynamics coverage, B <= 128) are checked by
    :func:`neighborhood_packable`."""
    return (cfg.has_dynamics and len(cfg.dyn_groups) >= 1
            and not cfg.has_evs and not cfg.has_washing_machines
            and not cfg.any_outage and not cfg.has_charging_constraints
            and cfg.reward_per_building is None
            and (cfg.reward_type == "ComfortReward"
                 or (cfg.reward_type in _REWARD_OK
                     and cfg.reward_exponent == 1.0)))


def neighborhood_packable(cfg: StaticConfig, params: DistrictParams) -> bool:
    """Data-level eligibility for the neighborhood kernel: every building
    dynamics-covered with one shared lookback, <= 128 buildings, and
    every cooling/heating tank capacity zero — which (via the reference's
    dhw-conversion-through-heating-capacity quirk, ``building.py:1765``)
    makes ALL storage tanks inert, the precondition for the kernel's
    device-only thermal dispatch."""
    if not eligible_neighborhood(cfg):
        return False
    if eligible_lstm(cfg) and lstm_packable(cfg, params):
        return False                 # the single-tile LSTM kernel serves it
    B = cfg.n_buildings
    if B > B_PAD:
        return False
    covered = np.concatenate([np.asarray(d.member_indices)
                              for d in params.dynamics])
    if not np.array_equal(np.sort(covered), np.arange(B)):
        return False
    if len({int(meta[0]) for meta in cfg.dyn_groups}) != 1:
        return False
    if float(np.asarray(params.cooling_storage.capacity).max()) > 0.0:
        return False
    if float(np.asarray(params.heating_storage.capacity).max()) > 0.0:
        return False
    return True


def run_neighborhood_episode(cfg: StaticConfig, params: DistrictParams,
                             n_districts: int, action_tables: dict,
                             n_steps: Optional[int] = None,
                             interpret: bool = False,
                             record_series: bool = False,
                             data_offset: int = 0,
                             mesh=None):
    """Whole-episode rollout on the neighborhood kernel
    (:func:`citylearn_tpu.ops.pallas_neighborhood.neighborhood_episode`)
    for ``n_districts`` identical district copies under open-loop plans
    ``{action_name: (24,) hour table | (S,) | (S, B)}`` over
    cooling_or_heating_device / cooling_device / heating_device /
    electrical_storage (dhw_storage plans are accepted but inert — the
    reference's conversion quirk, see :func:`neighborhood_packable`).

    Returns (reward_sum, cost_sum, emission_sum, dhw_soc, bat_soc,
    bat_eff, bat_degraded), each (D, B); with ``record_series=True`` an
    (N_NREC, S, B) per-step stream of district 0 is appended. The
    reward_sum output is the default exponent-1 reward; quebec's
    temperature-dependent ComfortReward is assembled by the evaluation
    layer from the post-pass (the KPI surface never reads rewards)."""
    from citylearn_tpu.ops.pallas_neighborhood import (
        LANES as N_LANES,
        N_NREC,
        N_NROWS,
        T_CHUNK as T_CHUNK_N,
        TILE_D as TILE_D_N,
        neighborhood_episode,
    )

    assert neighborhood_packable(cfg, params), \
        "configuration not eligible for the neighborhood fast path"
    S = (cfg.time_steps - 1) if n_steps is None else n_steps
    n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    assert n_districts % (TILE_D_N * n_shards) == 0
    off = int(data_offset)
    B = cfg.n_buildings
    lookback = int(cfg.dyn_groups[0][0])

    ser = params.series
    t_pad = ((S + T_CHUNK_N - 1) // T_CHUNK_N) * T_CHUNK_N

    def stream(arr, fill=0.0):
        a = _pad_b(np.asarray(arr, np.float32)[off:off + t_pad], fill)
        out = np.full((t_pad, N_LANES), fill, np.float32)
        out[:a.shape[0]] = a
        return jnp.asarray(out)

    series = (
        stream(ser.non_shiftable_load), stream(ser.solar_generation),
        stream(ser.electricity_pricing), stream(ser.carbon_intensity),
        stream(ser.cooling_demand), stream(ser.heating_demand),
        stream(ser.dhw_demand), stream(ser.outdoor_dry_bulb_temperature),
        stream(np.asarray(ser.hvac_mode, np.float32)),
    )

    hours = np.asarray(ser.hour)[off:off + S, 0]
    actions = []
    for k in ("cooling_or_heating_device", "cooling_device",
              "heating_device", "electrical_storage"):
        col = np.zeros((t_pad, N_LANES), np.float32)
        tbl = action_tables.get(k)
        if tbl is not None:
            col[:S, :B] = expand_action_plan(tbl, hours, S, B)
        actions.append(jnp.asarray(col))

    bat = params.battery
    bparams = jnp.asarray(np.stack([_pad_b(x) for x in (
        bat.capacity, bat.nominal_power, bat.loss_coefficient,
        bat.initial_soc, bat.depth_of_discharge, bat.capacity_loss_coefficient,
        np.zeros(B), np.zeros(B))]))
    _, _, k1 = _pad_curves_rows(bat.power_efficiency_curve_x,
                                bat.power_efficiency_curve_y, B)
    _, _, k2 = _pad_curves_rows(bat.capacity_power_curve_x,
                                bat.capacity_power_curve_y, B)
    n_knots = max(k1, k2)
    pcx, pcy, _ = _pad_curves_rows(bat.power_efficiency_curve_x,
                                   bat.power_efficiency_curve_y, B, n_knots)
    ccx, ccy, _ = _pad_curves_rows(bat.capacity_power_curve_x,
                                   bat.capacity_power_curve_y, B, n_knots)
    curves = (pcx, pcy, ccx, ccy)

    # partial-load action availability per building (union over groups)
    cool_act = np.zeros(B, np.float32)
    heat_act = np.zeros(B, np.float32)
    coh_act = np.zeros(B, np.float32)
    for dyn in params.dynamics:
        m = np.asarray(dyn.member_indices)
        cool_act[m] = np.maximum(cool_act[m],
                                 np.asarray(dyn.cooling_device_active,
                                            np.float32))
        heat_act[m] = np.maximum(heat_act[m],
                                 np.asarray(dyn.heating_device_active,
                                            np.float32))
        coh_act[m] = np.maximum(coh_act[m],
                                np.asarray(dyn.cooling_or_heating_active,
                                           np.float32))

    cd, hd, dd = params.cooling_device, params.heating_device, params.dhw_device
    dt = params.dhw_storage
    rows = [
        _pad_b(cd.nominal_power), _pad_b(cd.efficiency, 1.0),
        _pad_b(cd.target_cooling_temperature),
        _pad_b(np.asarray(cd.is_heat_pump, np.float32)),
        _pad_b(hd.nominal_power), _pad_b(hd.efficiency, 1.0),
        _pad_b(hd.target_heating_temperature),
        _pad_b(np.asarray(hd.is_heat_pump, np.float32)),
        _pad_b(dd.nominal_power), _pad_b(dd.efficiency, 1.0),
        _pad_b(dd.target_heating_temperature),
        _pad_b(np.asarray(dd.is_heat_pump, np.float32)),
        _pad_b(dt.capacity), _pad_b(dt.loss_coefficient),
        _pad_b(cool_act), _pad_b(heat_act), _pad_b(coh_act),
    ]
    assert len(rows) == N_NROWS
    nparams = jnp.asarray(np.stack(rows))

    D = n_districts
    tile = lambda v: jnp.asarray(
        np.broadcast_to(_pad_b(np.asarray(v))[None, :], (D, N_LANES)).copy())
    shared = (tuple(actions), series, bparams, curves, nparams)
    state_args = (tile(dt.initial_soc), tile(bat.initial_soc),
                  tile(bat.efficiency), tile(bat.capacity))

    def launch(shared, state):
        return neighborhood_episode(
            *shared, *state,
            n_steps=S, hours_ratio=cfg.seconds_per_time_step / 3600.0,
            ratio=cfg.time_step_ratio, n_knots=n_knots, lookback=lookback,
            record=record_series, interpret=interpret)

    if mesh is None:
        out = launch(shared, state_args)
    else:
        out = _shard_launch(
            mesh, launch, shared, state_args, 7, record_series, N_NREC,
            cache_key=("neighborhood", cfg, S, n_knots, lookback,
                       record_series, interpret))
    sliced = tuple(o[:, :B] for o in out[:7])
    if record_series:
        sliced = sliced + (out[7][:, :S, :B],)
    return sliced
