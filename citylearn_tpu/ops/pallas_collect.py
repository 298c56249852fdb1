"""Chunked Pallas TPU kernel for CLOSED-LOOP training collect on the
battery+PV family.

Why this shape: in this rebuild the batched trainer's policy consumes the
data-driven ``obs_static`` row (the reference's returned-observation
semantics at t >= 1 — state-derived columns read the yet-unwritten next
index; see ``core/types.py:191-194`` and ``envs/environment.py``).  The
policy MLP therefore never needs env state, so a K-step closed-loop
collect factors cleanly into

1. an **MXU policy sweep** over the whole chunk — one batched matmul
   stack ``(K*D*A, obs) @ W`` evaluated in XLA (which schedules large
   matmuls better than any hand-written kernel could), and
2. the **sequential battery recurrence + reward** — ~25 elementwise ops
   per step that the XLA scan path dispatches as hundreds of tiny
   fusions per step (73%% of the round-4 train-step cost,
   ``tools/profile_train.py``) — fused here into ONE kernel launch per
   chunk.

The kernel runs K consecutive env steps for a (D, B) district batch with
**per-district** action streams (closed-loop actions differ per district
through the exploration/policy noise), emitting the per-step per-building
reward stream the SAC learner consumes plus the final battery state.

Layout: districts ride the 128-lane axis (``DL``), buildings the sublane
axis padded to a multiple of 8 (``B8``) — the transpose of the
whole-episode kernels (``ops/pallas_battery``), because here D is the
huge axis and B is tiny.  All chunk streams are plain VMEM blocks (no DMA
machinery): at K <= 128 a (K, B8, DL) f32 block is <= 512 KB.

Physics is the same bit-compatible battery math as
:func:`citylearn_tpu.ops.pallas_battery._episode_kernel` (reference
``energy_model.py:719-768, 1027-1141``), including the t == 0
net-accounting quirks (``building.py:2618-2652``).  Rewards are the
default exponent-1 reward ``-max(net, 0)`` (``reward_function.py:65-88``);
eligibility is checked by the trainer (``train.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO = 1e-6
DL = 128          # districts per tile (lane axis)


class CollectPrep(NamedTuple):
    """Host-side precomputed battery parameters in kernel layout
    (build once per trainer with :func:`prepare_battery_collect`)."""
    bparams: jnp.ndarray      # (6, B8, 1): cap, nominal, loss, dod, clc, live
    pec_x: jnp.ndarray        # (P, B8, 1) power-efficiency knots
    pec_y: jnp.ndarray
    cpc_x: jnp.ndarray        # (P, B8, 1) capacity-power knots
    cpc_y: jnp.ndarray
    n_knots: int
    n_buildings: int
    b8: int
    hours_ratio: float
    ratio: float


def prepare_battery_collect(cfg, params) -> CollectPrep:
    """Pack battery params/curves for the collect kernel: buildings on
    sublanes (padded to a multiple of 8 with inert columns), knots
    knot-major with the trailing pad-repeated knots trimmed (same
    reasoning as ``core/rollout_fast.run_battery_episode``)."""
    bat = params.battery
    B = int(np.asarray(bat.capacity).shape[0])
    B8 = max(8, ((B + 7) // 8) * 8)

    def pad_b(arr, fill=0.0):
        a = np.asarray(arr, np.float32)
        out = np.full((B8,), fill, np.float32)
        out[:B] = a
        return out

    live = np.zeros((B8,), np.float32)
    live[:B] = 1.0
    bparams = np.stack([
        pad_b(bat.capacity), pad_b(bat.nominal_power),
        pad_b(bat.loss_coefficient), pad_b(bat.depth_of_discharge),
        pad_b(bat.capacity_loss_coefficient), live])

    P = int(np.asarray(bat.power_efficiency_curve_x).shape[1])
    ident_x = np.concatenate([[0.0], np.ones(P - 1)]).astype(np.float32)

    def pad_curve(x, identity):
        arr = np.asarray(x, np.float32)
        out = np.tile(identity[None, :], (B8, 1))
        out[:B] = arr
        return out.T.copy()            # (P, B8) knot-major

    pec_x = pad_curve(bat.power_efficiency_curve_x, ident_x)
    pec_y = pad_curve(bat.power_efficiency_curve_y, np.ones(P, np.float32))
    cpc_x = pad_curve(bat.capacity_power_curve_x, ident_x)
    cpc_y = pad_curve(bat.capacity_power_curve_y, np.ones(P, np.float32))
    n_knots = 2
    for cx in (pec_x, cpc_x):
        diffs = np.any(cx[1:] != cx[:-1], axis=1)
        if diffs.any():
            n_knots = max(n_knots, int(np.max(np.nonzero(diffs)[0])) + 2)
    as3 = lambda a: jnp.asarray(a[:, :, None]) if a.ndim == 2 else jnp.asarray(a)
    return CollectPrep(
        bparams=jnp.asarray(bparams[:, :, None]),
        pec_x=as3(pec_x[:n_knots]), pec_y=as3(pec_y[:n_knots]),
        cpc_x=as3(cpc_x[:n_knots]), cpc_y=as3(cpc_y[:n_knots]),
        n_knots=n_knots, n_buildings=B, b8=B8,
        hours_ratio=float(cfg.seconds_per_time_step / 3600.0),
        ratio=float(cfg.time_step_ratio))


def _interp(q, xs_ref, ys_ref, n_knots: int):
    """Reference curve lookup (``energy_model.py:1083,1103``) with
    per-building knots broadcast over the district lane axis:
    ``q``: (B8, DL); knot refs: (P, B8, 1)."""
    first = jnp.zeros_like(q, dtype=jnp.int32)
    for k in range(n_knots):
        first = first + (xs_ref[k] < q).astype(jnp.int32)
    no_match = first >= n_knots
    idx = jnp.where(no_match, 0, jnp.maximum(0, first - 1))
    x0 = jnp.zeros_like(q)
    x1 = jnp.zeros_like(q)
    y0 = jnp.zeros_like(q)
    y1 = jnp.zeros_like(q)
    for k in range(n_knots - 1):
        sel = idx == k
        x0 = jnp.where(sel, xs_ref[k], x0)
        x1 = jnp.where(sel, xs_ref[k + 1], x1)
        y0 = jnp.where(sel, ys_ref[k], y0)
        y1 = jnp.where(sel, ys_ref[k + 1], y1)
    return y0 + (q - x0) * (y1 - y0) / (x1 - x0)


def _collect_kernel(act_ref, nsl_ref, solar_ref,          # (K, B8, DL) VMEM
                    bparams_ref,                          # (6, B8, 1) VMEM
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,  # (P, B8, 1)
                    soc0_ref, eff0_ref, deg0_ref,         # (B8, DL) VMEM
                    reward_ref,                           # (K, B8, DL) out
                    soc_ref, eff_ref, deg_ref,            # (B8, DL) out
                    *, n_steps: int, first_chunk: bool,
                    hours_ratio: float, ratio: float, n_knots: int):
    cap = bparams_ref[0]
    nominal = bparams_ref[1]
    loss = bparams_ref[2]
    dod = bparams_ref[3]
    clc = bparams_ref[4]

    def step_body(k, carry):
        soc, eff, deg = carry
        a = act_ref[k]
        nsl = nsl_ref[k]
        solar = solar_ref[k]

        energy = a * nominal * hours_ratio     # /ratio then *ratio cancel
        energy_init = jnp.maximum(0.0, soc * cap * (1.0 - loss))
        soc_norm = energy_init / jnp.maximum(cap, ZERO)
        max_power = nominal * _interp(soc_norm, cpc_x_ref, cpc_y_ref, n_knots)

        charging = energy >= 0.0
        e_chg = jnp.minimum(jnp.minimum(max_power, nominal),
                            jnp.minimum(deg - energy_init, energy))
        eff_chg = _interp(jnp.abs(jnp.minimum(energy, max_power))
                          / jnp.maximum(nominal, ZERO), pec_x_ref, pec_y_ref,
                          n_knots)
        old_rt = jnp.sqrt(eff)
        e_dod = -jnp.maximum((soc - (1.0 - dod)) * cap * old_rt, 0.0)
        e_dis = jnp.maximum(jnp.maximum(-max_power, e_dod), energy)
        eff_dis = _interp(jnp.minimum(jnp.abs(energy), max_power)
                          / jnp.maximum(nominal, ZERO), pec_x_ref, pec_y_ref,
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

        # net accounting incl. the t == 0 multi-count quirks
        # (building.py:2618-2652); t == 0 can only be the first step of
        # the first chunk of an episode (chunks are episode-aligned)
        if first_chunk:
            is_t0 = k == 0
            nsl_term = jnp.where(is_t0, 3.0 * nsl, nsl)
            bat_term = jnp.where(is_t0, 2.0 * balance, balance)
        else:
            nsl_term, bat_term = nsl, balance
        net = nsl_term + bat_term - solar
        reward_ref[k] = -jnp.maximum(net, 0.0)
        return new_soc, new_eff, new_deg

    soc, eff, deg = jax.lax.fori_loop(
        0, n_steps, step_body, (soc0_ref[:, :], eff0_ref[:, :], deg0_ref[:, :]))
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "first_chunk", "hours_ratio", "ratio", "n_knots", "interpret"))
def _collect_chunk_kernel(actions, nsl, solar, bparams, curves,
                          soc0, eff0, deg0, *, n_steps: int,
                          first_chunk: bool, hours_ratio: float, ratio: float,
                          n_knots: int, interpret: bool = False):
    """(K, B8, D) streams + (B8, D) state -> (K, B8, D) rewards +
    final (B8, D) state; grid over D/DL district tiles."""
    K, B8, D = actions.shape
    grid = (D // DL,)
    stream = pl.BlockSpec((K, B8, DL), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    state = pl.BlockSpec((B8, DL), lambda i: (0, i), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _collect_kernel, n_steps=n_steps, first_chunk=first_chunk,
        hours_ratio=hours_ratio, ratio=ratio, n_knots=n_knots)
    pec_x, pec_y, cpc_x, cpc_y = curves
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[stream] * 3 + [small] * 5 + [state] * 3,
        out_specs=[stream] + [state] * 3,
        out_shape=[jax.ShapeDtypeStruct((K, B8, D), jnp.float32)]
        + [jax.ShapeDtypeStruct((B8, D), jnp.float32)] * 3,
        interpret=interpret,
    )(actions, nsl, solar, bparams, pec_x, pec_y, cpc_x, cpc_y,
      soc0, eff0, deg0)


def battery_collect_chunk(prep: CollectPrep, actions, nsl, solar,
                          soc, eff, deg, *, first_chunk: bool,
                          interpret: bool = False,
                          d_last: bool = False):
    """Run ``K`` closed-loop env steps for a (D, B) district batch.

    Default layout: ``actions``/``nsl``/``solar`` are (K, D, B) float32
    per-district streams (actions = electrical_storage fractions; series
    pre-gathered at each district's episode window,
    ``take(series, offset + t + k)``); ``soc``/``eff``/``deg``: (D, B)
    battery state entering the chunk; rewards return (K, D, B).

    ``d_last=True`` takes ``actions`` as (K, B, D) and ``nsl``/``solar``
    as (B, K, D) and returns rewards as (K, B, D) — the district axis
    stays on TPU lanes end to end, so none of the chunk streams ever
    materialize in a (…, B)-lane layout (B ~ 5 pads to 128 lanes, a
    ~25x physical blowup).

    Traceable (jit/shard_map-safe): layout moves are XLA transposes.
    """
    B8 = prep.b8
    if d_last:
        K, B, D = actions.shape
        pad_b_mid = ((0, 0), (0, B8 - B), (0, 0))
        to_k = lambda x: jnp.pad(x, pad_b_mid)               # (K, B8, D)
        ser_k = lambda x: jnp.pad(jnp.transpose(x, (1, 0, 2)), pad_b_mid)
        acts, nsl_k, sol_k = to_k(actions), ser_k(nsl), ser_k(solar)
    else:
        K, D, B = actions.shape
        pad = ((0, 0), (0, 0), (0, B8 - B))
        to_k = lambda x: jnp.transpose(jnp.pad(x, pad), (0, 2, 1))
        acts, nsl_k, sol_k = to_k(actions), to_k(nsl), to_k(solar)
    spad = ((0, 0), (0, B8 - B))
    st_k = lambda x: jnp.transpose(jnp.pad(x, spad), (1, 0))     # (B8, D)
    rew, soc1, eff1, deg1 = _collect_chunk_kernel(
        acts, nsl_k, sol_k,
        prep.bparams, (prep.pec_x, prep.pec_y, prep.cpc_x, prep.cpc_y),
        st_k(soc), st_k(eff), st_k(deg),
        n_steps=K, first_chunk=first_chunk, hours_ratio=prep.hours_ratio,
        ratio=prep.ratio, n_knots=prep.n_knots, interpret=interpret)
    back = lambda x: jnp.transpose(x, (1, 0))[:, :B]
    rew_out = (rew[:, :B, :] if d_last
               else jnp.transpose(rew, (0, 2, 1))[:, :, :B])
    return rew_out, back(soc1), back(eff1), back(deg1)
