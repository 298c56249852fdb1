"""Whole-episode Pallas TPU kernel for battery+PV districts.

The XLA per-step path issues ~10^2 small kernels per scanned step; at
4096 districts that costs ~1 ms per env step regardless of math. This
kernel fuses the ENTIRE episode: the grid tiles the district batch, the
year-long driver series stream HBM -> VMEM in double-buffered time
chunks, battery state lives in VMEM scratch, and the open-loop action
plan is itself a streamed (T, B) tensor — one kernel launch per episode.

Two product features beyond raw throughput:

- **per-building action plans**: the action input is a full (T_pad, B)
  stream (any open-loop plan — hour-indexed RBC tables are just one
  broadcast of it), not a scalar shared across buildings;
- **per-step series recording** (``record=True``): the kernel streams the
  per-step net consumption, raw battery balance and SOC of district-tile
  0 back to HBM, chunk by chunk, so user-facing evaluation
  (:mod:`citylearn_tpu.core.evaluate_fast`) can produce the full
  normalized KPI table of the reference's ``evaluate()``
  (``citylearn.py:1136-1323``) at kernel speed.

Physics is bit-compatible with :func:`citylearn_tpu.core.battery.battery_charge`
(reference ``energy_model.py:719-768, 1027-1141``) for the no-outage,
battery+PV-only configuration; eligibility is checked by the dispatcher in
:mod:`citylearn_tpu.core.rollout_fast`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO = 1e-6
TILE_D = 256
T_CHUNK = 512
P = 12            # padded curve knots (compiler/seeding.pad_curve)
N_REC = 3         # recorded series rows: net, battery balance, battery soc


def _interp(q, xs, ys, n_knots: int):
    """Reference curve lookup (``energy_model.py:1083,1103``):
    ``idx = max(0, argmax(q <= x) - 1)``, all-False -> first segment.

    ``q``: (TILE, B); ``xs``/``ys``: (n_knots, B) — knot-major so each knot
    is a contiguous (B,) lane row. The (B, P) layout's per-column
    extraction (``xs[:, k]``) is a lane-strided gather that stalls the
    Mosaic compiler; row slices are free. ``n_knots`` is the true distinct
    knot count (trailing pad repeats trimmed by the dispatcher) — the
    unrolled select chains scale with it, so smaller = faster compile."""
    # first true index of q <= x == count of x < q for sorted knots
    first = jnp.zeros_like(q, dtype=jnp.int32)
    for k in range(n_knots):
        first = first + (xs[k, :][None, :] < q).astype(jnp.int32)
    no_match = first >= n_knots
    idx = jnp.where(no_match, 0, jnp.maximum(0, first - 1))
    x0 = jnp.zeros_like(q)
    x1 = jnp.zeros_like(q)
    y0 = jnp.zeros_like(q)
    y1 = jnp.zeros_like(q)
    for k in range(n_knots - 1):
        sel = idx == k
        x0 = jnp.where(sel, xs[k, :][None, :], x0)
        x1 = jnp.where(sel, xs[k + 1, :][None, :], x1)
        y0 = jnp.where(sel, ys[k, :][None, :], y0)
        y1 = jnp.where(sel, ys[k + 1, :][None, :], y1)
    return y0 + (q - x0) * (y1 - y0) / (x1 - x0)


def _episode_kernel(act_hbm,                 # (T, B) HBM action stream
                    nsl_hbm, solar_hbm, price_hbm, carbon_hbm,   # (T, B) HBM
                    bparams_ref,            # (8, B) VMEM
                    pec_x_ref, pec_y_ref, cpc_x_ref, cpc_y_ref,  # (P, B) VMEM
                    soc0_ref, eff0_ref, deg0_ref,                # (TILE, B) VMEM
                    reward_ref, cost_ref, emission_ref,          # (TILE, B) out
                    soc_ref, eff_ref, deg_ref,                   # (TILE, B) out
                    *rest,
                    # scratch (after any record outputs in ``rest``):
                    # act/nsl/solar/price/carbon bufs (2, CH, B), DMA sems,
                    # and when recording: rec bufs (N_REC x (CH, B)) + sems
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int, record: bool):
    if record:
        rec_out, = rest[:1]                  # (N_REC, T_pad, B) HBM out
        (act_buf, nsl_buf, solar_buf, price_buf, carbon_buf,
         sems, rec_buf, rec_sem) = rest[1:]
    else:
        (act_buf, nsl_buf, solar_buf, price_buf, carbon_buf,
         sems) = rest
    cap = bparams_ref[0, :][None, :]
    nominal = bparams_ref[1, :][None, :]
    loss = bparams_ref[2, :][None, :]
    dod = bparams_ref[4, :][None, :]
    clc = bparams_ref[5, :][None, :]

    pec_x = pec_x_ref[:, :]
    pec_y = pec_y_ref[:, :]
    cpc_x = cpc_x_ref[:, :]
    cpc_y = cpc_y_ref[:, :]

    # hoisted: program_id is only available at kernel top level in
    # interpret mode (inside fori_loop it would trace into plain XLA)
    is_tile0 = pl.program_id(0) == 0
    n_chunks = pl.cdiv(n_steps, T_CHUNK)

    def chunk_dma(slot, ci):
        start = ci * T_CHUNK
        return [pltpu.make_async_copy(
            hbm.at[pl.ds(start, T_CHUNK), :], buf.at[slot], sems.at[slot, i])
            for i, (hbm, buf) in enumerate(
                [(act_hbm, act_buf), (nsl_hbm, nsl_buf), (solar_hbm, solar_buf),
                 (price_hbm, price_buf), (carbon_hbm, carbon_buf)])]

    for d in chunk_dma(0, 0):
        d.start()

    def chunk_body(ci, carry):
        soc, eff, deg, rew, cost, emis = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for d in chunk_dma((ci + 1) % 2, ci + 1):
                d.start()

        for d in chunk_dma(slot, ci):
            d.wait()

        def step_body(tl, carry):
            soc, eff, deg, rew, cost, emis = carry
            t = ci * T_CHUNK + tl
            a = act_buf[slot, tl, :][None, :]
            nsl = nsl_buf[slot, tl, :][None, :]
            solar = solar_buf[slot, tl, :][None, :]
            price = price_buf[slot, tl, :][None, :]
            carbon = carbon_buf[slot, tl, :][None, :]

            energy = a * nominal * hours_ratio     # /ratio then *ratio cancel
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

            # net accounting incl. the t == 0 multi-count quirks
            is_t0 = t == 0
            nsl_term = jnp.where(is_t0, 3.0 * nsl, nsl)
            bat_term = jnp.where(is_t0, 2.0 * balance, balance)
            net = nsl_term + bat_term - solar
            if record:
                # district-tile 0 is the recorded district: the per-step
                # stream writes (1, B) rows of its first district row
                rec_buf[0, pl.ds(tl, 1), :] = net[0:1, :]
                rec_buf[1, pl.ds(tl, 1), :] = balance[0:1, :]
                rec_buf[2, pl.ds(tl, 1), :] = new_soc[0:1, :]
            # static trip counts everywhere: steps past n_steps are no-ops
            live = t < n_steps
            keep = lambda new, old: jnp.where(live, new, old)
            rew = keep(rew - jnp.maximum(net, 0.0), rew)
            # cost is unclamped (building.py:2686), emission clamps at 0
            # (building.py:2691) — matching core/step.py:455-456
            cost = keep(cost + net * price, cost)
            emis = keep(emis + jnp.maximum(net * carbon, 0.0), emis)
            return (keep(new_soc, soc), keep(new_eff, eff),
                    keep(new_deg, deg), rew, cost, emis)

        out = jax.lax.fori_loop(0, T_CHUNK, step_body,
                                (soc, eff, deg, rew, cost, emis))
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
    soc, eff, deg, rew, cost, emis = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (soc0_ref[:, :], eff0_ref[:, :], deg0_ref[:, :], zeros, zeros, zeros))
    reward_ref[:, :] = rew
    cost_ref[:, :] = cost
    emission_ref[:, :] = emis
    soc_ref[:, :] = soc
    eff_ref[:, :] = eff
    deg_ref[:, :] = deg


@functools.partial(jax.jit, static_argnames=("n_steps", "hours_ratio", "ratio",
                                             "n_knots", "record", "interpret"))
def battery_episode(actions: jnp.ndarray, series: Tuple[jnp.ndarray, ...],
                    bparams: jnp.ndarray, curves: Tuple[jnp.ndarray, ...],
                    soc0: jnp.ndarray, eff0: jnp.ndarray, deg0: jnp.ndarray,
                    n_steps: int, hours_ratio: float, ratio: float,
                    n_knots: int = P, record: bool = False,
                    interpret: bool = False):
    """Run a full episode for a (D, B) district batch.

    actions: (T_pad, B) per-step per-building open-loop plan (shared
    across districts); series: 4 x (T_pad, B) float32 (nsl, solar, price,
    carbon), T_pad a multiple of T_CHUNK; state: (D, B).
    Returns (reward_sum, cost_sum, emission_sum, soc, eff, degraded) and,
    with ``record=True``, an extra (N_REC, T_pad, B) per-step stream of
    district 0's (net, raw battery balance, soc).
    """
    D, B = soc0.shape
    nsl, solar, price, carbon = series
    T_pad = nsl.shape[0]
    grid = (D // TILE_D,)

    state_spec = pl.BlockSpec((TILE_D, B), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((D, B), jnp.float32)] * 6
    out_specs = [state_spec] * 6
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((2, T_CHUNK, B), jnp.float32)] * 5 \
        + [pltpu.SemaphoreType.DMA((2, 5))]
    if record:
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((N_REC, T_pad, B), jnp.float32)]
        out_specs = out_specs + [hbm_spec]
        scratch = scratch + [pltpu.VMEM((N_REC, T_CHUNK, B), jnp.float32),
                             pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[hbm_spec] * 5 + [small] * 5 + [state_spec] * 3,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_episode_kernel, n_steps=n_steps,
                               hours_ratio=hours_ratio, ratio=ratio,
                               n_knots=n_knots, record=record)
    pec_x, pec_y, cpc_x, cpc_y = curves
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(actions, nsl, solar, price, carbon, bparams,
      pec_x, pec_y, cpc_x, cpc_y, soc0, eff0, deg0)
