"""Vectorized episode rollouts: ``lax.scan`` over time, ``vmap`` over
district instances — the TPU-native replacement for the reference's
Python step loop (``citylearn/citylearn.py:978``) and its share-nothing
process-pool scale-out (``__main__.py:31-67``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from citylearn_tpu.core.params import initial_state
from citylearn_tpu.core.step import district_step
from citylearn_tpu.core.types import DistrictParams, EnvState, StaticConfig

ACTION_KEYS = ("cooling_storage", "heating_storage", "dhw_storage",
               "electrical_storage", "cooling_device", "heating_device",
               "cooling_or_heating_device")


def actions_dict_from_array(arr: jnp.ndarray, keys=ACTION_KEYS) -> Dict[str, jnp.ndarray]:
    """(A, B) action stack -> name dict (A = len(keys))."""
    return {k: arr[i] for i, k in enumerate(keys)}


def rollout_scripted(cfg: StaticConfig, params: DistrictParams, state: EnvState,
                     action_series: jnp.ndarray,
                     collect: bool = False) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Run ``action_series`` of shape (S, A, B) through S steps.

    With ``collect=False`` only O(1)-memory reductions are carried
    (sum of rewards, KPI accumulators); with ``collect=True`` the
    (S, B) net/cost/emission/reward series are stacked for host-side KPI
    evaluation. The reference needs T Python iterations; here the whole
    episode is one fused XLA loop.
    """
    def body(carry, actions_t):
        st, reward_sum = carry
        st, out = district_step(cfg, params, st, actions_dict_from_array(actions_t))
        reward_sum = reward_sum + out.reward
        if collect:
            ys = {
                "net": out.net_electricity_consumption,
                "cost": out.net_electricity_consumption_cost,
                "emission": out.net_electricity_consumption_emission,
                "reward": out.reward,
                "battery_soc": out.battery_soc,
            }
        else:
            ys = None
        return (st, reward_sum), ys

    n_reward = 1 if cfg.central_agent else cfg.n_buildings
    init = (state, jnp.zeros((n_reward,), jnp.float32))
    (state, reward_sum), ys = jax.lax.scan(body, init, action_series)
    result = {"reward_sum": reward_sum}
    if collect:
        result.update(ys)
    return state, result


def make_scripted_episode_fn(cfg: StaticConfig, collect: bool = False):
    """jit-compiled full-episode runner: (params, state, (S, A, B) actions)."""
    return jax.jit(functools.partial(rollout_scripted, cfg, collect=collect),
                   static_argnames=())


def rollout_policy(cfg: StaticConfig, params: DistrictParams, state: EnvState,
                   n_steps: int, policy: Callable) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Closed-loop rollout with an in-graph policy.

    ``policy(params, state) -> Dict[str, (B,)]`` computes this step's
    actions from the current state (e.g. hour-indexed RBC table lookups).
    No host round-trips and no precomputed action tensors — the policy and
    the env fuse into one XLA loop.
    """
    def body(carry, _):
        st, reward_sum = carry
        st, out = district_step(cfg, params, st, policy(params, st))
        return (st, reward_sum + out.reward), None

    n_reward = 1 if cfg.central_agent else cfg.n_buildings
    init = (state, jnp.zeros((n_reward,), jnp.float32))
    (state, reward_sum), _ = jax.lax.scan(body, init, None, length=n_steps)
    return state, {"reward_sum": reward_sum}


def hour_rbc_policy(table: jnp.ndarray, action_key: str = "electrical_storage"):
    """Hour-indexed RBC (reference ``agents/rbc.py:80-137``): a static
    (24,) action table gathered by the hour series."""
    def policy(params: DistrictParams, state: EnvState) -> Dict[str, jnp.ndarray]:
        tau = state.data_offset + state.t
        hour = jnp.take(params.series.hour, tau, axis=0)        # (B,) 1-24
        act = jnp.take(table, hour - 1)
        B = hour.shape[0]
        zero = jnp.zeros((B,), jnp.float32)
        return {k: (act if k == action_key else zero) for k in ACTION_KEYS}
    return policy


#: Largest district batch the XLA-compiled EV/charger episode scan may
#: run per launch on TPU. The compiled scan program for charger-bearing
#: configs hard-crashes the TPU worker (kernel fault) at D >= 2048 — an
#: XLA/TPU-runtime bug in its gather/scatter-heavy program, bisected with
#: ``tools/ev_repro.py`` (D <= 1024 and the Pallas EV kernel at any D run
#: clean). Larger batches are transparently chunked (VERDICT r4 #6).
EV_SCAN_SAFE_D = 1024

#: Same class of XLA/TPU-runtime kernel fault for LARGE LSTM-dynamics
#: scan programs: the 100-building ca_alameda year scan crashes the
#: worker at D = 512 (D = 256 runs clean; the Pallas neighborhood kernel
#: runs D >= 1024 clean). Guards every >= 20-building dynamics config
#: (the five neighborhood-family datasets).
DYN_SCAN_SAFE_D = 256


def _ev_scan_chunked(cfg: StaticConfig, n_districts: int) -> bool:
    """Chunk the vmapped episode scan on TPU for configs whose compiled
    program is known to hard-crash the worker at large batches."""
    if jax.default_backend() != "tpu":
        return False
    if cfg.has_evs and n_districts > EV_SCAN_SAFE_D:
        return True
    return (cfg.has_dynamics and cfg.n_buildings >= 20
            and n_districts > DYN_SCAN_SAFE_D)


def _scan_safe_chunk(cfg: StaticConfig) -> int:
    if cfg.has_dynamics and cfg.n_buildings >= 20:
        return DYN_SCAN_SAFE_D
    return EV_SCAN_SAFE_D


def rollout_districts(cfg: StaticConfig, params: DistrictParams,
                      states: EnvState, n_steps: int, policy: Callable
                      ) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Batched closed-loop episode rollout over a (D, ...) state batch —
    the library-level entry point for large vmapped scans.

    On TPU, charger-bearing (EV) and large LSTM-dynamics configurations
    are chunked to a safe per-launch district count with a warning (see
    ``EV_SCAN_SAFE_D`` / ``DYN_SCAN_SAFE_D``); everything else runs as
    one launch."""
    D = states.t.shape[0]
    fn = jax.jit(jax.vmap(
        lambda p, s: rollout_policy(cfg, p, s, n_steps, policy),
        in_axes=(None, 0)))
    if not _ev_scan_chunked(cfg, D):
        return fn(params, states)

    import warnings

    chunk = _scan_safe_chunk(cfg)
    warnings.warn(
        f"chunking the EV episode scan into {chunk}-district launches: "
        "the XLA-compiled charger/neighborhood scan program crashes the "
        "TPU worker at larger batches (tools/ev_repro.py); the Pallas "
        "kernel paths (core/rollout_fast) have no such limit",
        RuntimeWarning, stacklevel=2)
    outs = []
    for lo in range(0, D, chunk):
        hi = min(lo + chunk, D)
        sub = jax.tree_util.tree_map(lambda x: x[lo:hi], states)
        outs.append(fn(params, sub))
    cat = lambda *xs: jnp.concatenate(xs, axis=0)
    return (jax.tree_util.tree_map(cat, *[o[0] for o in outs]),
            jax.tree_util.tree_map(cat, *[o[1] for o in outs]))


def make_batched_episode_fn(cfg: StaticConfig):
    """vmap over a leading district axis: states (D, ...), actions (D, S, A, B).

    ``params`` (driver data) is shared — broadcast once in HBM, not per
    district — which is what makes thousands of vectorized districts fit.
    """
    fn = functools.partial(rollout_scripted, cfg, collect=False)
    return jax.jit(jax.vmap(fn, in_axes=(None, 0, 0)))


def batched_initial_states(cfg: StaticConfig, params: DistrictParams,
                           n_districts: int, data_offset: int = 0,
                           outage_rebaked: bool = False) -> EnvState:
    """(D, ...) stacked initial states for ``make_batched_episode_fn``.

    Stochastic-outage datasets bake their signal for the default episode
    window only (rows [0, episode_steps) of the sim range); for a shifted
    window, rebake first —

        params = rebake_outage(spec, cfg, params, data_offset)

    (:func:`citylearn_tpu.core.params.rebake_outage`) and pass
    ``outage_rebaked=True``; without it a nonzero offset would silently
    read all-zero outage signals and is rejected."""
    if cfg.has_stochastic_outage and data_offset != 0 and not outage_rebaked:
        raise ValueError(
            "batched rollouts of stochastic-outage datasets at a shifted "
            "window need the signal rebaked for that window: params = "
            "rebake_outage(spec, cfg, params, data_offset) "
            "(core/params.py), then pass outage_rebaked=True")
    s = initial_state(cfg, params, data_offset)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_districts,) + x.shape), s)
