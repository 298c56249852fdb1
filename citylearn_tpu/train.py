"""TPU-native batched SAC training: thousands of vectorized district
instances feeding per-building learners entirely on device.

This is the scale-out replacement for the reference's share-nothing
process-pool/SLURM fan-out (``__main__.py:31-67``, ``tacc_job.sh``): env
batch data-parallel over devices (`jax.sharding`), per-building agent
stacks vmapped, replay in HBM, and the whole
collect -> store -> sample -> update loop under one ``lax.scan``.

Design points vs the reference's per-building torch SAC
(``citylearn/agents/sac.py:56-165``):

- **Every district's experience is learned from.** The replay buffer is
  laid out ``(S, D, A, ...)`` — S slots x D districts x A agents — and
  each env step writes all D districts' transitions with one fully
  local ``dynamic_update_slice`` (districts are the sharded axis, so no
  cross-device traffic on the store path). Sampling draws uniform
  (slot, district) pairs.
- **Districts are de-correlated.** Policy/exploration noise is already
  per-district (the RNG shapes carry the district axis); in addition,
  when the dataset's simulation range exceeds the episode length every
  district gets its own seeded episode window offset, redrawn on its own
  (per-district, not lockstep) reset — the batched analog of the
  reference's rolling/random ``EpisodeTracker`` splits (``base.py:76-129``).
- **Heterogeneous districts train on-device.** Buildings with different
  observation/action subsets are stacked by padding: encoder specs pad
  to a common width with constant-zero slots, actions pad to a common
  width with a per-building mask (masked out of the tanh-Gaussian
  log-prob and forced to 0 before reaching the env). Per-building action
  routing — including per-charger EV actions and washing-machine
  triggers — is a static one-hot einsum, MXU-friendly.

Differences from the host-loop :class:`citylearn_tpu.agents.sac.SAC`
(which mirrors the reference step-for-step): replay standardization is
replaced with encoder-normalized observations and constant reward
scaling, and exploration is uniform-random for a fixed warm-up — choices
that keep the training step shape-static and fully fused.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from citylearn_tpu.agents.sac import (
    AgentNets,
    _policy_init,
    _policy_sample,
    _q_apply,
    _q_init,
)
from citylearn_tpu.compiler.schema import compile_schema
from citylearn_tpu.core.obs_encoder import (
    build_encoder_spec,
    encode_obs,
    pad_encoder_specs,
)
from citylearn_tpu.core.params import initial_state, pack
from citylearn_tpu.core.rollout import ACTION_KEYS


class TrainConfig(NamedTuple):
    n_districts: int = 256
    hidden: tuple = (256, 256)
    lr: float = 3e-4
    discount: float = 0.99
    tau: float = 5e-3
    alpha: float = 0.2
    batch_size: int = 256
    replay_capacity: int = 100_000      # total transitions (rounded to D slots)
    warmup_steps: int = 100
    reward_scale: float = 0.2
    updates_per_step: int = 1
    # closed-loop collect path: "auto" routes eligible configs (battery+PV
    # family, D % 128 == 0) to the chunked Pallas collect
    # (ops/pallas_collect.py); "scan" forces the per-step XLA scan;
    # "kernel" asserts eligibility
    collect: str = "auto"
    collect_chunk: int = 64             # env steps fused per kernel chunk


class TrainState(NamedTuple):
    env_state: object                 # (D, ...) district states
    nets: AgentNets                   # stacked over agent axis A
    replay_obs: jnp.ndarray           # (S, D, A, K)
    replay_act: jnp.ndarray           # (S, D, A, M)
    replay_rew: jnp.ndarray           # (S, D, A)
    replay_next: jnp.ndarray          # (S, D, A, K)
    replay_done: jnp.ndarray          # (S, D)
    replay_pos: jnp.ndarray           # scalar int32 slot index
    replay_full: jnp.ndarray          # scalar bool
    key: jnp.ndarray
    step: jnp.ndarray
    # encoded observations of env_state, carried so the fused train step
    # encodes ONCE per step instead of twice (next_obs(t) == obs(t+1)
    # except on per-district resets, re-encoded under a rare lax.cond);
    # None for subclasses that manage their own observation flow
    cur_obs: jnp.ndarray = None


class BatchedSAC:
    """Vectorized SAC over ``n_districts`` instances of one dataset."""

    extra_obs_dim = 0      # extra policy-input dims appended by subclasses
                           # (BatchedMARLISA's coordination variables)

    def __init__(self, schema, cfg: TrainConfig = TrainConfig(), seed: int = 0,
                 mesh: Optional["jax.sharding.Mesh"] = None, **schema_kwargs):
        self.cfg = cfg
        schema_kwargs.setdefault("central_agent", False)
        self.spec = compile_schema(schema, **schema_kwargs)
        assert not self.spec.central_agent, \
            "BatchedSAC trains per-building agents (decentralized); " \
            "central-agent control uses the host-loop SAC"
        self.env_cfg, self.params, self.layout = pack(self.spec)
        B = self.env_cfg.n_buildings

        # --- observations: pad per-building encoders to a common width ---
        enc = pad_encoder_specs(
            [build_encoder_spec(self.spec, self.layout, i) for i in range(B)])
        self.enc_dim = int(enc[0].src.shape[0])
        self.obs_dim = self.enc_dim + self.extra_obs_dim
        self.enc_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *enc)

        # --- actions: pad to a common width + mask; route each (building,
        # slot) to its env action (building-level key, charger or WM) ---
        names = [list(b.active_actions) for b in self.spec.buildings]
        M = max(len(n) for n in names)
        self.act_dim = M
        C = self.env_cfg.n_chargers
        W = self.env_cfg.n_washing_machines
        act_low = np.zeros((B, M), np.float32)
        act_high = np.zeros((B, M), np.float32)
        act_mask = np.zeros((B, M), np.float32)
        w_bld = np.zeros((B, M, len(ACTION_KEYS)), np.float32)
        w_ch = np.zeros((B, M, max(C, 1)), np.float32)
        w_wm = np.zeros((B, M, max(W, 1)), np.float32)
        ch_slot = {}
        c = 0
        for b in self.spec.buildings:
            for ch in b.chargers:
                ch_slot[(b.index, f"electric_vehicle_storage_{ch.charger_id}")] = c
                c += 1
        wm_slot = {}
        w = 0
        for b in self.spec.buildings:
            for wm in b.washing_machines:
                wm_slot[(b.index, wm.name)] = w
                w += 1
        for bi, b in enumerate(self.spec.buildings):
            act_low[bi, :len(names[bi])] = np.asarray(b.action_low, np.float32)
            act_high[bi, :len(names[bi])] = np.asarray(b.action_high, np.float32)
            act_mask[bi, :len(names[bi])] = 1.0
            for m, k in enumerate(names[bi]):
                if k in ACTION_KEYS:
                    w_bld[bi, m, ACTION_KEYS.index(k)] = 1.0
                elif (bi, k) in ch_slot:
                    w_ch[bi, m, ch_slot[(bi, k)]] = 1.0
                elif (bi, k) in wm_slot:
                    w_wm[bi, m, wm_slot[(bi, k)]] = 1.0
                else:
                    raise NotImplementedError(f"trainer action routing for {k}")
        self.act_low = jnp.asarray(act_low)
        self.act_high = jnp.asarray(act_high)
        self.act_mask = jnp.asarray(act_mask)
        self.action_scale = (self.act_high - self.act_low) / 2.0
        self.action_bias = (self.act_high + self.act_low) / 2.0
        self.w_bld = jnp.asarray(w_bld)
        self.w_ch = jnp.asarray(w_ch) if C else None
        self.w_wm = jnp.asarray(w_wm) if W else None

        # per-district episode windows: when the dataset's simulation range
        # exceeds the episode length, each district rolls its own seeded
        # window (reference EpisodeTracker splits, base.py:76-129)
        self.max_offset = int(self.spec.simulation_time_steps
                              - self.env_cfg.time_steps)
        if self.env_cfg.has_stochastic_outage:
            # the baked stochastic-outage signal covers the default window
            # only (core/params.py) — shifted windows would read zeros
            self.max_offset = 0

        self.mesh = mesh
        self.optimizer = optax.adam(cfg.lr)
        self._init_state(seed)
        self._train_chunk = jax.jit(self._build_train_chunk(),
                                    static_argnames=("n_steps",))

        # ---- closed-loop kernel collect (battery+PV family) ----
        # env-step phase within the current episode (all districts advance
        # in lockstep: termination is time-driven), tracked host-side so
        # collect chunks can be episode-aligned with static chunk lengths
        self._phase = 0
        self._collect_cache = {}
        self.use_kernel_collect = self._kernel_collect_eligible()
        if cfg.collect == "kernel" and not self.use_kernel_collect:
            raise ValueError(
                "collect='kernel' requires a battery+PV-family config "
                "(rollout_fast.eligible), n_districts % 128 == 0, no mesh "
                "and no coordination observations")
        if self.use_kernel_collect:
            from citylearn_tpu.ops.pallas_collect import (
                prepare_battery_collect,
            )

            self._collect_prep = prepare_battery_collect(self.env_cfg,
                                                         self.params)
            # Pallas TPU kernels have no compiled CPU lowering — interpret
            # there (tests); compile on TPU
            self._collect_interpret = jax.default_backend() == "cpu"
            # whole-range encoded observations, FLATTENED to (T, A * K):
            # the policy input is purely data-driven (obs_static
            # semantics) so it encodes ONCE per trainer — and the (A, K)
            # trailing dims would tile-pad ~7x on TPU (sublane 8 x lane
            # 128), so the big gather/store pipeline carries one wide
            # feature axis instead (the replay obs/next buffers match;
            # see _init_state)
            self._enc_table = jax.jit(lambda tbl: jax.vmap(
                lambda row: jax.vmap(encode_obs)(self.enc_stack, row))(tbl)
            )(self.params.obs_static).reshape(
                self.params.obs_static.shape[0], -1)
            # series pre-transposed to (B, T): per-window gathers then
            # produce (B, K, D) chunks with districts on the lane axis —
            # the kernel's layout — instead of a (…, B)-lane form
            self._series_bt = (
                jnp.transpose(self.params.series.non_shiftable_load),
                jnp.transpose(self.params.series.solar_generation))

    # ------------------------------------------------------------------
    def _draw_offsets(self, key, n):
        if self.max_offset <= 0:
            return jnp.zeros((n,), jnp.int32)
        return jax.random.randint(key, (n,), 0, self.max_offset + 1,
                                  dtype=jnp.int32)

    def _broadcast_initial(self, offsets):
        env0 = initial_state(self.env_cfg, self.params, 0)
        D = offsets.shape[0]
        st = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (D,) + x.shape), env0)
        return st.replace(data_offset=offsets)

    def _init_state(self, seed: int):
        cfg = self.cfg
        B = self.env_cfg.n_buildings
        D = cfg.n_districts
        key = jax.random.PRNGKey(seed)
        key, k_off, *ks = jax.random.split(key, 3 * B + 2)
        q1 = [_q_init(ks[3 * i], self.obs_dim, self.act_dim, list(cfg.hidden))
              for i in range(B)]
        q2 = [_q_init(ks[3 * i + 1], self.obs_dim, self.act_dim, list(cfg.hidden))
              for i in range(B)]
        pi = [_policy_init(ks[3 * i + 2], self.obs_dim, self.act_dim,
                           list(cfg.hidden)) for i in range(B)]
        stack = lambda ts: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ts)
        q1, q2, pi = stack(q1), stack(q2), stack(pi)
        nets = AgentNets(
            q1=q1, q2=q2,
            q1_target=jax.tree_util.tree_map(jnp.array, q1),
            q2_target=jax.tree_util.tree_map(jnp.array, q2),
            policy=pi,
            q1_opt=jax.vmap(self.optimizer.init)(q1),
            q2_opt=jax.vmap(self.optimizer.init)(q2),
            policy_opt=jax.vmap(self.optimizer.init)(pi))

        env_state = self._broadcast_initial(self._draw_offsets(k_off, D))
        S = max(1, cfg.replay_capacity // D)    # replay slots (D rows each)
        A = B
        # obs/next buffers carry ONE flattened (A * K) feature axis: the
        # (A, K) trailing-dim form would tile-pad ~7x on TPU (sublane 8 x
        # lane 128); rows reshape to (A, K) at the update-sample boundary
        self.state = TrainState(
            env_state=env_state, nets=nets,
            replay_obs=jnp.zeros((S, D, A * self.obs_dim), jnp.float32),
            replay_act=jnp.zeros((S, D, A, self.act_dim), jnp.float32),
            replay_rew=jnp.zeros((S, D, A), jnp.float32),
            replay_next=jnp.zeros((S, D, A * self.obs_dim), jnp.float32),
            replay_done=jnp.zeros((S, D), jnp.float32),
            replay_pos=jnp.asarray(0, jnp.int32),
            replay_full=jnp.asarray(False),
            key=key, step=jnp.asarray(0, jnp.int32),
            cur_obs=self._encoded_obs(env_state))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
            self.state = self._shard_state(self.state)
            self.params = jax.device_put(self.params, repl)

    def _shard_state(self, state: "TrainState") -> "TrainState":
        """District batch (and the replay's district axis) over ``dp``;
        everything else replicated. Replay writes are thereby fully local:
        slot s, districts [shard] land on the device that stepped them."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard_d0 = NamedSharding(self.mesh, P("dp"))
        shard_d1 = NamedSharding(self.mesh, P(None, "dp"))
        return state._replace(
            env_state=jax.device_put(state.env_state, shard_d0),
            replay_obs=jax.device_put(state.replay_obs, shard_d1),
            replay_act=jax.device_put(state.replay_act, shard_d1),
            replay_rew=jax.device_put(state.replay_rew, shard_d1),
            replay_next=jax.device_put(state.replay_next, shard_d1),
            replay_done=jax.device_put(state.replay_done, shard_d1),
            cur_obs=(None if state.cur_obs is None else
                     jax.device_put(state.cur_obs, shard_d0)))

    # ------------------------------------------------------------------
    def _encoded_obs(self, env_state):
        """(D, A, K) encoded observations at the current step (the
        returned-observation semantics: the data-driven obs_static row)."""
        tau = env_state.data_offset + env_state.t          # (D,)
        rows = jnp.take(self.params.obs_static, tau, axis=0)  # (D, B, K_union)
        return jax.vmap(lambda e, col: encode_obs(e, col),
                        in_axes=(0, 1), out_axes=1)(self.enc_stack, rows)

    def _actions_dict(self, a_env):
        """(D, A, M) padded masked actions -> the step's action dict, via
        static one-hot routing tensors (building keys / chargers / WMs)."""
        bld = jnp.einsum("dam,amk->kda", a_env, self.w_bld)
        out = {k: bld[i] for i, k in enumerate(ACTION_KEYS)}
        if self.w_ch is not None:
            out["electric_vehicle_storage"] = jnp.einsum(
                "dam,amc->dc", a_env, self.w_ch)
        if self.w_wm is not None:
            out["washing_machine"] = jnp.einsum("dam,amw->dw", a_env, self.w_wm)
        return out

    def _make_update_agent(self):
        """One SAC gradient step for one agent's stacked nets — shared by
        BatchedSAC and BatchedMARLISA (shape-polymorphic over the
        observation width)."""
        cfg = self.cfg

        def update_agent(nets_i, batch, key, scale, bias, mask):
            o, a, r, n, d = batch
            k1, k2 = jax.random.split(key)
            new_next_a, new_log_pi, _ = _policy_sample(nets_i.policy, n, k1,
                                                       scale, bias, mask)
            tq = jnp.minimum(_q_apply(nets_i.q1_target, n, new_next_a),
                             _q_apply(nets_i.q2_target, n, new_next_a)) \
                - cfg.alpha * new_log_pi
            q_target = jax.lax.stop_gradient(
                r[:, None] + (1 - d[:, None]) * cfg.discount * tq)

            def q_loss(qp):
                return optax.huber_loss(_q_apply(qp, o, a), q_target).mean()

            g1 = jax.grad(q_loss)(nets_i.q1)
            g2 = jax.grad(q_loss)(nets_i.q2)
            u1, q1_opt = self.optimizer.update(g1, nets_i.q1_opt, nets_i.q1)
            q1 = optax.apply_updates(nets_i.q1, u1)
            u2, q2_opt = self.optimizer.update(g2, nets_i.q2_opt, nets_i.q2)
            q2 = optax.apply_updates(nets_i.q2, u2)

            def pi_loss(pp):
                na, lp, _ = _policy_sample(pp, o, k2, scale, bias, mask)
                q = jnp.minimum(_q_apply(q1, o, na), _q_apply(q2, o, na))
                return (cfg.alpha * lp - q).mean()

            gp = jax.grad(pi_loss)(nets_i.policy)
            up, policy_opt = self.optimizer.update(gp, nets_i.policy_opt,
                                                   nets_i.policy)
            policy = optax.apply_updates(nets_i.policy, up)
            polyak = lambda t_, s: jax.tree_util.tree_map(
                lambda a_, b_: a_ * (1 - cfg.tau) + b_ * cfg.tau, t_, s)
            return nets_i._replace(
                q1=q1, q2=q2, policy=policy,
                q1_target=polyak(nets_i.q1_target, q1),
                q2_target=polyak(nets_i.q2_target, q2),
                q1_opt=q1_opt, q2_opt=q2_opt, policy_opt=policy_opt)

        return update_agent

    def _build_train_chunk(self):
        cfg = self.cfg
        env_cfg = self.env_cfg
        D = cfg.n_districts
        A = env_cfg.n_buildings

        from citylearn_tpu.core.step import district_step
        vstep = jax.vmap(functools.partial(district_step, env_cfg),
                         in_axes=(None, 0, 0))
        sample_policy = jax.vmap(_policy_sample, in_axes=(0, 1, 0, 0, 0, 0),
                                 out_axes=(1, 1, 1))

        vupdate = jax.vmap(self._make_update_agent(),
                           in_axes=(0, 1, 0, 0, 0, 0))

        def one_step(ts: TrainState, _):
            key, k_act, k_expl, k_sample, k_upd, k_reset = \
                jax.random.split(ts.key, 6)
            obs = ts.cur_obs                                   # (D, A, K)

            a_pi, _, _ = sample_policy(ts.nets.policy, obs,
                                       jax.random.split(k_act, A),
                                       self.action_scale, self.action_bias,
                                       self.act_mask)
            a_rand = jax.random.uniform(
                k_expl, a_pi.shape, minval=self.act_low, maxval=self.act_high)
            explore = ts.step < cfg.warmup_steps
            a_env = jnp.where(explore, a_rand, a_pi)

            env_state, out = vstep(self.params, ts.env_state,
                                   self._actions_dict(a_env))
            reward = out.reward * cfg.reward_scale             # (D, A)
            next_obs = self._encoded_obs(env_state)

            # per-district episode auto-reset with a freshly drawn window
            terminated = env_state.t >= env_cfg.time_steps - 1   # (D,)
            env_reset = self._broadcast_initial(
                self._draw_offsets(k_reset, D))
            pick_reset = lambda cur, res: jnp.where(
                terminated.reshape((D,) + (1,) * (cur.ndim - 1)), res, cur)
            env_state = jax.tree_util.tree_map(pick_reset, env_state, env_reset)
            # next iteration's obs: identical to next_obs except for the
            # (rare) reset districts, re-encoded only when one terminated
            cur_obs_next = jax.lax.cond(
                jnp.any(terminated),
                lambda: jnp.where(terminated[:, None, None],
                                  self._encoded_obs(env_state), next_obs),
                lambda: next_obs)

            # store EVERY district's transition at the current slot —
            # one local dynamic_update_slice on the sharded district axis
            slot = ts.replay_pos
            store = lambda buf, val: buf.at[slot].set(val)
            S = ts.replay_done.shape[0]
            ts = ts._replace(
                replay_obs=store(ts.replay_obs, obs.reshape(D, -1)),
                replay_act=store(ts.replay_act, a_env),
                replay_rew=store(ts.replay_rew, reward),
                replay_next=store(ts.replay_next, next_obs.reshape(D, -1)),
                replay_done=store(ts.replay_done,
                                  terminated.astype(jnp.float32)),
                replay_pos=(slot + 1) % S,
                replay_full=ts.replay_full | (slot + 1 >= S))

            # SAC updates once the buffer has a batch
            slots_avail = jnp.where(ts.replay_full, S, ts.replay_pos)
            can_update = (slots_avail * D >= cfg.batch_size) & ~explore

            def do_update(nets):
                ks1, ks2 = jax.random.split(k_sample)
                sel_s = jax.random.randint(ks1, (cfg.batch_size,), 0,
                                           jnp.maximum(slots_avail, 1))
                sel_d = jax.random.randint(ks2, (cfg.batch_size,), 0, D)
                pick = lambda buf: buf[sel_s, sel_d]
                unflat = lambda x: x.reshape(cfg.batch_size, A, -1)
                batch = (unflat(pick(ts.replay_obs)), pick(ts.replay_act),
                         pick(ts.replay_rew),
                         unflat(pick(ts.replay_next)),
                         jnp.broadcast_to(pick(ts.replay_done)[:, None],
                                          (cfg.batch_size, A)))
                return vupdate(nets, batch, jax.random.split(k_upd, A),
                               self.action_scale, self.action_bias,
                               self.act_mask)

            nets = jax.lax.cond(can_update, do_update, lambda n: n, ts.nets)
            ts = ts._replace(env_state=env_state, nets=nets, key=key,
                             step=ts.step + 1, cur_obs=cur_obs_next)
            return ts, jnp.sum(reward)

        def chunk(ts: TrainState, n_steps: int):
            return jax.lax.scan(one_step, ts, None, length=n_steps)

        return chunk

    # ------------------------------------------------------------------
    # closed-loop kernel collect (VERDICT r4 #1): the env-scan collect was
    # 73% of the round-4 train-step cost (tools/profile_train.py); here a
    # K-step chunk runs as ONE batched MXU policy sweep + ONE Pallas
    # recurrence launch (ops/pallas_collect.py), then K interleaved SAC
    # updates. RNG replays the per-step key chain of ``one_step`` exactly,
    # so warmup-phase transitions are bit-identical to the scan path.
    # ------------------------------------------------------------------
    def _kernel_collect_eligible(self) -> bool:
        from citylearn_tpu.core import rollout_fast
        from citylearn_tpu.ops.pallas_collect import DL

        n_shards = (1 if self.mesh is None
                    else int(np.prod(self.mesh.devices.shape)))
        return (self.cfg.collect != "scan"
                and rollout_fast.eligible(self.env_cfg)
                and self.cfg.n_districts % (DL * n_shards) == 0
                and self.extra_obs_dim == 0)

    def _run_collect_kernel(self, es, nsl, sol, soc, eff, deg,
                            first_chunk: bool):
        """One chunked Pallas recurrence launch (d_last layouts). Under a
        dp mesh the launch runs through ``shard_map`` over district
        tiles — share-nothing like the evaluate surfaces' kernel
        dispatch (``rollout_fast._shard_launch``), one collective-free
        launch per device; the rest of the collect program (gathers,
        policy sweep, replay writes) partitions automatically from the
        sharding annotations."""
        from citylearn_tpu.ops.pallas_collect import battery_collect_chunk

        call = functools.partial(
            battery_collect_chunk, self._collect_prep,
            first_chunk=first_chunk, interpret=self._collect_interpret,
            d_last=True)
        if self.mesh is None:
            return call(es, nsl, sol, soc, eff, deg)
        from jax.sharding import PartitionSpec as P

        dlast = P(None, None, "dp")       # (K, B, D) / (B, K, D) streams
        state = P("dp")                   # (D, B) battery state
        return jax.shard_map(
            call, mesh=self.mesh,
            in_specs=(dlast, dlast, dlast, state, state, state),
            out_specs=(dlast, state, state, state),
            check_vma=False)(es, nsl, sol, soc, eff, deg)

    def _get_collect_fn(self, kc: int, first_chunk: bool, do_reset: bool):
        key = (kc, first_chunk, do_reset)
        if key not in self._collect_cache:
            self._collect_cache[key] = jax.jit(
                self._build_collect_fn(kc, first_chunk, do_reset))
        return self._collect_cache[key]

    def _build_collect_fn(self, kc: int, first_chunk: bool, do_reset: bool):
        """One fused collect+update program for a ``kc``-step episode-
        aligned chunk. Semantics vs ``one_step``: the RNG chain, stored
        transitions and battery state are identical (bit-exact during
        warmup); the one deliberate difference is **actor-learner lag** —
        the whole chunk's actions are sampled from the chunk-START policy
        params, then the chunk's ``kc`` updates run (each sampling with
        its own per-step keys), whereas the scan interleaves an update
        after every step. Off-policy SAC is insensitive to this lag
        (tests/test_collect_fast.py)."""
        from citylearn_tpu.agents.sac import _policy_forward

        cfg = self.cfg
        D = cfg.n_districts
        A = self.env_cfg.n_buildings
        M = self.act_dim
        ES = ACTION_KEYS.index("electrical_storage")
        w_es = self.w_bld[:, :, ES]                        # (A, M) one-hot
        done_row = np.zeros((kc,), np.float32)
        if do_reset:
            done_row[-1] = 1.0
        vupdate = jax.vmap(self._make_update_agent(),
                           in_axes=(0, 1, 0, 0, 0, 0))

        run_kernel = functools.partial(
            self._run_collect_kernel, first_chunk=first_chunk)

        def collect(ts: TrainState):
            # -- replay the per-step key chain of one_step --------------
            def key_body(k, _):
                ks = jax.random.split(k, 6)
                return ks[0], ks[1:]
            key_final, per_step = jax.lax.scan(key_body, ts.key, None,
                                               length=kc)   # (kc, 5, 2)
            k_act, k_expl, k_sample, k_upd, k_reset = (
                per_step[:, i] for i in range(5))

            steps = jnp.arange(kc, dtype=jnp.int32)
            off = ts.env_state.data_offset                  # (D,)
            tau = off[None, :] + ts.env_state.t[None, :] + steps[:, None]
            # flat (kc, D, A * K) rows: the replay layout, and the widest
            # (least tile-padded) form for the gather/store pipeline
            obs = jnp.take(self._enc_table, tau, axis=0)

            # -- policy sweep: one batched MLP stack over the chunk;
            # per-agent lane slices of the flat rows feed the matmuls
            # directly (XLA fuses a contiguous slice into the dot) -----
            W = self.obs_dim
            outs = [
                _policy_forward(
                    jax.tree_util.tree_map(lambda x, a=a: x[a],
                                           ts.nets.policy),
                    obs[..., a * W:(a + 1) * W])
                for a in range(A)]
            mean = jnp.stack([m for m, _ in outs], axis=2)  # (kc, D, A, M)
            log_std = jnp.stack([s for _, s in outs], axis=2)
            keys_a = jax.vmap(lambda k: jax.random.split(k, A))(k_act)
            noise = jax.vmap(jax.vmap(
                lambda k: jax.random.normal(k, (D, M))))(keys_a)
            noise = jnp.transpose(noise, (0, 2, 1, 3))      # (kc, D, A, M)
            y_t = jnp.tanh(mean + jnp.exp(log_std) * noise)
            a_pi = (y_t * self.action_scale + self.action_bias) \
                * self.act_mask
            a_rand = jax.vmap(lambda k: jax.random.uniform(
                k, (D, A, M), minval=self.act_low,
                maxval=self.act_high))(k_expl)
            explore = (ts.step + steps) < cfg.warmup_steps  # (kc,)
            a_env = jnp.where(explore[:, None, None, None], a_rand, a_pi)

            # -- env recurrence: per-district series at each window, all
            # streams with districts on the lane axis (d_last) ----------
            es = jnp.einsum("kdam,am->kad", a_env, w_es)    # (kc, B, D)
            nsl = jnp.take(self._series_bt[0], tau, axis=1)  # (B, kc, D)
            sol = jnp.take(self._series_bt[1], tau, axis=1)
            st = ts.env_state
            rew_b, soc, eff, deg = run_kernel(
                es, nsl, sol, st.battery_soc, st.battery_efficiency,
                st.battery_degraded_capacity)
            reward = jnp.transpose(rew_b, (0, 2, 1)) \
                * cfg.reward_scale                          # (kc, D, A)

            # next_obs: the following step's data row (pre-reset at the
            # episode boundary, matching one_step's store semantics)
            tau_last = off + ts.env_state.t + kc            # (D,)
            obs_next_last = jnp.take(self._enc_table, tau_last, axis=0)
            next_obs = jnp.concatenate([obs[1:], obs_next_last[None]], 0)
            unflat = lambda x: x.reshape(x.shape[:-1] + (A, W))

            # -- replay ring writes (chunk-sized, device-local) ---------
            S = ts.replay_done.shape[0]
            slot = ts.replay_pos
            idx = (slot + steps) % S
            done = jnp.broadcast_to(jnp.asarray(done_row)[:, None], (kc, D))
            ts = ts._replace(
                replay_obs=ts.replay_obs.at[idx].set(obs),
                replay_act=ts.replay_act.at[idx].set(a_env),
                replay_rew=ts.replay_rew.at[idx].set(reward),
                replay_next=ts.replay_next.at[idx].set(next_obs),
                replay_done=ts.replay_done.at[idx].set(done),
                replay_pos=(slot + kc) % S,
                replay_full=ts.replay_full | (slot + kc >= S))

            # -- kc interleaved SAC updates (same cadence as one_step;
            # updates may sample any transition of this chunk) ----------
            pos_after = (slot + steps + 1) % S
            full_after = ts.replay_full | (slot + steps + 1 >= S)
            slots_avail = jnp.where(full_after, S, pos_after)
            can_update = (slots_avail * D >= cfg.batch_size) & ~explore

            def upd_body(nets, inp):
                ks_t, ku_t, can, avail = inp

                def do(n):
                    ks1, ks2 = jax.random.split(ks_t)
                    sel_s = jax.random.randint(ks1, (cfg.batch_size,), 0,
                                               jnp.maximum(avail, 1))
                    sel_d = jax.random.randint(ks2, (cfg.batch_size,), 0, D)
                    pick = lambda buf: buf[sel_s, sel_d]
                    batch = (unflat(pick(ts.replay_obs)),
                             pick(ts.replay_act),
                             pick(ts.replay_rew),
                             unflat(pick(ts.replay_next)),
                             jnp.broadcast_to(
                                 pick(ts.replay_done)[:, None],
                                 (cfg.batch_size, A)))
                    return vupdate(n, batch, jax.random.split(ku_t, A),
                                   self.action_scale, self.action_bias,
                                   self.act_mask)

                return jax.lax.cond(can, do, lambda n: n, nets), None

            nets, _ = jax.lax.scan(
                upd_body, ts.nets, (k_sample, k_upd, can_update, slots_avail))

            # -- post-chunk env state + carried observation -------------
            if do_reset:
                env_state = self._broadcast_initial(
                    self._draw_offsets(k_reset[-1], D))
                cur_obs = unflat(jnp.take(self._enc_table,
                                          env_state.data_offset, axis=0))
            else:
                env_state = st.replace(
                    t=st.t + kc, battery_soc=soc, battery_efficiency=eff,
                    battery_degraded_capacity=deg)
                cur_obs = unflat(obs_next_last)
            ts = ts._replace(env_state=env_state, nets=nets, key=key_final,
                             step=ts.step + kc, cur_obs=cur_obs)
            return ts, jnp.sum(reward)

        return collect

    def _train_kernel_chunk(self, n: int) -> float:
        """Run ``n`` env steps through episode-aligned kernel-collect
        chunks; returns the summed (scaled) reward over the chunk."""
        S_ep = self.env_cfg.time_steps - 1
        S_slots = int(self.state.replay_done.shape[0])
        total = 0.0
        left = n
        while left > 0:
            kc = min(left, self.cfg.collect_chunk, S_ep - self._phase,
                     S_slots)
            first = self._phase == 0
            do_reset = self._phase + kc == S_ep
            fn = self._get_collect_fn(kc, first, do_reset)
            self.state, rsum = fn(self.state)
            total += float(rsum)
            self._phase = 0 if do_reset else self._phase + kc
            left -= kc
        return total

    # ------------------------------------------------------------------
    def evaluate(self, n_steps: int = None,
                 baseline_condition: str = "_without_storage",
                 policy=None):
        """In-graph KPI tables for every district under the current
        deterministic policy — one device computation, no host sync per
        step (reference ``citylearn.py:1136-1323`` semantics via
        :mod:`citylearn_tpu.core.evaluate`). Returns
        ``district|<kpi>`` -> (D,) and ``building|<kpi>`` -> (D, B).

        ``policy`` may be a
        :class:`citylearn_tpu.core.evaluate_fast.ScriptedPolicy` (e.g. an
        RBC baseline to compare the learned policy against): on
        kernel-eligible configurations that evaluation runs as ONE
        whole-episode Pallas kernel launch via the
        ``evaluate_districts`` dispatch instead of the XLA scan.

        The jitted evaluator is cached per (n_steps, baseline) with the
        policy parameters as traced inputs, so repeated evaluation during
        training never retraces the episode scan."""
        from citylearn_tpu.core.evaluate import collect_episode, kpi_table

        if policy is not None:
            from citylearn_tpu.core.evaluate import evaluate_districts
            from citylearn_tpu.core.rollout import batched_initial_states
            states = batched_initial_states(self.env_cfg, self.params,
                                            self.cfg.n_districts)
            return evaluate_districts(self.env_cfg, self.params, states,
                                      policy, n_steps, baseline_condition)

        cache_key = (n_steps, baseline_condition)
        if not hasattr(self, "_eval_cache"):
            self._eval_cache = {}
        if cache_key not in self._eval_cache:
            A = self.env_cfg.n_buildings
            S = ((self.env_cfg.time_steps - 1) if n_steps is None
                 else int(n_steps))

            def run(params, states, policy_params, rng):
                def policy_fn(p, st):
                    tau = st.data_offset + st.t
                    row = jnp.take(p.obs_static, tau, axis=0)  # (B, K_union)
                    obs = jax.vmap(lambda e, col: encode_obs(e, col))(
                        self.enc_stack, row)                    # (A, K)
                    if self.extra_obs_dim:
                        # deterministic evaluation without information
                        # sharing: coordination dims evaluate at zero
                        obs = jnp.pad(obs,
                                      ((0, 0), (0, self.extra_obs_dim)))
                    _, _, det = jax.vmap(
                        _policy_sample, in_axes=(0, 0, 0, 0, 0, 0))(
                        policy_params, obs, jax.random.split(rng, A),
                        self.action_scale, self.action_bias, self.act_mask)
                    acts = self._actions_dict(det[None, :, :])
                    return {k: v[0] for k, v in acts.items()}

                def one(state):
                    st, collected = collect_episode(self.env_cfg, params,
                                                    state, policy_fn, S)
                    return kpi_table(self.env_cfg, params, collected,
                                     state.data_offset + state.t,
                                     baseline_condition, final_state=st)

                return jax.vmap(one)(states)

            self._eval_cache[cache_key] = jax.jit(run)

        base_state = getattr(self.state, "base", self.state)
        fresh = self._broadcast_initial(
            self._draw_offsets(jax.random.fold_in(base_state.key, 1),
                               self.cfg.n_districts))
        return self._eval_cache[cache_key](
            self.params, fresh, base_state.nets.policy,
            jax.random.fold_in(base_state.key, 0))

    # ------------------------------------------------------------------
    def train(self, n_steps: int, chunk: int = 200):
        """Run ``n_steps`` env steps of collect+update; returns mean reward
        per chunk. Battery+PV-family configs route to the chunked Pallas
        collect (``use_kernel_collect``); others run the per-step scan."""
        history = []
        remaining = n_steps
        while remaining > 0:
            n = min(chunk, remaining)
            if self.use_kernel_collect:
                history.append(self._train_kernel_chunk(n) / n)
            else:
                self.state, rewards = self._train_chunk(self.state, n_steps=n)
                history.append(float(jnp.mean(rewards)))
            remaining -= n
        return history

    def save(self, path: str):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, self.state.nets), f)

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            nets = pickle.load(f)
        self.state = self.state._replace(
            nets=jax.tree_util.tree_map(jnp.asarray, nets))

    # ------------------------------------------------------------------
    # full-state checkpointing (learner + env + replay + RNG + step) —
    # the reference only pickles agents (__main__.py:291-298); resumable
    # large-scale training needs the whole TrainState (SURVEY.md §5.4)
    # ------------------------------------------------------------------
    @staticmethod
    def _placeholder_empties(tree):
        # orbax refuses zero-size arrays (e.g. (D, 0) EV leaves on
        # EV-less datasets); swap them for a scalar placeholder
        return jax.tree_util.tree_map(
            lambda x: x if x.size else np.zeros((1,), x.dtype), tree)

    def save_checkpoint(self, directory: str):
        """Write the complete :class:`TrainState` with orbax; bit-exact
        resume via :meth:`restore_checkpoint`."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(directory)
        state_np = jax.tree_util.tree_map(np.asarray, self.state)
        ocp.PyTreeCheckpointer().save(path, self._placeholder_empties(state_np))

    def restore_checkpoint(self, directory: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(directory)
        template = jax.tree_util.tree_map(np.asarray, self.state)
        try:
            restored = ocp.PyTreeCheckpointer().restore(
                path, item=self._placeholder_empties(template))
        except (ValueError, KeyError):
            # checkpoints written before the carried-observation field
            # (cur_obs) existed restore against the old structure; the
            # carried obs is derived state and re-encodes from env_state
            old = self.state._replace(cur_obs=None)
            template_old = jax.tree_util.tree_map(np.asarray, old)
            restored = ocp.PyTreeCheckpointer().restore(
                path, item=self._placeholder_empties(template_old))
            restored = restored._replace(
                cur_obs=np.asarray(self._encoded_obs(restored.env_state)))
        # zero-size leaves come back from the template, not the placeholder
        self.state = jax.tree_util.tree_map(
            lambda cur, new: jnp.asarray(cur if cur.size == 0 else new),
            template, restored)
        # re-sync the host-side episode phase for the kernel-collect path
        # (districts advance in lockstep, so any row's t is THE phase)
        self._phase = int(np.asarray(self.state.env_state.t).ravel()[0])
        if self.mesh is not None:
            self.state = self._shard_state(self.state)
