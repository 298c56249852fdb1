"""TPU-native batched SAC training: thousands of vectorized district
instances feeding per-building learners entirely on device.

This is the scale-out replacement for the reference's share-nothing
process-pool/SLURM fan-out (``__main__.py:31-67``, ``tacc_job.sh``): env
batch data-parallel over devices (`jax.sharding`), per-building agent
stacks vmapped, replay in HBM, and the whole
collect -> store -> sample -> update loop under one ``lax.scan``.

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
from citylearn_tpu.core.obs_encoder import build_encoder_spec, encode_obs
from citylearn_tpu.core.params import initial_state, pack
from citylearn_tpu.core.rollout import ACTION_KEYS
from citylearn_tpu.core.step import district_step


class TrainConfig(NamedTuple):
    n_districts: int = 256
    hidden: tuple = (256, 256)
    lr: float = 3e-4
    discount: float = 0.99
    tau: float = 5e-3
    alpha: float = 0.2
    batch_size: int = 256
    replay_capacity: int = 100_000
    warmup_steps: int = 100
    reward_scale: float = 0.2
    updates_per_step: int = 1


class TrainState(NamedTuple):
    env_state: object                 # (D, ...) district states
    nets: AgentNets                   # stacked over agent axis A
    replay_obs: jnp.ndarray           # (cap, A, K)
    replay_act: jnp.ndarray           # (cap, A, M)
    replay_rew: jnp.ndarray           # (cap, A)
    replay_next: jnp.ndarray          # (cap, A, K)
    replay_done: jnp.ndarray          # (cap,)
    replay_pos: jnp.ndarray           # scalar int32
    replay_full: jnp.ndarray          # scalar bool
    key: jnp.ndarray
    step: jnp.ndarray


class BatchedSAC:
    """Vectorized SAC over ``n_districts`` copies of one dataset."""

    def __init__(self, schema, cfg: TrainConfig = TrainConfig(), seed: int = 0,
                 mesh: Optional["jax.sharding.Mesh"] = None, **schema_kwargs):
        self.cfg = cfg
        self.spec = compile_schema(schema, **schema_kwargs)
        self.env_cfg, self.params, self.layout = pack(self.spec)
        B = self.env_cfg.n_buildings

        self.enc = [build_encoder_spec(self.spec, self.layout, i)
                    for i in range(B)]
        dims = {e.src.shape[0] for e in self.enc}
        acts = {len(b.active_actions) for b in self.spec.buildings}
        assert len(dims) == 1 and len(acts) == 1, \
            "batched trainer requires uniform building obs/action dims; " \
            "heterogeneous districts train via the host-loop SAC agent"
        self.obs_dim = dims.pop()
        self.act_dim = acts.pop()
        self.enc_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *self.enc)
        self.act_low = jnp.asarray(np.stack(
            [np.asarray(b.action_low, np.float32) for b in self.spec.buildings]))
        self.act_high = jnp.asarray(np.stack(
            [np.asarray(b.action_high, np.float32) for b in self.spec.buildings]))
        self.action_scale = (self.act_high - self.act_low) / 2.0
        self.action_bias = (self.act_high + self.act_low) / 2.0
        # action names -> step-dict mapping (storage/device only here)
        self.action_slots = []
        for k in self.spec.buildings[0].active_actions:
            assert k in ACTION_KEYS, f"trainer does not support action {k}"
            self.action_slots.append(ACTION_KEYS.index(k))
        self.mesh = mesh
        self.optimizer = optax.adam(cfg.lr)
        self._init_state(seed)
        self._train_chunk = jax.jit(self._build_train_chunk(),
                                    static_argnames=("n_steps",))

    # ------------------------------------------------------------------
    def _init_state(self, seed: int):
        cfg = self.cfg
        B = self.env_cfg.n_buildings
        key = jax.random.PRNGKey(seed)
        key, *ks = jax.random.split(key, 3 * B + 1)
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

        env0 = initial_state(self.env_cfg, self.params, 0)
        env_state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (cfg.n_districts,) + x.shape), env0)
        cap = cfg.replay_capacity
        A = B
        self.state = TrainState(
            env_state=env_state, nets=nets,
            replay_obs=jnp.zeros((cap, A, self.obs_dim), jnp.float32),
            replay_act=jnp.zeros((cap, A, self.act_dim), jnp.float32),
            replay_rew=jnp.zeros((cap, A), jnp.float32),
            replay_next=jnp.zeros((cap, A, self.obs_dim), jnp.float32),
            replay_done=jnp.zeros((cap,), jnp.float32),
            replay_pos=jnp.asarray(0, jnp.int32),
            replay_full=jnp.asarray(False),
            key=key, step=jnp.asarray(0, jnp.int32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
            self.state = self._shard_state(self.state)
            self.params = jax.device_put(self.params, repl)

    def _shard_state(self, state: "TrainState") -> "TrainState":
        """District batch over ``dp``; everything else replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(self.mesh, P("dp"))
        return state._replace(env_state=jax.device_put(state.env_state, shard))

    # ------------------------------------------------------------------
    def _encoded_obs(self, env_state):
        """(D, A, K) encoded observations at the current step (the
        returned-observation semantics: the data-driven obs_static row)."""
        tau = env_state.data_offset + env_state.t          # (D,)
        rows = jnp.take(self.params.obs_static, tau, axis=0)  # (D, B, K_union)
        return jax.vmap(lambda e, col: encode_obs(e, col),
                        in_axes=(0, 1), out_axes=1)(self.enc_stack, rows)

    def _actions_dict(self, a_env):
        """(D, A, M) env-scaled actions -> the step's action dict."""
        D = a_env.shape[0]
        zero = jnp.zeros((D, self.env_cfg.n_buildings), jnp.float32)
        out = {k: zero for k in ACTION_KEYS}
        for m, slot in enumerate(self.action_slots):
            out[ACTION_KEYS[slot]] = a_env[:, :, m]
        return out

    def _build_train_chunk(self):
        cfg = self.cfg
        env_cfg = self.env_cfg
        D = cfg.n_districts
        A = env_cfg.n_buildings
        cap = cfg.replay_capacity

        vstep = jax.vmap(functools.partial(district_step, env_cfg),
                         in_axes=(None, 0, 0))
        sample_policy = jax.vmap(_policy_sample, in_axes=(0, 1, 0, 0, 0),
                                 out_axes=(1, 1, 1))

        def update_agent(nets_i, batch, key, scale, bias):
            o, a, r, n, d = batch
            k1, k2 = jax.random.split(key)
            new_next_a, new_log_pi, _ = _policy_sample(nets_i.policy, n, k1,
                                                       scale, bias)
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
                na, lp, _ = _policy_sample(pp, o, k2, scale, bias)
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

        vupdate = jax.vmap(update_agent, in_axes=(0, 1, 0, 0, 0))

        def one_step(ts: TrainState, _):
            key, k_act, k_expl, k_sample, k_upd = jax.random.split(ts.key, 5)
            obs = self._encoded_obs(ts.env_state)              # (D, A, K)

            a_pi, _, _ = sample_policy(ts.nets.policy, obs,
                                       jax.random.split(k_act, A),
                                       self.action_scale, self.action_bias)
            a_rand = jax.random.uniform(
                k_expl, a_pi.shape, minval=self.act_low, maxval=self.act_high)
            explore = ts.step < cfg.warmup_steps
            a_env = jnp.where(explore, a_rand, a_pi)

            env_state, out = vstep(self.params, ts.env_state,
                                   self._actions_dict(a_env))
            reward = out.reward * cfg.reward_scale             # (D, A)
            next_obs = self._encoded_obs(env_state)

            # episode auto-reset when the batch terminates (lockstep)
            terminated = env_state.t[0] >= env_cfg.time_steps - 1
            env0 = initial_state(env_cfg, self.params, 0)
            env_reset = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (D,) + x.shape), env0)
            env_state = jax.tree_util.tree_map(
                lambda a_, b_: jnp.where(terminated, b_, a_), env_state, env_reset)

            # store district 0's transition (all districts are identical
            # copies here; per-district replay would multiply memory D-fold)
            idx = ts.replay_pos
            store = lambda buf, val: buf.at[idx].set(val)
            ts = ts._replace(
                replay_obs=store(ts.replay_obs, obs[0]),
                replay_act=store(ts.replay_act, a_env[0]),
                replay_rew=store(ts.replay_rew, reward[0]),
                replay_next=store(ts.replay_next, next_obs[0]),
                replay_done=store(ts.replay_done,
                                  terminated.astype(jnp.float32)),
                replay_pos=(idx + 1) % cap,
                replay_full=ts.replay_full | (idx + 1 >= cap))

            # SAC updates once the buffer has a batch
            n_avail = jnp.where(ts.replay_full, cap, ts.replay_pos)
            can_update = (n_avail >= cfg.batch_size) & ~explore

            def do_update(nets):
                sel = jax.random.randint(k_sample, (cfg.batch_size,), 0,
                                         jnp.maximum(n_avail, 1))
                batch = (ts.replay_obs[sel], ts.replay_act[sel],
                         ts.replay_rew[sel], ts.replay_next[sel],
                         jnp.broadcast_to(ts.replay_done[sel, None],
                                          (cfg.batch_size, A)))
                return vupdate(nets, batch, jax.random.split(k_upd, A),
                               self.action_scale, self.action_bias)

            nets = jax.lax.cond(can_update, do_update, lambda n: n, ts.nets)
            ts = ts._replace(env_state=env_state, nets=nets, key=key,
                             step=ts.step + 1)
            return ts, jnp.sum(reward)

        def chunk(ts: TrainState, n_steps: int):
            return jax.lax.scan(one_step, ts, None, length=n_steps)

        return chunk

    # ------------------------------------------------------------------
    def train(self, n_steps: int, chunk: int = 200):
        """Run ``n_steps`` env steps of collect+update; returns mean reward
        per chunk."""
        history = []
        remaining = n_steps
        while remaining > 0:
            n = min(chunk, remaining)
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
        restored = ocp.PyTreeCheckpointer().restore(
            path, item=self._placeholder_empties(template))
        # zero-size leaves come back from the template, not the placeholder
        self.state = jax.tree_util.tree_map(
            lambda cur, new: jnp.asarray(cur if cur.size == 0 else new),
            template, restored)
        if self.mesh is not None:
            self.state = self._shard_state(self.state)
