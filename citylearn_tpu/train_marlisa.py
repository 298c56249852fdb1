"""TPU-native batched MARLISA: the sequential information-sharing
coordination ring (reference ``citylearn/agents/marlisa.py:298-331``)
re-designed as a ``lax.scan`` over the agent axis, vectorized over
thousands of district instances — exactly the mapping SURVEY.md §2
prescribes for this inherently sequential dependency.

Differences from the host-loop :class:`citylearn_tpu.agents.marlisa.MARLISA`
(which mirrors the reference step-for-step, sklearn included):

- **Regression is streaming ridge, in-graph.** The reference refits a
  host sklearn ``LinearRegression`` on a growing buffer every
  ``regression_frequency`` steps; here per-agent normal-equation
  accumulators (X^T X, X^T y) update every step from all districts and
  are solved periodically on device — no buffer, no host sync.
- **The regression target is the true step net consumption.** The
  reference regresses on the *returned observation's*
  ``net_electricity_consumption``, which its unwritten-index quirk pins
  to 0.0 at every post-reset step (see DERIVED_ZERO_OBSERVATIONS in
  ``core/params.py``) — i.e. the shipped estimator degenerates to a
  zero predictor. The batched variant predicts the actual
  ``StepOutput.net_electricity_consumption``, a deliberate, documented
  divergence that makes the coordination signal informative.
- **No PCA rotation.** The reference fits PCA with
  ``pca_compression = 1.0`` by default — an invertible rotation that
  adds no compression; the batched variant feeds encoder-normalized
  observations directly.
- **Exploration-phase coordination variables are zero** (the reference
  derives them from the not-yet-fit regression after a shuffled order).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from citylearn_tpu.agents.sac import _policy_sample
from citylearn_tpu.core.obs_encoder import encode_obs
from citylearn_tpu.train import BatchedSAC, TrainConfig, TrainState

COORD_VARS = 2
RIDGE = 1e-3


class MarlisaTrainState(NamedTuple):
    base: TrainState
    cv: jnp.ndarray            # (D, A, 2) coordination variables (last acted)
    reg_xtx: jnp.ndarray       # (A, F, F) streaming normal equations
    reg_xty: jnp.ndarray       # (A, F)
    reg_w: jnp.ndarray         # (A, F) solved ridge weights
    # delayed-by-one transition storage (obs carries the cv USED to act)
    prev_obs: jnp.ndarray      # (D, A, K) with cv dims
    prev_act: jnp.ndarray      # (D, A, M)
    prev_rew: jnp.ndarray      # (D, A)
    prev_valid: jnp.ndarray    # scalar bool


class BatchedMARLISA(BatchedSAC):
    """Vectorized MARLISA over ``n_districts`` instances of one dataset."""

    extra_obs_dim = COORD_VARS

    def __init__(self, schema, cfg: TrainConfig = TrainConfig(), seed: int = 0,
                 iterations: int = 2, regression_update_every: int = 50,
                 **kwargs):
        self.iterations = int(iterations)
        self.regression_update_every = int(regression_update_every)
        super().__init__(schema, cfg, seed=seed, **kwargs)

    # ------------------------------------------------------------------
    def _energy_coefficients(self):
        """Per-building dispatch-capacity weights (reference
        ``marlisa.py:404-418``) from the simulation-range demand sums."""
        spec = self.spec
        sl = slice(spec.simulation_start_time_step,
                   spec.simulation_end_time_step + 1)
        # the reference works from *annual* demand estimates (metadata
        # sums divided by the number of simulated years); annualize the
        # simulation-range sums so multi-year datasets (2021 = 4 years)
        # keep the same coordination-variable scale
        n_steps = sl.stop - sl.start
        years = max(n_steps * spec.seconds_per_time_step / 3600.0 / 8760.0,
                    1e-9)
        esc = []
        for b in spec.buildings:
            s = b.series
            solar = float(np.sum(b.pv_nominal_power
                                 * s["solar_generation"][sl] / 1000.0)) / years
            coef = (float(np.sum(s["dhw_demand"][sl])) / years / 0.9
                    + float(np.sum(s["cooling_demand"][sl])) / years / 3.5
                    + float(np.sum(s["heating_demand"][sl])) / years / 3.5
                    + float(np.sum(s["non_shiftable_load"][sl])) / years
                    - solar / 6.0)
            coef = max(0.3 * (coef + solar / 6.0), coef) / 8760.0
            esc.append(coef)
        total = sum(esc) or 1.0
        # normalized per-building weights + the raw total used to scale the
        # total-demand coordination variable (marlisa.py:415-418)
        return np.asarray([c / total for c in esc], np.float32), float(total)

    def _init_state(self, seed: int):
        super()._init_state(seed)
        cfg = self.cfg
        D, A = cfg.n_districts, self.env_cfg.n_buildings
        esc, total = self._energy_coefficients()
        self.energy_size_coefficient = jnp.asarray(esc)
        self.total_coefficient = float(total)
        # capacity_dispatched prefix per ring position (agent order 0..A-1)
        self.cap_dispatched = jnp.asarray(
            np.concatenate([[0.0], np.cumsum(esc)[:-1]]).astype(np.float32))
        F = self.enc_dim + self.act_dim + 1
        self.reg_dim = F
        base = self.state
        self.state = MarlisaTrainState(
            base=base,
            cv=jnp.zeros((D, A, COORD_VARS), jnp.float32),
            reg_xtx=jnp.zeros((A, F, F), jnp.float32),
            reg_xty=jnp.zeros((A, F), jnp.float32),
            reg_w=jnp.zeros((A, F), jnp.float32),
            prev_obs=jnp.zeros((D, A, self.obs_dim), jnp.float32),
            prev_act=jnp.zeros((D, A, self.act_dim), jnp.float32),
            prev_rew=jnp.zeros((D, A), jnp.float32),
            prev_valid=jnp.asarray(False))

    # ------------------------------------------------------------------
    def _coordination_ring(self, policies, obs_enc, cv0, reg_w, key,
                           deterministic=False):
        """One action-selection pass: ``iterations`` sweeps of the
        sequential agent ring under ``lax.scan`` (reference
        ``marlisa.py:298-331``). ``obs_enc``: (D, A, K0); returns the
        (D, A, M) actions and the cv used by each agent."""
        D = obs_enc.shape[0]
        A = self.env_cfg.n_buildings
        obs_T = jnp.swapaxes(obs_enc, 0, 1)              # (A, D, K0)
        eye = jnp.eye(A, dtype=jnp.float32)
        keys = jax.random.split(key, self.iterations * A).reshape(
            self.iterations, A, -1)

        def sweep(carry, it):
            cv, expected, total_demand, actions = carry

            def agent_step(inner, xs):
                cv, expected, total_demand, actions = inner
                (pol, obs_c, k_c, scale_c, bias_c, mask_c, onehot_c,
                 onehot_n, cap_c, is_last) = xs
                cv_c = jnp.einsum("dak,a->dk", cv, onehot_c)   # (D, 2)
                inp = jnp.concatenate([obs_c, cv_c], axis=-1)
                a_s, _, a_det = _policy_sample(pol, inp, k_c, scale_c,
                                               bias_c, mask_c)
                a_c = a_det if deterministic else a_s           # (D, M)
                feats = jnp.concatenate(
                    [obs_c, a_c, jnp.ones((D, 1), jnp.float32)], axis=-1)
                exp_c = feats @ jnp.einsum("af,a->f", reg_w, onehot_c)  # (D,)
                exp_n = jnp.einsum("da,a->d", expected, onehot_n)
                expected = expected * (1 - onehot_c) + exp_c[:, None] * onehot_c
                # total-demand coordination variable for the next agent
                delta = jnp.where(is_last, 0.0, exp_c - exp_n)
                total_demand = total_demand + delta
                cv_next0 = total_demand / self.total_coefficient
                upd_next = jnp.where(is_last, 0.0, 1.0) * onehot_n
                cv = cv.at[:, :, 0].set(
                    cv[:, :, 0] * (1 - upd_next) + cv_next0[:, None] * upd_next)
                # capacity dispatched so far for this agent
                cv = cv.at[:, :, 1].set(
                    cv[:, :, 1] * (1 - onehot_c) + cap_c * onehot_c)
                actions = (actions * (1 - onehot_c[None, :, None])
                           + a_c[:, None, :] * onehot_c[None, :, None])
                return (cv, expected, total_demand, actions), None

            is_last_flags = (jnp.arange(A) == A - 1) & (it == self.iterations - 1)
            xs = (self._policies_stacked(policies), obs_T, keys[it],
                  self.action_scale, self.action_bias, self.act_mask,
                  eye, jnp.roll(eye, -1, axis=0), self.cap_dispatched,
                  is_last_flags)
            carry, _ = jax.lax.scan(agent_step, (cv, expected, total_demand,
                                                 actions), xs)
            return carry, None

        init = (cv0, jnp.zeros((D, A), jnp.float32), jnp.zeros((D,), jnp.float32),
                jnp.zeros((D, A, self.act_dim), jnp.float32))
        (cv, expected, total_demand, actions), _ = jax.lax.scan(
            sweep, init, jnp.arange(self.iterations))
        return actions, cv

    @staticmethod
    def _policies_stacked(policies):
        return policies            # leaves already lead with the agent axis

    # ------------------------------------------------------------------
    def _build_train_chunk(self):
        import functools

        from citylearn_tpu.core.step import district_step

        cfg = self.cfg
        env_cfg = self.env_cfg
        D, A = cfg.n_districts, env_cfg.n_buildings
        vstep = jax.vmap(functools.partial(district_step, env_cfg),
                         in_axes=(None, 0, 0))

        vupdate = jax.vmap(self._make_update_agent(),
                           in_axes=(0, 1, 0, 0, 0, 0))

        def one_step(ms: MarlisaTrainState, _):
            ts = ms.base
            key, k_ring, k_expl, k_sample, k_upd, k_reset = \
                jax.random.split(ts.key, 6)
            obs_enc = self._encoded_obs(ts.env_state)        # (D, A, K0)

            explore = ts.step < cfg.warmup_steps
            # the ring starts from zero coordination variables every step
            # (reference marlisa.py:302-306)
            cv_zero = jnp.zeros_like(ms.cv)
            a_ring, cv_used = self._coordination_ring(
                ts.nets.policy, obs_enc, cv_zero, ms.reg_w, k_ring)
            a_rand = jax.random.uniform(k_expl, a_ring.shape,
                                        minval=self.act_low,
                                        maxval=self.act_high)
            cv_used = jnp.where(explore, jnp.zeros_like(cv_used), cv_used)
            a_env = jnp.where(explore, a_rand, a_ring)
            obs_cv = jnp.concatenate([obs_enc, cv_used], axis=-1)

            env_state, out = vstep(self.params, ts.env_state,
                                   self._actions_dict(a_env))
            reward = out.reward * cfg.reward_scale           # (D, A)

            # --- streaming ridge regression: predict the TRUE step net ---
            feats = jnp.concatenate(
                [obs_enc, a_env, jnp.ones((D, A, 1), jnp.float32)], axis=-1)
            target = out.net_electricity_consumption          # (D, A)
            reg_xtx = ms.reg_xtx + jnp.einsum("daf,dag->afg", feats, feats)
            reg_xty = ms.reg_xty + jnp.einsum("daf,da->af", feats, target)
            refit = (ts.step + 1) % self.regression_update_every == 0

            def solve(_):
                eye = jnp.eye(self.reg_dim, dtype=jnp.float32) * RIDGE
                return jax.vmap(
                    lambda xtx, xty: jnp.linalg.solve(xtx + eye, xty))(
                        reg_xtx, reg_xty)

            reg_w = jax.lax.cond(refit, solve, lambda _: ms.reg_w, None)

            # per-district reset with fresh windows (as BatchedSAC)
            terminated = env_state.t >= env_cfg.time_steps - 1
            env_reset = self._broadcast_initial(self._draw_offsets(k_reset, D))
            pick = lambda cur, res: jnp.where(
                terminated.reshape((D,) + (1,) * (cur.ndim - 1)), res, cur)
            env_state = jax.tree_util.tree_map(pick, env_state, env_reset)

            # --- delayed-by-one transition storage: prev -> current so the
            # stored next_obs carries the cv its action actually saw ---
            slot = ts.replay_pos
            S = ts.replay_done.shape[0]
            do_store = ms.prev_valid

            def store(buf, val):
                return jax.lax.cond(
                    do_store, lambda b: b.at[slot].set(val), lambda b: b, buf)

            ts = ts._replace(
                replay_obs=store(ts.replay_obs,
                                 ms.prev_obs.reshape(D, -1)),
                replay_act=store(ts.replay_act, ms.prev_act),
                replay_rew=store(ts.replay_rew, ms.prev_rew),
                replay_next=store(ts.replay_next, obs_cv.reshape(D, -1)),
                replay_done=store(ts.replay_done,
                                  jnp.zeros((D,), jnp.float32)),
                replay_pos=jnp.where(do_store, (slot + 1) % S, slot),
                replay_full=ts.replay_full | (do_store & (slot + 1 >= S)))

            slots_avail = jnp.where(ts.replay_full, S, ts.replay_pos)
            can_update = (slots_avail * D >= cfg.batch_size) & ~explore

            def do_update(nets):
                ks1, ks2 = jax.random.split(k_sample)
                sel_s = jax.random.randint(ks1, (cfg.batch_size,), 0,
                                           jnp.maximum(slots_avail, 1))
                sel_d = jax.random.randint(ks2, (cfg.batch_size,), 0, D)
                pick_b = lambda buf: buf[sel_s, sel_d]
                unflat = lambda x: x.reshape(cfg.batch_size, A, -1)
                batch = (unflat(pick_b(ts.replay_obs)),
                         pick_b(ts.replay_act),
                         pick_b(ts.replay_rew),
                         unflat(pick_b(ts.replay_next)),
                         jnp.broadcast_to(pick_b(ts.replay_done)[:, None],
                                          (cfg.batch_size, A)))
                return vupdate(nets, batch, jax.random.split(k_upd, A),
                               self.action_scale, self.action_bias,
                               self.act_mask)

            nets = jax.lax.cond(can_update, do_update, lambda n: n, ts.nets)
            ts = ts._replace(env_state=env_state, nets=nets, key=key,
                             step=ts.step + 1)
            ms = ms._replace(
                base=ts, cv=cv_used, reg_xtx=reg_xtx, reg_xty=reg_xty,
                reg_w=reg_w, prev_obs=obs_cv, prev_act=a_env,
                prev_rew=reward,
                # terminated transitions are dropped across resets
                prev_valid=~jnp.any(terminated))
            return ms, jnp.sum(reward)

        def chunk(ms: MarlisaTrainState, n_steps: int):
            return jax.lax.scan(one_step, ms, None, length=n_steps)

        return chunk

    # ------------------------------------------------------------------
    def evaluate(self, n_steps: int = None,
                 baseline_condition: str = "_without_storage"):
        """Deterministic evaluation with the LIVE coordination ring.

        Overrides the BatchedSAC evaluator (which pads the coordination
        dims with zeros): the policy was trained on ring-produced
        coordination variables, so the evaluated policy must see them too
        (reference ``marlisa.py:298-331`` runs the same iterative ring at
        ``deterministic=True``)."""
        from citylearn_tpu.core.evaluate import collect_episode, kpi_table

        cache_key = (n_steps, baseline_condition)
        if not hasattr(self, "_eval_cache_ring"):
            self._eval_cache_ring = {}
        if cache_key not in self._eval_cache_ring:
            A = self.env_cfg.n_buildings
            S = ((self.env_cfg.time_steps - 1) if n_steps is None
                 else int(n_steps))

            def run(params, states, policy_params, reg_w, rng):
                def policy_fn(p, st):
                    tau = st.data_offset + st.t
                    row = jnp.take(p.obs_static, tau, axis=0)   # (A, K_union)
                    obs = jax.vmap(lambda e, col: encode_obs(e, col))(
                        self.enc_stack, row)                     # (A, K0)
                    cv0 = jnp.zeros((1, A, COORD_VARS), jnp.float32)
                    acts, _ = self._coordination_ring(
                        policy_params, obs[None], cv0, reg_w,
                        jax.random.fold_in(rng, st.t), deterministic=True)
                    acts_d = self._actions_dict(acts)            # (1, B) each
                    return {k: v[0] for k, v in acts_d.items()}

                def one(state):
                    st, collected = collect_episode(self.env_cfg, params,
                                                    state, policy_fn, S)
                    return kpi_table(self.env_cfg, params, collected,
                                     state.data_offset + state.t,
                                     baseline_condition, final_state=st)

                return jax.vmap(one)(states)

            self._eval_cache_ring[cache_key] = jax.jit(run)

        base = self.state.base
        fresh = self._broadcast_initial(
            self._draw_offsets(jax.random.fold_in(base.key, 1),
                               self.cfg.n_districts))
        return self._eval_cache_ring[cache_key](
            self.params, fresh, base.nets.policy, self.state.reg_w,
            jax.random.fold_in(base.key, 0))
