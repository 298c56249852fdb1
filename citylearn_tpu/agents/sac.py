"""Soft actor-critic in pure JAX/optax (reference ``citylearn/agents/sac.py``
+ ``citylearn/rl.py`` rebuilt TPU-native — no torch).

Architecture mirrors the reference: per-building independent agents, twin
soft-Q networks with LayerNorm (``rl.py:115-132``), tanh-Gaussian policy
with action scale/bias from the action space (``rl.py:13-68``), Huber
(SmoothL1) Q loss, soft target updates, replay standardization after
``standardize_start_time_step`` and ``action_scaling_coefficient``-scaled
random exploration. Each agent's update step is one jitted function; all
per-step math (sampling, losses, Adam, Polyak) runs on device.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import optax

from citylearn_tpu.agents.rbc import RBC, BasicRBC
from citylearn_tpu.agents.rlc import RLC
from citylearn_tpu.preprocessing import RemoveFeature, encode

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0
EPS = 1e-6


def _mlp_init(key, sizes, init_w=3e-3, final_uniform=True):
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, k2 = jax.random.split(keys[i])
        last = i == len(sizes) - 2
        if last and final_uniform:
            w = jax.random.uniform(k1, (fan_in, fan_out), minval=-init_w, maxval=init_w)
            b = jax.random.uniform(k2, (fan_out,), minval=-init_w, maxval=init_w)
        else:
            # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            bound = 1.0 / np.sqrt(fan_in)
            w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
            b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
        params.append({"w": w, "b": b})
    return params


def _q_init(key, obs_dim, act_dim, hidden):
    k1, k2 = jax.random.split(key)
    layers = _mlp_init(k1, [obs_dim + act_dim] + hidden + [1])
    ln = [{"scale": jnp.ones(h), "bias": jnp.zeros(h)} for h in hidden]
    return {"layers": layers, "ln": ln}


def _q_apply(params, obs, act):
    """SoftQNetwork forward (``rl.py:115-132``): ln(relu(linear)) x2 + head."""
    x = jnp.concatenate([obs, act], axis=-1)
    for i, ln in enumerate(params["ln"]):
        l = params["layers"][i]
        x = jax.nn.relu(x @ l["w"] + l["b"])
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    l = params["layers"][-1]
    return x @ l["w"] + l["b"]


def _policy_init(key, obs_dim, act_dim, hidden):
    k1, k2, k3 = jax.random.split(key, 3)
    trunk = _mlp_init(k1, [obs_dim] + hidden, final_uniform=False)
    mean_head = _mlp_init(k2, [hidden[-1], act_dim])[0]
    log_std_head = _mlp_init(k3, [hidden[-1], act_dim])[0]
    return {"trunk": trunk, "mean": mean_head, "log_std": log_std_head}


def _policy_forward(params, obs):
    x = obs
    for l in params["trunk"]:
        x = jax.nn.relu(x @ l["w"] + l["b"])
    mean = x @ params["mean"]["w"] + params["mean"]["b"]
    log_std = jnp.clip(x @ params["log_std"]["w"] + params["log_std"]["b"],
                       LOG_STD_MIN, LOG_STD_MAX)
    return mean, log_std


def _policy_sample(params, obs, key, action_scale, action_bias, act_mask=None):
    """tanh-Gaussian with bound-corrected log-prob (``rl.py:56-68``).

    ``act_mask`` (optional, (M,) float): 1.0 for real action dims, 0.0 for
    padding dims added when stacking heterogeneous buildings — padded dims
    contribute nothing to the log-prob and their action is forced to 0."""
    mean, log_std = _policy_forward(params, obs)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape)
    x_t = mean + std * noise
    y_t = jnp.tanh(x_t)
    action = y_t * action_scale + action_bias
    log_prob = (-0.5 * ((x_t - mean) / std) ** 2 - log_std
                - 0.5 * jnp.log(2 * jnp.pi))
    log_prob = log_prob - jnp.log(action_scale * (1 - y_t ** 2) + EPS)
    if act_mask is not None:
        log_prob = log_prob * act_mask
        action = action * act_mask
    log_prob = log_prob.sum(-1, keepdims=True)
    det_action = jnp.tanh(mean) * action_scale + action_bias
    if act_mask is not None:
        det_action = det_action * act_mask
    return action, log_prob, det_action


class AgentNets(NamedTuple):
    q1: Any
    q2: Any
    q1_target: Any
    q2_target: Any
    policy: Any
    q1_opt: Any
    q2_opt: Any
    policy_opt: Any


@functools.partial(jax.jit, static_argnames=("optimizer",))
def _sac_update(nets: AgentNets, batch, key, action_scale, action_bias,
                alpha, discount, tau, optimizer):
    """One SAC gradient step (reference ``sac.py:116-165``)."""
    o, a, r, n, d = batch
    k1, k2 = jax.random.split(key)

    new_next_a, new_log_pi, _ = _policy_sample(nets.policy, n, k1,
                                               action_scale, action_bias)
    target_q = jnp.minimum(_q_apply(nets.q1_target, n, new_next_a),
                           _q_apply(nets.q2_target, n, new_next_a)) \
        - alpha * new_log_pi
    q_target = r[:, None] + (1.0 - d[:, None]) * discount * target_q
    q_target = jax.lax.stop_gradient(q_target)

    def q_loss(qp):
        pred = _q_apply(qp, o, a)
        return optax.huber_loss(pred, q_target, delta=1.0).mean()

    g1 = jax.grad(q_loss)(nets.q1)
    g2 = jax.grad(q_loss)(nets.q2)
    u1, q1_opt = optimizer.update(g1, nets.q1_opt, nets.q1)
    q1 = optax.apply_updates(nets.q1, u1)
    u2, q2_opt = optimizer.update(g2, nets.q2_opt, nets.q2)
    q2 = optax.apply_updates(nets.q2, u2)

    def pi_loss(pp):
        new_a, log_pi, _ = _policy_sample(pp, o, k2, action_scale, action_bias)
        q = jnp.minimum(_q_apply(q1, o, new_a), _q_apply(q2, o, new_a))
        return (alpha * log_pi - q).mean()

    gp = jax.grad(pi_loss)(nets.policy)
    up, policy_opt = optimizer.update(gp, nets.policy_opt, nets.policy)
    policy = optax.apply_updates(nets.policy, up)

    polyak = lambda tgt, src: jax.tree_util.tree_map(
        lambda t, s: t * (1 - tau) + s * tau, tgt, src)
    return nets._replace(
        q1=q1, q2=q2, policy=policy,
        q1_target=polyak(nets.q1_target, q1),
        q2_target=polyak(nets.q2_target, q2),
        q1_opt=q1_opt, q2_opt=q2_opt, policy_opt=policy_opt)


@functools.partial(jax.jit, static_argnames=())
def _policy_act(policy, obs, key, action_scale, action_bias):
    return _policy_sample(policy, obs[None, :], key, action_scale, action_bias)


class ReplayBuffer:
    """Ring buffer (reference ``rl.py:75-93``)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.buffer: list = []
        self.position = 0

    def push(self, state, action, reward, next_state, done):
        if len(self.buffer) < self.capacity:
            self.buffer.append(None)
        self.buffer[self.position] = (state, action, reward, next_state, done)
        self.position = (self.position + 1) % self.capacity

    def sample(self, batch_size, rng):
        idx = rng.choice(len(self.buffer), size=batch_size, replace=False)
        s, a, r, n, d = map(np.stack, zip(*[self.buffer[i] for i in idx]))
        return s, a, r, n, d

    def __len__(self):
        return len(self.buffer)


class SAC(RLC):
    def __init__(self, env, **kwargs: Any):
        super().__init__(env, **kwargs)
        self.time_step = 0
        self.normalized = [False] * len(self.action_space)
        self.replay_buffer = [ReplayBuffer(self.replay_buffer_capacity)
                              for _ in self.action_space]
        self.norm_mean = [None] * len(self.action_space)
        self.norm_std = [None] * len(self.action_space)
        self.r_norm_mean = [None] * len(self.action_space)
        self.r_norm_std = [None] * len(self.action_space)
        self.optimizer = optax.adam(self.lr)
        self._key = jax.random.PRNGKey(self.random_seed)
        self.nets: List[AgentNets] = []
        self.action_scale = []
        self.action_bias = []
        self.set_networks()

    def set_encoders(self):
        encoders = super().set_encoders()
        for i, names in enumerate(self.observation_names):
            for j, n in enumerate(names):
                if n == "net_electricity_consumption":
                    encoders[i][j] = RemoveFeature()
        return encoders

    def set_networks(self, internal_observation_count: int = 0):
        self.nets = []
        self.action_scale = []
        self.action_bias = []
        for i, space in enumerate(self.action_space):
            obs_dim = self.observation_dimension[i] + internal_observation_count
            act_dim = space.shape[0]
            self._key, k1, k2, k3 = jax.random.split(self._key, 4)
            q1 = _q_init(k1, obs_dim, act_dim, self.hidden_dimension)
            q2 = _q_init(k2, obs_dim, act_dim, self.hidden_dimension)
            policy = _policy_init(k3, obs_dim, act_dim, self.hidden_dimension)
            nets = AgentNets(
                q1=q1, q2=q2,
                q1_target=jax.tree_util.tree_map(jnp.array, q1),
                q2_target=jax.tree_util.tree_map(jnp.array, q2),
                policy=policy,
                q1_opt=self.optimizer.init(q1),
                q2_opt=self.optimizer.init(q2),
                policy_opt=self.optimizer.init(policy))
            self.nets.append(nets)
            scale = self.action_scaling_coefficient * (space.high - space.low) / 2.0
            bias = self.action_scaling_coefficient * (space.high + space.low) / 2.0
            self.action_scale.append(jnp.asarray(scale))
            self.action_bias.append(jnp.asarray(bias))

    # ------------------------------------------------------------------
    def update(self, observations, actions, reward, next_observations,
               terminated: bool, truncated: bool):
        """Reference ``sac.py:56-165``."""
        for i, (o, a, r, n) in enumerate(zip(observations, actions, reward,
                                             next_observations)):
            o = encode(self.encoders[i], o)
            n = encode(self.encoders[i], n)
            if self.normalized[i]:
                o = self._norm_obs(i, o)
                n = self._norm_obs(i, n)
                r = self._norm_reward(i, r)
            self.replay_buffer[i].push(o, np.asarray(a, float), r, n,
                                       float(terminated))

            if self.time_step >= self.standardize_start_time_step \
                    and self.batch_size <= len(self.replay_buffer[i]):
                if not self.normalized[i]:
                    buf = self.replay_buffer[i].buffer
                    X = np.array([j[0] for j in buf], dtype=float)
                    self.norm_mean[i] = np.nanmean(X, axis=0)
                    self.norm_std[i] = np.nanstd(X, axis=0) + 1e-5
                    R = np.array([j[2] for j in buf], dtype=float)
                    self.r_norm_mean[i] = float(np.nanmean(R))
                    self.r_norm_std[i] = float(np.nanstd(R)) / self.reward_scaling + 1e-5
                    self.replay_buffer[i].buffer = [
                        (self._norm_obs(i, o_), a_, self._norm_reward(i, r_),
                         self._norm_obs(i, n_), d_)
                        for o_, a_, r_, n_, d_ in buf]
                    self.normalized[i] = True

                for _ in range(self.update_per_time_step):
                    batch = self.replay_buffer[i].sample(self.batch_size,
                                                         self._np_random)
                    batch = tuple(jnp.asarray(np.asarray(x, np.float32))
                                  for x in batch)
                    self._key, k = jax.random.split(self._key)
                    self.nets[i] = _sac_update(
                        self.nets[i], batch, k, self.action_scale[i],
                        self.action_bias[i], self.alpha, self.discount,
                        self.tau, self.optimizer)
        self.time_step += 1

    def predict(self, observations, deterministic: bool = None):
        deterministic = bool(deterministic)
        if self.time_step > self.end_exploration_time_step or deterministic:
            actions = self.get_post_exploration_prediction(observations, deterministic)
        else:
            actions = self.get_exploration_prediction(observations)
        return actions

    def get_post_exploration_prediction(self, observations, deterministic):
        actions = []
        for i, o in enumerate(observations):
            o = encode(self.encoders[i], o)
            o = self._norm_obs(i, o)
            self._key, k = jax.random.split(self._key)
            a, _, det = _policy_act(self.nets[i].policy,
                                    jnp.asarray(o, jnp.float32), k,
                                    self.action_scale[i], self.action_bias[i])
            actions.append(list(np.asarray(det if deterministic else a)[0]))
        return actions

    def get_exploration_prediction(self, observations):
        """``action_scaling_coefficient``-scaled random actions (sac.py:219-223)."""
        return [list(self.action_scaling_coefficient *
                     self._np_random.uniform(s.low, s.high))
                for s in self.action_space]

    def _norm_obs(self, i, o):
        if self.norm_mean[i] is None:
            return np.asarray(o, float)
        return (np.asarray(o, float) - self.norm_mean[i]) / self.norm_std[i]

    def _norm_reward(self, i, r):
        if self.r_norm_mean[i] is None:
            return r
        return (r - self.r_norm_mean[i]) / self.r_norm_std[i]

    def reset(self):
        super().reset()
        self.time_step = 0


class SACRBC(SAC):
    """SAC with RBC-guided exploration (reference ``sac.py:273-317``)."""

    def __init__(self, env, rbc: Union[RBC, str, type] = None, **kwargs: Any):
        super().__init__(env, **kwargs)
        if rbc is None:
            rbc = BasicRBC(env)
        elif isinstance(rbc, type):
            rbc = rbc(env)
        self.rbc = rbc

    def get_exploration_prediction(self, observations):
        return self.rbc.predict(observations)
