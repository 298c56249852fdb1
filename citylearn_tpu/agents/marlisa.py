"""MARLISA: multi-agent SAC with information sharing
(reference ``citylearn/agents/marlisa.py``).

Per-agent linear regression predicts next net electricity consumption;
agents coordinate sequentially by passing (scaled total demand, capacity
dispatched) coordination variables; observations are PCA-compressed.
Shipped quirks preserved: the post-exploration coordination loop samples
``policy_net[iteration]`` — the *iteration* index, not the agent index
(``marlisa.py:316``).
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any, List, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from sklearn.decomposition import PCA
from sklearn.linear_model import LinearRegression

from citylearn_tpu.agents.rbc import RBC, BasicRBC
from citylearn_tpu.agents.sac import SAC, SACRBC, _policy_act
from citylearn_tpu.preprocessing import (
    NoNormalization,
    PeriodicNormalization,
    RemoveFeature,
    encode,
)

COORD_VARS = 2

REGRESSION_REMOVE = [
    f"{base}{suffix}"
    for base in ("outdoor_dry_bulb_temperature", "outdoor_relative_humidity",
                 "diffuse_solar_irradiance", "direct_solar_irradiance")
    for suffix in ("", "_predicted_1", "_predicted_2", "_predicted_3")
]


class RegressionBuffer:
    def __init__(self, capacity: int):
        self.capacity = capacity
        self.x: list = []
        self.y: list = []
        self.position = 0

    def push(self, variables, target):
        if len(self.x) < self.capacity and len(self.x) == len(self.y):
            self.x.append(None)
            self.y.append(None)
        self.x[self.position] = variables
        self.y[self.position] = target
        self.position = (self.position + 1) % self.capacity


class MARLISA(SAC):
    def __init__(self, env, regression_buffer_capacity: int = None,
                 start_regression_time_step: int = None,
                 regression_frequency: int = None,
                 information_sharing: bool = None,
                 pca_compression: float = None, iterations: int = None,
                 **kwargs: Any):
        self.information_sharing = (True if information_sharing is None
                                    else information_sharing)
        kwargs.setdefault("hidden_dimension", [400, 300])
        kwargs.setdefault("batch_size", 100)
        super().__init__(env, **kwargs)
        self.regression_buffer_capacity = int(regression_buffer_capacity or 3e4)
        self.start_regression_time_step = (2 if start_regression_time_step is None
                                           else int(start_regression_time_step))
        self.regression_frequency = int(regression_frequency or 2500)
        self.pca_compression = 1.0 if pca_compression is None else pca_compression
        self.iterations = 2 if iterations is None else int(iterations)

        n = len(self.action_space)
        self.regression_buffer = [RegressionBuffer(self.regression_buffer_capacity)
                                  for _ in range(n)]
        self.state_estimator = [LinearRegression() for _ in range(n)]
        self.pca = [None] * n
        self.pca_flag = [False] * n
        self.regression_flag = [0] * n
        self.regression_encoders = self.set_regression_encoders()
        self.set_energy_coefficients()
        self.set_pca()
        self.coordination_variables_history = [
            [[0.0] * COORD_VARS for _ in range(n)] for _ in range(2)]

    # -- network sizing includes coordination variables -----------------
    def set_networks(self, internal_observation_count: int = None):
        count = COORD_VARS if self.information_sharing else 0
        super().set_networks(internal_observation_count=count)

    def set_regression_encoders(self):
        """Reference ``marlisa.py:420-460``."""
        encoders = []
        for names, space in zip(self.observation_names, self.observation_space):
            e = []
            for i, n in enumerate(names):
                if n in ("month", "hour"):
                    e.append(PeriodicNormalization(space.high[i]))
                elif n in REGRESSION_REMOVE:
                    e.append(RemoveFeature())
                else:
                    e.append(NoNormalization())
            encoders.append(e)
        return encoders

    def set_energy_coefficients(self):
        """Reference ``marlisa.py:404-418``."""
        metadata = self.env.get_metadata()["buildings"]
        self.energy_size_coefficient = []
        self.total_coefficient = 0.0
        for b in metadata:
            coef = (b["annual_dhw_demand_estimate"] / 0.9
                    + b["annual_cooling_demand_estimate"] / 3.5
                    + b["annual_heating_demand_estimate"] / 3.5
                    + b["annual_non_shiftable_load_estimate"]
                    - b["annual_solar_generation_estimate"] / 6.0)
            coef = max(0.3 * (coef + b["annual_solar_generation_estimate"] / 6.0),
                       coef) / 8760
            self.energy_size_coefficient.append(coef)
            self.total_coefficient += coef
        self.energy_size_coefficient = [c / self.total_coefficient
                                        for c in self.energy_size_coefficient]

    def set_pca(self):
        addition = COORD_VARS if self.information_sharing else 0
        for i, dim in enumerate(self.observation_dimension):
            self.pca[i] = PCA(n_components=int(self.pca_compression * (addition + dim)))

    # -- regression helpers --------------------------------------------
    def _regression_variables(self, i, observations, actions):
        names = self.observation_names[i]
        ix = names.index("net_electricity_consumption")
        o = list(observations)
        del o[ix]
        e = list(self.regression_encoders[i])
        del e[ix]
        return np.concatenate([encode(e, o), np.asarray(actions, float)])

    def _regression_target(self, i, observations):
        ix = self.observation_names[i].index("net_electricity_consumption")
        return float(observations[ix])

    def predict_demand(self, i, observations, actions) -> float:
        v = self._regression_variables(i, observations, actions)
        return float(self.state_estimator[i].predict(v.reshape(1, -1))[0])

    # -- update (marlisa.py:118-274) ------------------------------------
    def update(self, observations, actions, reward, next_observations,
               terminated: bool, truncated: bool):
        import jax.numpy as jnp
        from citylearn_tpu.agents.sac import _sac_update

        c_hist0, c_hist1 = self.coordination_variables_history
        for i, (o, a, r, n) in enumerate(zip(observations, actions, reward,
                                             next_observations)):
            c0, c1 = c_hist0[i], c_hist1[i]
            if self.information_sharing:
                self.regression_buffer[i].push(
                    self._regression_variables(i, o, a),
                    self._regression_target(i, n))

            if self.regression_flag[i] > 1:
                eo = encode(self.encoders[i], o)
                en = encode(self.encoders[i], n)
                rr = r
                if self.information_sharing:
                    eo = np.concatenate([eo, np.asarray(c0, float)])
                    en = np.concatenate([en, np.asarray(c1, float)])
                if self.pca_flag[i]:
                    eo = self.pca[i].transform(
                        self._norm_obs(i, eo).reshape(1, -1))[0]
                    en = self.pca[i].transform(
                        self._norm_obs(i, en).reshape(1, -1))[0]
                    rr = self._norm_reward(i, rr)
                self.replay_buffer[i].push(eo, np.asarray(a, float), rr, en,
                                           float(terminated))

            if self.time_step >= self.start_regression_time_step and (
                    self.regression_flag[i] < 2
                    or self.time_step % self.regression_frequency == 0):
                if self.information_sharing:
                    self.state_estimator[i].fit(self.regression_buffer[i].x,
                                                self.regression_buffer[i].y)
                if self.regression_flag[i] < 2:
                    self.regression_flag[i] += 1

            if self.time_step >= self.standardize_start_time_step \
                    and self.batch_size <= len(self.replay_buffer[i]):
                if not self.pca_flag[i]:
                    buf = self.replay_buffer[i].buffer
                    X = np.array([j[0] for j in buf], dtype=float)
                    self.norm_mean[i] = np.nanmean(X, axis=0)
                    self.norm_std[i] = np.nanstd(X, axis=0) + 1e-5
                    self.pca[i].fit(self._norm_obs(i, X))
                    R = np.array([j[2] for j in buf], dtype=float)
                    self.r_norm_mean[i] = float(np.nanmean(R))
                    self.r_norm_std[i] = float(np.nanstd(R)) / self.reward_scaling + 1e-5
                    self.replay_buffer[i].buffer = [
                        (self.pca[i].transform(self._norm_obs(i, o_).reshape(1, -1))[0],
                         a_, self._norm_reward(i, r_),
                         self.pca[i].transform(self._norm_obs(i, n_).reshape(1, -1))[0],
                         d_)
                        for o_, a_, r_, n_, d_ in self.replay_buffer[i].buffer]
                    self.pca_flag[i] = True
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

    # -- prediction (marlisa.py:276-373) --------------------------------
    def get_post_exploration_prediction(self, observations, deterministic):
        if self.information_sharing:
            actions, cv = self._post_with_sharing(observations, deterministic)
        else:
            actions, cv = self._post_without_sharing(observations, deterministic)
        self.coordination_variables_history[0] = deepcopy(
            self.coordination_variables_history[1])
        self.coordination_variables_history[1] = cv[0:]
        return actions

    def get_exploration_prediction(self, observations):
        if self.information_sharing:
            actions, cv = self._explore_with_sharing(observations)
        else:
            actions, cv = self._explore_without_sharing(observations)
        self.coordination_variables_history[0] = deepcopy(
            self.coordination_variables_history[1])
        self.coordination_variables_history[1] = cv[0:]
        return actions

    def _sample_policy(self, net_index, i, obs_vec, deterministic):
        self._key, k = jax.random.split(self._key)
        a, _, det = _policy_act(self.nets[net_index].policy,
                                jnp.asarray(obs_vec, jnp.float32), k,
                                self.action_scale[i], self.action_bias[i])
        return list(np.asarray(det if deterministic else a)[0])

    def _post_with_sharing(self, observations, deterministic) -> Tuple[list, list]:
        agent_count = len(self.action_space)
        actions = [None] * agent_count
        action_order = list(range(agent_count))
        next_ixs = [sorted(action_order)[action_order[(i + 1) % agent_count]]
                    for i in range(agent_count)]
        cv = [[0.0, 0.0] for _ in range(agent_count)]
        expected = [0.0] * agent_count
        total_demand = 0.0

        for it in range(self.iterations):
            capacity_dispatched = 0.0
            for c, nxt, o in zip(action_order, next_ixs, observations):
                eo = encode(self.encoders[c], o)
                eo = np.concatenate([eo, np.asarray(cv[c], float)])
                eo = self._norm_obs(c, eo)
                eo = self.pca[c].transform(eo.reshape(1, -1))[0]
                # quirk: nets indexed by the *iteration* (marlisa.py:316)
                actions[c] = self._sample_policy(it, c, eo, deterministic)
                expected[c] = self.predict_demand(c, o, actions[c])
                if not (it == self.iterations - 1 and c == action_order[-1]):
                    total_demand += expected[c] - expected[nxt]
                    cv[nxt][0] = total_demand / self.total_coefficient
                cv[c][1] = capacity_dispatched
                capacity_dispatched += self.energy_size_coefficient[c]
        return actions, cv

    def _post_without_sharing(self, observations, deterministic):
        actions = []
        for i, o in enumerate(observations):
            eo = encode(self.encoders[i], o)
            eo = self._norm_obs(i, eo)
            eo = self.pca[i].transform(eo.reshape(1, -1))[0]
            actions.append(self._sample_policy(i, i, eo, deterministic))
        return actions, [[0.0, 0.0] for _ in observations]

    def _explore_with_sharing(self, observations):
        actions, cv = self._explore_without_sharing(observations)
        if self.time_step > self.start_regression_time_step:
            agent_count = len(self.action_space)
            order = list(range(agent_count))
            nprs = np.random.RandomState(int(self.random_seed + self.time_step))
            nprs.shuffle(order)
            expected = [self.predict_demand(i, o, a)
                        for i, (o, a) in enumerate(zip(observations, actions))]
            cv = [[(sum(expected) - expected[i]) / self.total_coefficient,
                   sum(self.energy_size_coefficient[j]
                       for j in order[:order.index(i)])]
                  for i in range(agent_count)]
        return actions, cv

    def _explore_without_sharing(self, observations):
        actions = SAC.get_exploration_prediction(self, observations)
        return actions, [[0.0, 0.0] for _ in observations]

    def reset(self):
        super().reset()
        if hasattr(self, "action_space") and hasattr(self, "coordination_variables_history"):
            n = len(self.action_space)
            self.coordination_variables_history = [
                [[0.0] * COORD_VARS for _ in range(n)] for _ in range(2)]


class MARLISARBC(MARLISA):
    """RBC-guided exploration (reference ``marlisa.py:472-494``)."""

    def __init__(self, env, rbc: Union[RBC, type] = None, **kwargs: Any):
        super().__init__(env, **kwargs)
        if rbc is None:
            rbc = BasicRBC(env)
        elif isinstance(rbc, type):
            rbc = rbc(env)
        self.rbc = rbc

    def _explore_without_sharing(self, observations):
        actions = self.rbc.predict(observations)
        return actions, [[0.0, 0.0] for _ in observations]
