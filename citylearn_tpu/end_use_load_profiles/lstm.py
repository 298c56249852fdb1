"""LSTM temperature-dynamics model training (JAX/optax rebuild of reference
``citylearn/end_use_load_profiles/lstm_model/``).

Trains the lookback-window LSTM used by :class:`LSTMDynamicsBuilding` from
(ideal + partial-load) simulation results and exports a state dict the
schema compiler can load (same tensor names as the torch models shipped
with the datasets).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


def _init_lstm(key, input_size, hidden, num_layers):
    params = {}
    for l in range(num_layers):
        fan = input_size if l == 0 else hidden
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        bound = 1.0 / np.sqrt(hidden)
        u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound, maxval=bound)
        params[f"l_lstm.weight_ih_l{l}"] = u(k1, (4 * hidden, fan))
        params[f"l_lstm.weight_hh_l{l}"] = u(k2, (4 * hidden, hidden))
        params[f"l_lstm.bias_ih_l{l}"] = u(k3, (4 * hidden,))
        params[f"l_lstm.bias_hh_l{l}"] = u(k4, (4 * hidden,))
    k1, k2, _ = jax.random.split(key, 3)
    bound = 1.0 / np.sqrt(hidden)
    params["l_linear.weight"] = jax.random.uniform(k1, (1, hidden),
                                                   minval=-bound, maxval=bound)
    params["l_linear.bias"] = jax.random.uniform(k2, (1,), minval=-bound,
                                                 maxval=bound)
    return params


def _forward(params, x, num_layers, hidden):
    """x: (batch, lookback, F) -> (batch,) prediction."""
    B = x.shape[0]
    h = [jnp.zeros((B, hidden))] * num_layers
    c = [jnp.zeros((B, hidden))] * num_layers
    seq = x
    for l in range(num_layers):
        w_ih = params[f"l_lstm.weight_ih_l{l}"]
        w_hh = params[f"l_lstm.weight_hh_l{l}"]
        b = params[f"l_lstm.bias_ih_l{l}"] + params[f"l_lstm.bias_hh_l{l}"]

        def cell(carry, x_t):
            h_t, c_t = carry
            g = x_t @ w_ih.T + h_t @ w_hh.T + b
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c_n = jax.nn.sigmoid(f) * c_t + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h_n = jax.nn.sigmoid(o) * jnp.tanh(c_n)
            return (h_n, c_n), h_n

        (_, _), ys = jax.lax.scan(cell, (h[l], c[l]), jnp.swapaxes(seq, 0, 1))
        seq = jnp.swapaxes(ys, 0, 1)
    out = seq[:, -1, :] @ params["l_linear.weight"].T + params["l_linear.bias"]
    return out[:, 0]


def make_windows(features: np.ndarray, target: np.ndarray, lookback: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Sliding lookback windows: features (T, F) -> (N, lookback, F)."""
    T = len(target)
    n = T - lookback
    X = np.stack([features[i:i + lookback] for i in range(n)])
    y = target[lookback:]
    return X.astype(np.float32), y.astype(np.float32)


def train_lstm(features, target, lookback: int = 12,
               hidden: int = 16, num_layers: int = 2, epochs: int = 50,
               batch_size: int = 256, lr: float = 1e-3, seed: int = 0
               ) -> Mapping[str, np.ndarray]:
    """Train and return a torch-layout state dict (numpy arrays).

    ``features``/``target`` may be lists of per-segment arrays (e.g. the
    independent partial-load simulation runs): windows are built within
    each segment so no window or target spans a segment boundary."""
    if isinstance(features, (list, tuple)):
        pairs = [make_windows(f, t, lookback)
                 for f, t in zip(features, target)]
        X = np.concatenate([p[0] for p in pairs])
        y = np.concatenate([p[1] for p in pairs])
    else:
        X, y = make_windows(features, target, lookback)
    params = _init_lstm(jax.random.PRNGKey(seed), X.shape[-1], hidden, num_layers)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss(p):
            return jnp.mean((_forward(p, xb, num_layers, hidden) - yb) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    rng = np.random.RandomState(seed)
    n = len(X)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = order[i:i + batch_size]
            params, opt_state, _ = step(params, opt_state,
                                        jnp.asarray(X[sel]), jnp.asarray(y[sel]))
    return {k: np.asarray(v) for k, v in params.items()}
