"""In-graph LSTM temperature dynamics (reference ``citylearn/dynamics.py``
run under torch; here a batched jnp implementation vmapped over buildings —
per-building weight stacks contracted with einsum so districts of B
buildings predict in one MXU-friendly batch).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from citylearn_tpu.core.types import DynamicsParams, StaticConfig


def lstm_predict(dyn: DynamicsParams, model_in: jnp.ndarray,
                 h0: jnp.ndarray, c0: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run one group's stacked LSTM over the lookback window.

    ``model_in``: (Bg, lookback, F); ``h0``/``c0``: (L, Bg, H) carried
    across env steps (reference ``building.py:3020-3024`` detaches and
    reuses the hidden state). Returns (pred (Bg,), h, c) where pred is the
    normalized temperature from the linear head on the final hidden output
    (``dynamics.py:94-101``).
    """
    H = dyn.lin_w.shape[1]
    x = model_in                                    # (Bg, S, F)
    hs, cs = [], []
    for l in range(len(dyn.w_ih)):
        w_ih, w_hh, b = dyn.w_ih[l], dyn.w_hh[l], dyn.bias[l]

        def cell(carry, x_t, w_ih=w_ih, w_hh=w_hh, b=b):
            h_t, c_t = carry                        # (B, H)
            gates = (jnp.einsum("bgf,bf->bg", w_ih, x_t)
                     + jnp.einsum("bgh,bh->bg", w_hh, h_t) + b)
            i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
            f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
            c_n = f * c_t + i * g
            h_n = o * jnp.tanh(c_n)
            return (h_n, c_n), h_n

        (h_f, c_f), ys = jax.lax.scan(cell, (h0[l], c0[l]),
                                      jnp.swapaxes(x, 0, 1))
        x = jnp.swapaxes(ys, 0, 1)                  # (B, S, H) feeds next layer
        hs.append(h_f)
        cs.append(c_f)

    out = x[:, -1, :]                               # (B, H)
    pred = jnp.einsum("bh,bh->b", out, dyn.lin_w) + dyn.lin_b
    return pred, jnp.stack(hs), jnp.stack(cs)
