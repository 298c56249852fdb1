"""Batched piecewise-linear curve lookup matching the reference's
``idx = max(0, argmax(q <= x) - 1)`` + segment interpolation semantics
(reference ``citylearn/energy_model.py:1070-1109``), including the quirky
fall-back to the *first* segment when the query exceeds every knot
(all-False ``argmax`` returns 0)."""

from __future__ import annotations

import jax.numpy as jnp


def interp_reference(q: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Interpolate ``q`` (B,) on per-row curves ``xs``/``ys`` (B, P).

    Curves are padded by exact repetition of the last knot
    (:func:`citylearn_tpu.compiler.seeding.pad_curve`), which keeps
    ``argmax`` and segment indexing identical to the unpadded reference.
    """
    match = q[..., None] <= xs                       # (B, P)
    first = jnp.argmax(match, axis=-1)               # 0 when all-False, like numpy
    idx = jnp.maximum(0, first - 1)
    take = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
    x0, x1 = take(xs, idx), take(xs, idx + 1)
    y0, y1 = take(ys, idx), take(ys, idx + 1)
    return y0 + (q - x0) * (y1 - y0) / (x1 - x0)
