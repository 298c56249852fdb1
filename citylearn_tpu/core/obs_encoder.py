"""In-graph observation encoding for the batched trainer.

Compiles the reference's encoder pipeline (``rlc.py:207-240``:
periodic sin/cos, one-hot day_type, min-max, remove-feature) into gather +
elementwise tensors so encoded observations for thousands of districts are
produced in one fused op from the ``obs_static`` row.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
import jax.numpy as jnp

from citylearn_tpu.compiler.spec import DistrictSpec

PERIODIC = {"month": 12, "hour": 24}
ONEHOT = {"day_type": [1, 2, 3, 4, 5, 6, 7, 8], "daylight_savings_status": [0, 1]}


class EncoderSpec(NamedTuple):
    """Per output slot: source column (into the union obs matrix), kind and
    two parameters. kinds: 0 minmax, 1 sin, 2 cos, 3 onehot(class=p1),
    4 constant zero (padding slot for heterogeneous-district stacking)."""
    src: jnp.ndarray        # (K_out,) int32
    kind: jnp.ndarray       # (K_out,) int32
    p1: jnp.ndarray         # (K_out,) float32
    p2: jnp.ndarray         # (K_out,) float32


def build_encoder_spec(spec: DistrictSpec, layout, building_index: int,
                       remove: List[str] = ("net_electricity_consumption",)
                       ) -> EncoderSpec:
    b = spec.buildings[building_index]
    src, kind, p1, p2 = [], [], [], []
    for name in b.active_observations:
        col = layout.column(name)
        if name in remove:
            continue
        if name in PERIODIC:
            x_max = float(PERIODIC[name])
            src += [col, col]
            kind += [1, 2]
            p1 += [x_max, x_max]
            p2 += [0.0, 0.0]
        elif name in ONEHOT:
            for cls in ONEHOT[name]:
                src.append(col)
                kind.append(3)
                p1.append(float(cls))
                p2.append(0.0)
        else:
            lo = float(b.observation_low[name])
            hi = float(b.observation_high[name])
            src.append(col)
            kind.append(0)
            p1.append(lo)
            p2.append(hi)
    return EncoderSpec(
        src=jnp.asarray(src, jnp.int32), kind=jnp.asarray(kind, jnp.int32),
        p1=jnp.asarray(np.asarray(p1, np.float32)),
        p2=jnp.asarray(np.asarray(p2, np.float32)))


def pad_encoder_specs(specs: List[EncoderSpec]) -> List[EncoderSpec]:
    """Pad a list of per-building encoder specs to a common output width so
    they can be stacked over the agent axis (heterogeneous districts: each
    building may expose a different active-observation subset). Padding
    slots emit a constant 0.0 (kind 4) — harmless extra network inputs."""
    k_max = max(int(e.src.shape[0]) for e in specs)
    out = []
    for e in specs:
        n = k_max - int(e.src.shape[0])
        if n == 0:
            out.append(e)
            continue
        pad_i = lambda a: jnp.concatenate([a, jnp.zeros((n,), a.dtype)])
        out.append(EncoderSpec(
            src=pad_i(e.src),
            kind=jnp.concatenate([e.kind, jnp.full((n,), 4, jnp.int32)]),
            p1=pad_i(e.p1), p2=pad_i(e.p2)))
    return out


def encode_obs(enc: EncoderSpec, obs_row: jnp.ndarray) -> jnp.ndarray:
    """(.., K_union) -> (.., K_out) encoded values."""
    x = jnp.take(obs_row, enc.src, axis=-1)
    minmax = jnp.where(enc.p2 == enc.p1, 0.0, (x - enc.p1) / (enc.p2 - enc.p1))
    ang = 2 * jnp.pi * x / jnp.maximum(enc.p1, 1e-9)
    out = jnp.where(enc.kind == 0, minmax,
                    jnp.where(enc.kind == 1, jnp.sin(ang),
                              jnp.where(enc.kind == 2, jnp.cos(ang),
                                        jnp.where(enc.kind == 3,
                                                  (x == enc.p1).astype(jnp.float32),
                                                  0.0))))
    return out
