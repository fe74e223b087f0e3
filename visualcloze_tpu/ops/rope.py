"""Multi-axis rotary position embeddings.

TPU-native counterpart of the reference's RoPE (models/math.py:102-117,
models/modules/layers.py:11-25 EmbedND). The reference builds a
(..., L, D/2, 2, 2) rotation-matrix table in float64; TPUs have no fp64, so we
build (cos, sin) tables in float32 — the positions are small integers
(grid-row index <= ~25, token y/x <= ~160) so fp32 frequency tables are exact
to well below bf16 resolution.

Tables are returned as a (cos, sin) pair instead of packed 2x2 matrices: the
pair form maps to two VPU multiply-adds per rotation and fuses cleanly into
the attention prologue under XLA.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def rope_table(pos: jnp.ndarray, dim: int, theta: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis rotation table.

    Args:
      pos: (..., L) positions (any real dtype).
      dim: number of channels this axis covers (even).
      theta: RoPE base.

    Returns:
      (cos, sin), each (..., L, dim // 2) float32.

    Ref: models/math.py:102-109 (`rope`), computed there in float64; fp32 here.
    """
    assert dim % 2 == 0, f"rope dim must be even, got {dim}"
    # dim/theta are static: build omega host-side in float64 (matching the
    # reference's fp64 table construction) and embed it as an fp32 constant;
    # only the pos * omega product runs on-device in fp32.
    import numpy as np

    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = jnp.asarray((1.0 / (theta ** scale)).astype(np.float32))  # (dim/2,)
    out = pos[..., None].astype(jnp.float32) * omega  # (..., L, dim/2)
    return jnp.cos(out), jnp.sin(out)


def embed_nd(
    ids: jnp.ndarray, axes_dim: Sequence[int], theta: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate per-axis RoPE tables over the position-id axes.

    Args:
      ids: (..., L, n_axes) position ids; axis 0 = grid-row id, 1 = y, 2 = x
        for VisualCloze grids (models/sampling.py:56-59).
      axes_dim: channels per axis, e.g. (16, 56, 56); sums to head_dim.

    Returns:
      (cos, sin), each (..., L, head_dim // 2) float32.

    Ref: models/modules/layers.py:18-25 (EmbedND.forward).
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim), (ids.shape, axes_dim)
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        c, s = rope_table(ids[..., i], d, theta)
        coss.append(c)
        sins.append(s)
    return jnp.concatenate(coss, axis=-1), jnp.concatenate(sins, axis=-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k stored in the de-interleaved "half" layout.

    Layout: the first D/2 channels hold the pair-even lanes, the last D/2 the
    pair-odd lanes (per head). Because attention contracts q·k over D, any
    fixed channel permutation applied consistently to q and k leaves the
    output unchanged — so the qkv weight columns are pre-permuted offline
    (models/weights.permute_rope_layout) and the rotation becomes two fused
    multiply-adds and a concat with ZERO lane shuffles, vs. three interleave
    permutes per tensor in the reference layout (a measurable VPU cost at
    (B, 24, 4096, 128) per block).
    """
    x32 = x.astype(jnp.float32)
    e, o = jnp.split(x32, 2, axis=-1)
    out = jnp.concatenate([cos * e - sin * o, sin * e + cos * o], axis=-1)
    return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate consecutive channel pairs of q/k by the (cos, sin) table.

    The pairing convention matches the reference exactly: channels are grouped
    as consecutive (even, odd) pairs — `reshape(..., -1, 1, 2)` in
    models/math.py:112-117 — and rotated by [[cos, -sin], [sin, cos]].
    Computation in fp32, cast back to the input dtype.

    Args:
      x: (..., L, D).
      cos/sin: broadcastable to (..., L, D // 2).
    """
    x32 = x.astype(jnp.float32)
    even = x32[..., 0::2]
    odd = x32[..., 1::2]
    out_even = cos * even - sin * odd
    out_odd = sin * even + cos * odd
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
