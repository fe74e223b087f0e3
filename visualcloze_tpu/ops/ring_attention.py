"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference processes the full grid sequence on every device and left
sequence parallelism as a TODO (train.py:487, SURVEY.md §5.7). This is the
TPU-native construction: shard the sequence over a `cp` mesh axis, rotate
key/value (and key-bias) shards around the ring with `jax.lax.ppermute`, and
merge per-chunk flash outputs with their log-sum-exp in log2 space — exact
full attention with O(L/cp) memory per device and compute/comms overlap left
to XLA.

Per-chunk attention reuses the Pallas flash forward (with LSE) on TPU and an
XLA chunk oracle elsewhere. Merging identity for normalized chunk outputs
(o_i, lse_i):  m = max_i lse_i;  w_i = 2^(lse_i - m);  o = sum w_i o_i / sum w_i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

def _chunk_attention_lse(q, k, v, bias, impl: str):
    """Chunk attention returning (o (B,H,Lq,D), lse (B,H,Lq) in log2 units)."""
    if impl == "pallas":
        from .flash_attention import _flash_fwd_lse

        lq = q.shape[2]
        o, lse4, _ = _flash_fwd_lse(q, k, v, bias)
        # the kernel pads sequence dims to 128-multiples; slice back so the
        # shard_map output shape matches the local shard
        return o[:, :, :lq], lse4[:, :, :lq, 0]
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (d ** -0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    m = jnp.max(logits, axis=-1)
    p = jnp.exp2((logits - m[..., None]) * 1.4426950408889634)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", (p / l[..., None]).astype(v.dtype), v)
    lse = m * 1.4426950408889634 + jnp.log2(jnp.maximum(l, 1e-30))
    return o.astype(q.dtype), lse


def _merge(o1, lse1, o2, lse2):
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp2(lse1 - m)[..., None]
    w2 = jnp.exp2(lse2 - m)[..., None]
    o = (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / (w1 + w2)
    lse = m + jnp.log2(jnp.exp2(lse1 - m) + jnp.exp2(lse2 - m))
    return o.astype(o1.dtype), lse


def _ring_body(q, k, v, bias, axis: str, impl: str):
    """Runs inside shard_map: q/k/v are the local sequence shards."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    o, lse = _chunk_attention_lse(q, k, v, bias, impl)

    def step(carry, _):
        k_cur, v_cur, b_cur, o_acc, lse_acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        if b_cur is not None:
            b_cur = jax.lax.ppermute(b_cur, axis, perm)
        o_i, lse_i = _chunk_attention_lse(q, k_cur, v_cur, b_cur, impl)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)
        return (k_cur, v_cur, b_cur, o_acc, lse_acc), None

    (_, _, _, o, lse), _ = jax.lax.scan(step, (k, v, bias, o, lse), None, length=n - 1)
    return o


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
    mesh: Mesh,
    axis: str = "cp",
    impl: str = "xla",
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over `axis`.

    Args:
      q, k, v: (B, H, L, D) — L is the GLOBAL sequence length (shard_map
        splits it over `axis`; L must be divisible by the axis size).
      bias: optional (B, L) additive key bias (padding mask).
      mesh: mesh containing `axis`.
      impl: per-chunk attention ("pallas" on TPU, "xla" oracle).

    Returns (B, H, L, D), identical to full attention.
    """
    # shard the batch dim over any data axes present in the mesh: leaving it
    # unmentioned would replicate the whole (dp, fsdp)-sharded batch onto
    # every device (full all-gather per attention call in the trainer)
    data_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.axis_names and mesh.shape[a] > 1)
    b_spec = data_axes if data_axes else None
    in_specs = (
        P(b_spec, None, axis, None),
        P(b_spec, None, axis, None),
        P(b_spec, None, axis, None),
    )
    out_spec = P(b_spec, None, axis, None)
    if bias is not None:
        fn = jax.shard_map(
            functools.partial(_ring_body, axis=axis, impl=impl),
            mesh=mesh,
            in_specs=in_specs + (P(b_spec, axis),),
            out_specs=out_spec,
            check_vma=False,
        )
        return fn(q, k, v, bias)

    def body_nobias(q, k, v):
        return _ring_body(q, k, v, None, axis=axis, impl=impl)

    fn = jax.shard_map(
        body_nobias, mesh=mesh, in_specs=in_specs, out_specs=out_spec, check_vma=False
    )
    return fn(q, k, v)
