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

The backward is FUSED (custom VJP, no autodiff through the forward scan): a
second ring pass recomputes per-chunk probabilities from the saved global LSE
and accumulates dq locally while dk/dv accumulators travel around the ring
with their chunks (flash-attention backward identities, log2 space):
  delta = rowsum(do * o);  p = 2^(s - lse);  dl = p * (do.v^T - delta)
  dq += scale * dl @ k;    dk += scale * dl^T @ q;   dv += p^T @ do
Both chunk impls ("pallas" fused kernels / "xla" einsums) are trainable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

LOG2E = 1.4426950408889634


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
    p = jnp.exp2((logits - m[..., None]) * LOG2E)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", (p / l[..., None]).astype(v.dtype), v)
    lse = m * LOG2E + jnp.log2(jnp.maximum(l, 1e-30))
    return o.astype(q.dtype), lse


def _chunk_bwd(q, k, v, bias, do, lse, delta, impl: str):
    """Per-(q-shard, kv-chunk) backward. lse (B,H,Lq) is the GLOBAL log2
    log-sum-exp; delta (B,H,Lq) = rowsum(do*o_final). Returns partial
    (dq, dk, dv) in fp32."""
    if impl == "pallas":
        from .flash_attention import chunk_bwd_pallas

        dq, dk, dv = chunk_bwd_pallas(q, k, v, bias, do, lse, delta)
        return (dq.astype(jnp.float32), dk.astype(jnp.float32), dv.astype(jnp.float32))
    d = q.shape[-1]
    scale = d ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (scale * LOG2E)
    if bias is not None:
        s = s + (bias * LOG2E)[:, None, None, :]
    p = jnp.exp2(s - lse[..., None])  # exact softmax probs (B,H,Lq,Lk)
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v.astype(jnp.float32))
    dl = p * (dp - delta[..., None])
    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", dl, k.astype(jnp.float32))
    dk = scale * jnp.einsum("bhqk,bhqd->bhkd", dl, q.astype(jnp.float32))
    return dq, dk, dv


def _ring_fwd_lse(q, k, v, bias, axis: str, impl: str):
    """Forward ring pass. Returns (o, lse) for the local query shard."""
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
    return o, lse


def _ring_bwd_pass(q, k, v, bias, o, lse, do, axis: str, impl: str):
    """Backward ring pass: dq accumulates locally; dk/dv accumulators rotate
    WITH their kv chunk so each lands back on its owner after a full cycle."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    dq, dk, dv = _chunk_bwd(q, k, v, bias, do, lse, delta, impl)

    def step(carry, _):
        k_cur, v_cur, b_cur, dq_a, dk_a, dv_a = carry
        # rotate the chunk and its gradient accumulators together
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        if b_cur is not None:
            b_cur = jax.lax.ppermute(b_cur, axis, perm)
        dk_a = jax.lax.ppermute(dk_a, axis, perm)
        dv_a = jax.lax.ppermute(dv_a, axis, perm)
        dq_c, dk_c, dv_c = _chunk_bwd(q, k_cur, v_cur, b_cur, do, lse, delta, impl)
        return (k_cur, v_cur, b_cur, dq_a + dq_c, dk_a + dk_c, dv_a + dv_c), None

    (_, _, _, dq, dk, dv), _ = jax.lax.scan(
        step, (k, v, bias, dq, dk, dv), None, length=n - 1
    )
    # accumulators are one rotation short of home after n-1 steps
    dk = jax.lax.ppermute(dk, axis, perm)
    dv = jax.lax.ppermute(dv, axis, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _merge(o1, lse1, o2, lse2):
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp2(lse1 - m)[..., None]
    w2 = jnp.exp2(lse2 - m)[..., None]
    o = (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / (w1 + w2)
    lse = m + jnp.log2(jnp.exp2(lse1 - m) + jnp.exp2(lse2 - m))
    return o.astype(o1.dtype), lse


def _make_ring_fn(axis: str, impl: str, has_bias: bool):
    """custom_vjp'd ring body (runs inside shard_map on local shards)."""
    if has_bias:

        @jax.custom_vjp
        def ring(q, k, v, bias):
            return _ring_fwd_lse(q, k, v, bias, axis, impl)[0]

        def fwd(q, k, v, bias):
            o, lse = _ring_fwd_lse(q, k, v, bias, axis, impl)
            return o, (q, k, v, bias, o, lse)

        def bwd(res, g):
            q, k, v, bias, o, lse = res
            dq, dk, dv = _ring_bwd_pass(q, k, v, bias, o, lse, g, axis, impl)
            # bias is a {0, -inf} padding mask, never a trained quantity
            return dq, dk, dv, jnp.zeros_like(bias)

        ring.defvjp(fwd, bwd)
        return ring

    @jax.custom_vjp
    def ring_nb(q, k, v):
        return _ring_fwd_lse(q, k, v, None, axis, impl)[0]

    def fwd_nb(q, k, v):
        o, lse = _ring_fwd_lse(q, k, v, None, axis, impl)
        return o, (q, k, v, o, lse)

    def bwd_nb(res, g):
        q, k, v, o, lse = res
        return _ring_bwd_pass(q, k, v, None, o, lse, g, axis, impl)

    ring_nb.defvjp(fwd_nb, bwd_nb)
    return ring_nb


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
      impl: per-chunk attention ("pallas" on TPU, "xla" oracle) — both are
        differentiable via the fused ring backward.

    Returns (B, H, L, D), identical to full attention.
    """
    # shard the batch dim over any data axes present in the mesh: leaving it
    # unmentioned would replicate the whole (dp, fsdp)-sharded batch onto
    # every device (full all-gather per attention call in the trainer).
    # Only axes whose cumulative product divides B participate — serving
    # runs B=1 on an fsdp weight-sharding mesh, where the batch must stay
    # replicated rather than fail the shard_map divisibility check.
    b = q.shape[0]
    data_axes: list[str] = []
    prod = 1
    for a in ("dp", "fsdp"):
        if (a in mesh.axis_names and mesh.shape[a] > 1
                and b % (prod * mesh.shape[a]) == 0):
            data_axes.append(a)
            prod *= mesh.shape[a]
    b_spec = tuple(data_axes) if data_axes else None
    in_specs = (
        P(b_spec, None, axis, None),
        P(b_spec, None, axis, None),
        P(b_spec, None, axis, None),
    )
    out_spec = P(b_spec, None, axis, None)
    ring_fn = _make_ring_fn(axis, impl, bias is not None)
    if bias is not None:
        fn = jax.shard_map(
            ring_fn,
            mesh=mesh,
            in_specs=in_specs + (P(b_spec, axis),),
            out_specs=out_spec,
            check_vma=False,
        )
        return fn(q, k, v, bias)

    fn = jax.shard_map(
        ring_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec, check_vma=False
    )
    return fn(q, k, v)
