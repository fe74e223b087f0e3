"""Attention entry point for all FLUX blocks.

TPU-native counterpart of the reference's attention path (models/math.py:63-99),
which RoPE-rotates q/k then calls flash-attn's varlen CUDA kernel on unpadded
sequences. On TPU we keep static shapes: padding is expressed as a key-side
additive bias and padded query outputs are zeroed (numerically identical to
the reference's unpad -> flash -> re-pad-with-zeros round trip, because padded
keys are excluded from every softmax and padded queries are ignored
downstream).

Two implementations:
  - "xla":    fp32-softmax einsum attention; always available, used as the
              correctness oracle and on CPU.
  - "pallas": the fused MXU-tiled online-softmax kernel
              (ops/flash_attention.py); fwd-optimized, with gradients via an
              XLA-recompute VJP.
"auto" picks pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .rope import apply_rope, apply_rope_half

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class RingSpec:
    """Sequence-parallel attention dispatch: pass as `attn_impl` anywhere a
    string impl is accepted (flux_apply / layers / attention). The joint
    txt+img sequence is sharded over `axis` and attended exactly with ring
    attention (ops/ring_attention.py) — the cp integration the reference left
    as a TODO (SURVEY §5.7).

    chunk_impl: per-chunk kernel — "pallas" (TPU), "xla" (CPU oracle), or
    "auto". Both are trainable: the ring has a fused custom-VJP backward
    (second ring pass, ops/ring_attention.py) that drives the chunk kernels
    directly instead of autodiffing through the forward scan."""

    mesh: object  # jax.sharding.Mesh (kept untyped for cheap import)
    axis: str = "cp"
    chunk_impl: str = "auto"


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at trace time
        return False


def mask_to_bias(mask: jnp.ndarray | None) -> jnp.ndarray | None:
    """(B, L) {0,1} key mask -> (B, L) additive fp32 bias (0 / -inf)."""
    if mask is None:
        return None
    return jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)


def mha_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference multi-head attention with fp32 softmax.

    Args:
      q, k, v: (B, H, L, D).
      bias: (B, Lk) additive key bias or None.
    Returns: (B, H, L, D) in q.dtype.
    """
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention dispatch. q, k, v: (B, H, L, D)."""
    if isinstance(impl, RingSpec):
        from .ring_attention import ring_attention

        chunk = impl.chunk_impl
        if chunk == "auto":
            chunk = "pallas" if _on_tpu() else "xla"
        return ring_attention(q, k, v, bias, impl.mesh, axis=impl.axis, impl=chunk)
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas":
        from .flash_attention import flash_mha

        return flash_mha(q, k, v, bias)
    if impl == "xla":
        return mha_xla(q, k, v, bias)
    raise ValueError(f"unknown attention impl {impl!r}")


def rope_qk(
    q: jnp.ndarray,
    k: jnp.ndarray,
    pe: tuple[jnp.ndarray, jnp.ndarray] | None,
    rope_layout: str = "interleaved",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the RoPE rotation to q and k ((B, H, L, D); pe = (cos, sin)
    tables (B, L, D//2)). Split out of attention() so the two-segment remat
    path (models/layers.py) can rotate inside its first checkpoint segment —
    the rotated q/k then double as the flash kernel's saved residuals."""
    if pe is None:
        return q, k
    cos, sin = pe
    cos = cos[:, None]  # broadcast over heads
    sin = sin[:, None]
    rope_fn = apply_rope_half if rope_layout == "half" else apply_rope
    return rope_fn(q, cos, sin), rope_fn(k, cos, sin)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pe: tuple[jnp.ndarray, jnp.ndarray] | None,
    mask: jnp.ndarray | None = None,
    impl: str = "auto",
    rope_layout: str = "interleaved",
) -> jnp.ndarray:
    """RoPE + masked MHA + head merge (ref: models/math.py:63-99).

    Args:
      q, k, v: (B, H, L, D).
      pe: (cos, sin) tables, each (B, L, D//2) — applied to q and k in fp32
          (pass None if already rotated).
      mask: (B, L) int {1=real, 0=pad} over the key/query sequence.
    Returns:
      (B, L, H*D) in q.dtype; padded query positions zeroed.

    Fast path: with the pallas kernel and the half rope layout, the rotation
    fuses INTO the kernel (flash_mha_rope) — unrotated q/k stream straight
    from the qkv projection instead of round-tripping a rotated copy through
    HBM (~147 MB/step at the flagship serving shape, docs/PROFILE.md).
    """
    resolved = impl
    if resolved == "auto":
        resolved = "pallas" if _on_tpu() else "xla"
    if (
        pe is not None
        and resolved == "pallas"
        and rope_layout == "half"
        and q.shape[2] == k.shape[2]
    ):
        from .flash_attention import flash_mha_rope

        x = flash_mha_rope(q, k, v, mask_to_bias(mask), pe[0], pe[1])
    else:
        q, k = rope_qk(q, k, pe, rope_layout)
        x = mha(q, k, v, bias=mask_to_bias(mask), impl=impl)
    b, h, l, d = x.shape
    x = jnp.swapaxes(x, 1, 2).reshape(b, l, h * d)
    if mask is not None:
        # flash-attn's pad_input fills padded query rows with zeros; match it.
        x = x * mask[..., None].astype(x.dtype)
    return x
