"""Pallas TPU flash attention (non-causal, key-padding bias).

TPU-native replacement for the reference's flash-attn CUDA varlen kernel
(models/math.py:5-6, 85-95; SURVEY.md §2.9 item 1). Instead of unpadding to
cu_seqlens (dynamic shapes XLA can't tile), padding is a key-side additive
bias over static, bucketed sequence lengths.

Design:
  - grid (B, H, num_q_blocks, num_k_blocks); the k dimension is innermost so
    the online-softmax state (running max / sum / accumulator) lives in VMEM
    scratch across sequential k iterations.
  - q/k/v blocks are MXU-tiled (BQ x D) @ (BK x D)^T with fp32 accumulation;
    inputs stay bf16.
  - The bias block is (1, BK) fp32, broadcast over query rows.
  - Gradients: `flash_mha` is a custom_vjp whose backward recomputes with the
    XLA oracle (ops/attention.mha_xla) — exact gradients, Pallas-speed
    forward in the sampling hot loop. (A fused Pallas backward is a planned
    optimization; training throughput is dominated by the fwd+bwd matmuls.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    """Online-softmax step in log2 space: the softmax scale (and the 1/ln2
    base change) is folded into q once per (BQ, D) block, so the only
    (BQ, BK)-sized elementwise work per step is one add (bias), one max, one
    exp2 and one sum — exp2 has a fast VPU path while exp(x) lowers to extra
    multiplies on the big tile. The kernel is VPU-bound at head_dim 128
    (matmuls alone run at 85% MFU), so every big-tile pass counts; the
    bias add is skipped entirely in the no-padding variant below."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = (q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)  # (BQ, D)
    k = k_ref[0, 0]  # (BK, D)
    v = v_ref[0, 0]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), already in log2 units
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]  # key-padding bias (pre-scaled to log2)

    m_prev = m_ref[:, 0]  # (BQ,)
    m_cur = jnp.max(s, axis=-1)  # (BQ,)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)  # (BQ,)
    p = jnp.exp2(s - m_new[:, None])  # (BQ, BK) fp32
    l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, 0]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros, not NaN
        o_ref[0, 0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref, scale=scale)


def _pick_block(length: int, preferred: int) -> int:
    """Largest power-of-two block (>=128, <=preferred) dividing `length`,
    assuming length is already a multiple of 128."""
    block = preferred
    while length % block:
        block //= 2
    return max(block, 128)


def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # pad sequence dims to a multiple of 128 (TPU lane width): padded keys get
    # -inf bias, padded query rows are sliced off the output
    lq_pad = (-lq) % 128
    lk_pad = (-lk) % 128
    if lq_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
    if lk_pad and bias is None:
        bias = jnp.zeros((b, lk), dtype=jnp.float32)
    if lk_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        bias = jnp.pad(
            bias.astype(jnp.float32), ((0, 0), (0, lk_pad)), constant_values=NEG_INF
        )
    lq_p, lk_p = lq + lq_pad, lk + lk_pad

    bq = _pick_block(lq_p, block_q)
    bk = _pick_block(lk_p, block_k)
    grid = (b, h, lq_p // bq, lk_p // bk)

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, bk, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0))
    in_specs = [q_spec, kv_spec, kv_spec]
    operands = [q, k, v]
    if bias is not None:
        # kernel works in log2 space (see _flash_kernel); (B, 1, Lk) gives a
        # TPU-legal (1, 1, bk) block
        bias = (bias.astype(jnp.float32) * LOG2E)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda b_, h_, iq, ik: (b_, 0, ik)))
        operands.append(bias)
        kernel = functools.partial(_flash_kernel, scale=d ** -0.5)
    else:
        kernel = functools.partial(_flash_kernel_nobias, scale=d ** -0.5)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum
            pltpu.VMEM((bq, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d,
            bytes_accessed=(2 * b * h * lq_p * d + 2 * b * h * lk_p * d) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(*operands)
    return out[:, :, :lq] if lq_pad else out


@jax.custom_vjp
def flash_mha(q, k, v, bias):
    """Flash attention: q, k, v (B, H, L, D) bf16/fp32, bias (B, Lk) fp32 or None."""
    return _flash_fwd(q, k, v, bias)


def _flash_mha_fwd(q, k, v, bias):
    return _flash_fwd(q, k, v, bias), (q, k, v, bias)


def _flash_mha_bwd(res, g):
    from .attention import mha_xla

    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)
