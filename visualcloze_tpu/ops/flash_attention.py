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
  - Gradients: fully fused Pallas backward (dq and dk/dv kernels sharing the
    forward's log2-space probabilities via a saved lane-broadcast LSE) —
    measured 1.6x faster than the XLA attention fwd+bwd at L=4096/H=24/D=128
    on v5e, exact to bf16 resolution.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fwd: tall-k blocks win — at the serving shape (L=4096) bk=4096 covers the
# whole key sequence, so the online-softmax state never round-trips across k
# iterations (one init+finalize per q block, no alpha-rescale passes over the
# accumulator). Measured v5e, L=4096, H=24, D=128:
#   (512, 4096) 38.9% MFU nobias / 36.0% bias;  old (2048, 1024): 34.6%.
# s tile (512, 4096) fp32 = 8 MB; whole block set ~10.5 MB < 16 MB VMEM.
# Non-4096-multiple lengths fall back through _pick_block identically to the
# old defaults (both reduce to 512-blocks for e.g. L=4608).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 4096
# bwd: same tall-k shape at half scale — the extra (BQ, BK) dl tile doubles
# the footprint, so (512, 2048) is the largest tall-k fit (s+dl = 8 MB).
# Measured v5e L=4096 (fwd+recompute+dq+dkv, 3.5x flops accounting):
#   (512, 2048) 81.1%;  (1024, 1024) 78.6%;  (2048, 512) 63.9%.
DEFAULT_BLOCK_Q_BWD = 512
DEFAULT_BLOCK_K_BWD = 2048
NEG_INF = -1e30


LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *, scale,
                  fastmax: bool = False):
    """Online-softmax step in log2 space: the softmax scale (and the 1/ln2
    base change) is folded into q once per (BQ, D) block, so the only
    (BQ, BK)-sized elementwise work per step is one add (bias), one max, one
    exp2 and one sum — exp2 has a fast VPU path while exp(x) lowers to extra
    multiplies on the big tile. The kernel is VPU-bound at head_dim 128
    (matmuls alone run at 85% MFU), so every big-tile pass counts; the
    bias add is skipped entirely in the no-padding variant below.

    fastmax replaces the exact row-max pass over the (BQ, BK) fp32 s tile
    with the Cauchy-Schwarz bound ||q_row|| * max_k ||k_col|| computed on the
    tiny (BQ, D)/(BK, D) operands. Any per-row stabilizer >= rowmax(s) keeps
    the log-sum-exp algebra EXACT (p and l rescale together; m cancels in
    acc/l and in lse = m + log2 l), so the only approximation is fp32
    underflow of 2^(s - bound): the bound's slack is log2(||q||*||k||max /
    max_k q.k) — a few log2 units statistically vs fp32's ~126 of headroom.
    The additive key bias is <= 0 (padding mask), so the bound stays valid."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)
    q = q32.astype(q_ref.dtype)  # (BQ, D)
    k = k_ref[0, 0]  # (BK, D)
    v = v_ref[0, 0]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), already in log2 units
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]  # key-padding bias (pre-scaled to log2)

    m_prev = m_ref[:, 0]  # (BQ,)
    if fastmax:
        k32 = k.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=-1))  # (BQ,) — scaled-q norms
        kn = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=-1)))  # scalar
        m_cur = qn * kn  # >= rowmax(s); skips a full pass over the s tile
    else:
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


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale,
                         fastmax: bool = False):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref, scale=scale,
                  fastmax=fastmax)


# ------------------------- software-pipelined forward -------------------------
#
# At the serving shapes the whole key row fits one block (bk=4096+), so the
# grid's k dimension is size 1 and each grid step is the serial chain
#   s = q@K (MXU)  ->  max/exp2/sum over the (BQ, L) s tile (VPU)  ->  p@V (MXU).
# The device trace shows the kernel at 71% in-model MFU with the gap almost
# exactly the VPU exp2 time — Mosaic does not overlap compute across grid
# steps, so the MXU idles during every softmax pass. Different q blocks are
# independent, so a 1-deep software pipeline hides the VPU under the MXU:
# step i writes s(i) into a ping-pong VMEM scratch and finalizes block i-1
# from the other buffer (output BlockSpec lags the grid by one; one extra
# trailing grid step flushes the last block). No online-softmax state is
# needed at all — with the full key row in one tile the softmax is exact in
# one shot. The RoPE variant rotates K ONCE into a resident scratch at step 0
# (the blocked kernel re-rotates K for every q block) and q per block.
#
# VMEM budget: 2 x (BQ, Lk_p) fp32 s tiles dominate; BQ=128 keeps the pair
# at ~5 MB for Lk_p=5120 and divides every 128-bucketed query length, so the
# pipeline adds no query padding. Guarded by _pipeline_fits.

# serving-forward default; VC_FLASH_PIPELINE=0 falls back to the blocked
# kernel (training/VJP paths always use the blocked kernels — their
# residual/lse plumbing is unchanged)
_PIPELINE_ENABLED = os.environ.get("VC_FLASH_PIPELINE", "1") != "0"
PIPELINE_BLOCK_Q = 128
# 2 s-tiles + resident k/v (+ rotated-k scratch) + q/o/bias blocks, ~1 MB
# slack under the ~16 MB VMEM budget
_PIPELINE_VMEM_BUDGET = 14 * 1024 * 1024


def _pipeline_fits(lq_p: int, lk_p: int, d: int, rope: bool) -> bool:
    if lq_p % PIPELINE_BLOCK_Q:
        return False
    s_tiles = 2 * PIPELINE_BLOCK_Q * lk_p * 4
    kv = 2 * lk_p * d * 2
    bias_row = lk_p * 4  # (1, 1, lk_p) fp32 bias block
    if rope:
        # the rope path keeps THREE more full-width residents: the rotated-k
        # scratch (bf16) and the ck/sk fp32 table blocks (tk_spec streams the
        # whole (lk_p, d) row per grid step) — omitting the tables once let
        # ~6k-seq shapes pass the guard and then fail Mosaic VMEM allocation
        # at compile time instead of falling back to the blocked kernel
        krot = lk_p * d * 2
        tables = 2 * lk_p * d * 4
    else:
        krot = tables = 0
    return s_tiles + kv + bias_row + krot + tables <= _PIPELINE_VMEM_BUDGET


def _softmax_block(sp, v, o_ref):
    """Single-shot softmax + PV for one finished s tile (log2 units, bias
    already added; padded keys carry -inf)."""
    # floor the stabilizer at NEG_INF like the blocked kernel's running-max
    # init: fully-masked rows (every s ~ -1e30*LOG2E < NEG_INF) then underflow
    # p to exactly 0 -> l == 0 -> zero output instead of a softmax over noise
    m = jnp.maximum(jnp.max(sp, axis=-1), NEG_INF)
    p = jnp.exp2(sp - m[:, None])
    l = jnp.sum(p, axis=-1)
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros, not NaN
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l[:, None]).astype(o_ref.dtype)


def _flash_kernel_pipe(q_ref, k_ref, v_ref, bias_ref, o_ref, s_pp, *, scale, nq):
    iq = pl.program_id(2)

    @pl.when(iq < nq)
    def _write():
        q = (q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        s_pp[iq % 2] = s

    @pl.when(iq > 0)
    def _process():
        _softmax_block(s_pp[(iq - 1) % 2], v_ref[0, 0], o_ref)


def _flash_kernel_pipe_nobias(q_ref, k_ref, v_ref, o_ref, s_pp, *, scale, nq):
    _flash_kernel_pipe(q_ref, k_ref, v_ref, None, o_ref, s_pp, scale=scale, nq=nq)


def _flash_kernel_pipe_rope(q_ref, k_ref, v_ref, bias_ref, cq_ref, sq_ref,
                            ck_ref, sk_ref, o_ref, s_pp, krot_ref, *, scale, nq):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _rotate_k():  # once per (batch, head): the blocked kernel pays this per q block
        krot_ref[:] = _rot_half(
            k_ref[0, 0].astype(jnp.float32), ck_ref[0], sk_ref[0]
        ).astype(krot_ref.dtype)

    @pl.when(iq < nq)
    def _write():
        q32 = _rot_half(q_ref[0, 0].astype(jnp.float32), cq_ref[0], sq_ref[0])
        q = (q32 * (scale * LOG2E)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, krot_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        s_pp[iq % 2] = s

    @pl.when(iq > 0)
    def _process():
        _softmax_block(s_pp[(iq - 1) % 2], v_ref[0, 0], o_ref)


def _flash_kernel_pipe_rope_nobias(q_ref, k_ref, v_ref, cq_ref, sq_ref,
                                   ck_ref, sk_ref, o_ref, s_pp, krot_ref, *,
                                   scale, nq):
    _flash_kernel_pipe_rope(q_ref, k_ref, v_ref, None, cq_ref, sq_ref, ck_ref,
                            sk_ref, o_ref, s_pp, krot_ref, scale=scale, nq=nq)


def _flash_fwd_pipelined(q, k, v, bias, rope_tables=None):
    """Pipelined forward on padded operands (both seq dims 128-multiples,
    bias already log2-scaled (B, 1, Lk_p) with -inf on padded keys).
    rope_tables: optional (cq, sq, ck, sk) full-width fp32 tables (the
    rotation then runs in-kernel on unrotated q/k)."""
    b, h, lq_p, d = q.shape
    lk_p = k.shape[2]
    bq = PIPELINE_BLOCK_Q
    nq = lq_p // bq
    grid = (b, h, nq + 1)

    q_spec = pl.BlockSpec(
        (1, 1, bq, d), lambda b_, h_, iq: (b_, h_, jnp.minimum(iq, nq - 1), 0)
    )
    kv_spec = pl.BlockSpec((1, 1, lk_p, d), lambda b_, h_, iq: (b_, h_, 0, 0))
    o_spec = pl.BlockSpec(
        (1, 1, bq, d), lambda b_, h_, iq: (b_, h_, jnp.maximum(iq - 1, 0), 0)
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    operands = [q, k, v]
    with_bias = bias is not None
    if with_bias:
        in_specs.append(pl.BlockSpec((1, 1, lk_p), lambda b_, h_, iq: (b_, 0, 0)))
        operands.append(bias)
    scratch = [pltpu.VMEM((2, bq, lk_p), jnp.float32)]
    if rope_tables is None:
        kernel = functools.partial(
            _flash_kernel_pipe if with_bias else _flash_kernel_pipe_nobias,
            scale=d ** -0.5, nq=nq,
        )
    else:
        cq, sq, ck, sk = rope_tables
        tq_spec = pl.BlockSpec(
            (1, bq, d), lambda b_, h_, iq: (b_, jnp.minimum(iq, nq - 1), 0)
        )
        tk_spec = pl.BlockSpec((1, lk_p, d), lambda b_, h_, iq: (b_, 0, 0))
        in_specs += [tq_spec, tq_spec, tk_spec, tk_spec]
        operands += [cq, sq, ck, sk]
        scratch.append(pltpu.VMEM((lk_p, d), k.dtype))
        kernel = functools.partial(
            _flash_kernel_pipe_rope if with_bias else _flash_kernel_pipe_rope_nobias,
            scale=d ** -0.5, nq=nq,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d,
            bytes_accessed=(2 * b * h * lq_p * d + 2 * b * h * lk_p * d) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(*operands)


def _pad_for_pipeline(q, k, v, bias):
    """Pad seq dims to 128 multiples and prep the log2 bias for the
    pipelined kernel. Returns (q, k, v, bias_or_None, lq, lq_pad)."""
    b, _, lq, _ = q.shape
    lk = k.shape[2]
    lq_pad = (-lq) % PIPELINE_BLOCK_Q
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
    if bias is not None:
        bias = (bias.astype(jnp.float32) * LOG2E)[:, None, :]
    return q, k, v, bias, lq, lq_pad


# ----------------------------- RoPE-fused forward -----------------------------
#
# The serving forward used to rotate q/k in XLA before the kernel — a full
# HBM write+read of both tensors per block (~147 MB/step at the flagship
# shape, docs/PROFILE.md "the only meaningful single-chip headroom left"),
# because the rotation cannot fuse INTO an opaque pallas_call. Here the
# rotation runs inside the kernel on the small (BQ, D)/(BK, D) tiles instead:
# unrotated q/k stream straight from the qkv projection, and the only extra
# HBM traffic is the (L, D) fp32 tables (shared across heads).
#
# Layout: the "half" (de-interleaved) rope layout splits each head's channels
# into [even | odd] halves, so with full-width tables
#   cf = [cos | cos],  sf = [-sin | sin]
# the rotation is  rot(x) = cf * x + sf * swap_halves(x)  — two FMAs and one
# lane-swap per tile, no sub-lane interleaves (see ops/rope.apply_rope_half).


def _rot_half(x32, cf, sf):
    d2 = x32.shape[-1] // 2
    swapped = jnp.concatenate([x32[:, d2:], x32[:, :d2]], axis=-1)
    return cf * x32 + sf * swapped


def _flash_kernel_rope(q_ref, k_ref, v_ref, bias_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, scale):
    """_flash_kernel with the half-layout RoPE rotation fused on the q/k
    blocks (tables pre-expanded to full width by _expand_rope_tables)."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q32 = _rot_half(q_ref[0, 0].astype(jnp.float32), cq_ref[0], sq_ref[0])
    q = (q32 * (scale * LOG2E)).astype(q_ref.dtype)  # (BQ, D)
    k = _rot_half(k_ref[0, 0].astype(jnp.float32), ck_ref[0], sk_ref[0]).astype(
        k_ref.dtype
    )  # (BK, D)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]

    m_prev = m_ref[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, None])
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
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)


def _flash_kernel_rope_nobias(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                              o_ref, m_ref, l_ref, acc_ref, *, scale):
    _flash_kernel_rope(q_ref, k_ref, v_ref, None, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, m_ref, l_ref, acc_ref, scale=scale)


def _expand_rope_tables(cos, sin, lq, lk, lq_pad, lk_pad):
    """(B, L, D/2) half-layout tables -> full-width fp32 (B, L_p, D):
    cf = [cos|cos], sf = [-sin|sin]; padded rows rotate by identity-ish zeros
    (their outputs are masked/sliced anyway)."""
    cf = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32)
    sf = jnp.concatenate([-sin, sin], axis=-1).astype(jnp.float32)
    pad = max(lq_pad, lk_pad)
    if pad:
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        sf = jnp.pad(sf, ((0, 0), (0, pad), (0, 0)))
    return cf[:, : lq + lq_pad], cf[:, : lk + lk_pad], sf[:, : lq + lq_pad], sf[:, : lk + lk_pad]


def _flash_fwd_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """_flash_fwd with the RoPE rotation fused into the kernel. q/k arrive
    UNROTATED in the half layout; cos/sin are the (B, L, D/2) embed_nd
    tables (one table for the joint sequence: q and k share positions)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = _choose_block(lq, block_q)
    bk = _choose_block(lk, block_k)
    lq_pad = (-lq) % bq
    lk_pad = (-lk) % bk
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
    cq, ck, sq, sk = _expand_rope_tables(cos, sin, lq, lk, lq_pad, lk_pad)
    lq_p, lk_p = lq + lq_pad, lk + lk_pad
    grid = (b, h, lq_p // bq, lk_p // bk)

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, bk, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0))
    tq_spec = pl.BlockSpec((1, bq, d), lambda b_, h_, iq, ik: (b_, iq, 0))
    tk_spec = pl.BlockSpec((1, bk, d), lambda b_, h_, iq, ik: (b_, ik, 0))
    in_specs = [q_spec, kv_spec, kv_spec]
    operands = [q, k, v]
    if bias is not None:
        bias = (bias.astype(jnp.float32) * LOG2E)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda b_, h_, iq, ik: (b_, 0, ik)))
        operands.append(bias)
        kernel = functools.partial(_flash_kernel_rope, scale=d ** -0.5)
    else:
        kernel = functools.partial(_flash_kernel_rope_nobias, scale=d ** -0.5)
    in_specs += [tq_spec, tq_spec, tk_spec, tk_spec]
    operands += [cq, sq, ck, sk]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
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
def flash_mha_rope(q, k, v, bias, cos, sin):
    """RoPE-fused flash attention (serving fast path).

    q, k, v: (B, H, L, D) UNROTATED, half rope layout; bias: (B, L) fp32 or
    None; cos/sin: (B, L, D/2) embed_nd tables. Equivalent to
    flash_mha(apply_rope_half(q), apply_rope_half(k), v, bias) with the
    rotation running inside the kernel (no rotated-q/k HBM round trip)."""
    assert q.shape[2] == k.shape[2], "rope fusion expects joint self-attention"
    d = q.shape[-1]
    lq_p = q.shape[2] + (-q.shape[2]) % PIPELINE_BLOCK_Q
    lk_p = k.shape[2] + (-k.shape[2]) % 128
    if _PIPELINE_ENABLED and _pipeline_fits(lq_p, lk_p, d, rope=True):
        lk = k.shape[2]
        q, k, v, bias, lq, lq_pad = _pad_for_pipeline(q, k, v, bias)
        cq, ck, sq, sk = _expand_rope_tables(cos, sin, lq, lk, lq_p - lq, lk_p - lk)
        out = _flash_fwd_pipelined(q, k, v, bias, rope_tables=(cq, sq, ck, sk))
        return out[:, :, :lq] if lq_pad else out
    return _flash_fwd_rope(q, k, v, bias, cos, sin)


def _rot_xla(x, cos, sin, invert=False):
    """apply_rope_half on (B, H, L, D) with (B, L, D/2) tables."""
    from .rope import apply_rope_half

    s = -sin if invert else sin
    return apply_rope_half(x, cos[:, None], s[:, None])


def _flash_mha_rope_fwd(q, k, v, bias, cos, sin):
    # Training path (under jax.grad): rotate in XLA and reuse the lse-saving
    # forward — the rotated q/k double as the backward's residuals, which is
    # exactly what the two-segment remat policy wants (models/layers.py).
    qr = _rot_xla(q, cos, sin)
    kr = _rot_xla(k, cos, sin)
    lq = q.shape[2]
    o, lse, (qp, kp, vp, biasp, lq_pad, lk_pad) = _flash_fwd_lse(qr, kr, v, bias)
    out = o[:, :, :lq] if lq_pad else o
    res = (qp, kp, vp, biasp, o, lse[..., :1], lq_pad, lk_pad, cos, sin)
    return out, res


def _flash_mha_rope_bwd(res, g):
    qp, kp, vp, biasp, o, lse, lq_pad, lk_pad, cos, sin = res
    lse = jnp.broadcast_to(lse, (*lse.shape[:3], 128))
    do = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad), (0, 0))) if lq_pad else g
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (*delta.shape[:3], 128))
    dq_r, dk_r, dv = _pallas_bwd_padded(qp, kp, vp, biasp, do, lse, delta)
    lq = qp.shape[2] - lq_pad
    lk = kp.shape[2] - lk_pad
    dq_r = dq_r[:, :, :lq] if lq_pad else dq_r
    dk_r = dk_r[:, :, :lk] if lk_pad else dk_r
    dv = dv[:, :, :lk] if lk_pad else dv
    # d/d(unrotated) = R^T d/d(rotated) — the inverse rotation (sin -> -sin)
    dq = _rot_xla(dq_r, cos, sin, invert=True)
    dk = _rot_xla(dk_r, cos, sin, invert=True)
    return dq, dk, dv, None, jnp.zeros_like(cos), jnp.zeros_like(sin)


flash_mha_rope.defvjp(_flash_mha_rope_fwd, _flash_mha_rope_bwd)


def _pick_block(length: int, preferred: int) -> int:
    """Largest power-of-two block (>=128, <=preferred) dividing `length`,
    assuming length is already a multiple of 128."""
    block = preferred
    while length % block:
        block //= 2
    return max(block, 128)


def _choose_block(length: int, preferred: int, max_waste: float = 0.125) -> int:
    """Block size for a sequence that need NOT divide evenly: the sequence is
    padded up to a block multiple inside the kernel (padded keys bias-masked,
    padded query rows sliced off). Pick the largest power-of-two block whose
    padding waste stays under `max_waste` — big blocks are much faster
    (38.9% vs 20.5% MFU between 4096 and 512 k-blocks at L=4096) but padding
    multiplies attention work, so e.g. L=4608 prefers bk=1024 (pad to 5120,
    11% waste at 31% MFU) over bk=4096 (pad to 8192, 78% waste)."""
    block = preferred
    while block > 128:
        padded = -(-length // block) * block
        if padded <= length * (1.0 + max_waste):
            return block
        block //= 2
    return 128


def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    fastmax: bool = False,
) -> jnp.ndarray:
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # pad sequence dims up to BLOCK multiples (not just the 128 lane width):
    # padded keys get -inf bias, padded query rows are sliced off the output.
    # Decoupling block size from sequence length keeps big (fast) blocks for
    # lengths they don't divide — _choose_block bounds the padding waste.
    bq = _choose_block(lq, block_q)
    bk = _choose_block(lk, block_k)
    lq_pad = (-lq) % bq
    lk_pad = (-lk) % bk
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
        kernel = functools.partial(_flash_kernel, scale=d ** -0.5, fastmax=fastmax)
    else:
        kernel = functools.partial(_flash_kernel_nobias, scale=d ** -0.5, fastmax=fastmax)

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


# ----------------------------- backward -----------------------------
#
# Standard flash-attention backward, in the same log2 space as the forward:
# with logits l = scale*(q.k) (+bias) and probs p = softmax(l) = 2^(s - lse),
#   delta = rowsum(do * o)
#   dl    = p * (do.v^T - delta)
#   dq    = scale * dl @ k;   dk = scale * dl^T @ q;   dv = p^T @ do
# Padded-query rows carry do = 0 (the attention wrapper zeroes masked query
# outputs), so no query-side masking is needed here; padded keys have p = 0
# through the bias, zeroing their dk/dv.


def _fwd_lse_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = (q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]
    m_prev = m_ref[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, None])
    l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe[:, None]).astype(o_ref.dtype)
        # (bq, 128) lane-broadcast storage: TPU block layouts need a 128 lane
        # dim (same trick as the stock jax kernel's saved residuals)
        lse = m_ref[:, 0] + jnp.log2(l_safe)
        lse_ref[0, 0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[2:])


def _fwd_lse_kernel_nobias(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale):
    _fwd_lse_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, m_ref, l_ref, acc_ref, scale=scale)


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *, scale):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = (q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]
    p = jnp.exp2(s - lse_ref[0, 0][:, :1])  # (BQ, BK)
    do = do_ref[0, 0]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dl = p * (dp - delta_ref[0, 0][:, :1])  # (BQ, BK) fp32
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        dl.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dq_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *, scale):
    _dq_kernel(q_ref, k_ref, v_ref, None, do_ref, lse_ref, delta_ref, dq_ref, acc_ref, scale=scale)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = (q_ref[0, 0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :]
    p = jnp.exp2(s - lse_ref[0, 0][:, :1])  # (BQ, BK)
    do = do_ref[0, 0]
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dl = p * (dp - delta_ref[0, 0][:, :1])
    # dk += dl^T @ (q * scale): use the UNSCALED q -> multiply by scale at end
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        dl.astype(q_ref.dtype), q_ref[0, 0],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _dkv_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    _dkv_kernel(q_ref, k_ref, v_ref, None, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, scale=scale)


def _pad_qkv(q, k, v, bias):
    """Pad the bwd-path operands to BWD-block multiples (padded keys get the
    -inf bias; padded query rows are handled by zero do / sliced outputs)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_pad = (-lq) % _choose_block(lq, DEFAULT_BLOCK_Q_BWD)
    lk_pad = (-lk) % _choose_block(lk, DEFAULT_BLOCK_K_BWD)
    if lq_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
    if lk_pad and bias is None:
        bias = jnp.zeros((b, lk), dtype=jnp.float32)
    if lk_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        bias = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, lk_pad)), constant_values=NEG_INF)
    if bias is not None:
        bias = (bias.astype(jnp.float32) * LOG2E)[:, None, :]
    return q, k, v, bias, lq_pad, lk_pad


def _specs(b, h, bq, bk, d, with_bias):
    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
    k_spec = pl.BlockSpec((1, 1, bk, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0))
    specs = [q_spec, k_spec, k_spec]
    if with_bias:
        specs.append(pl.BlockSpec((1, 1, bk), lambda b_, h_, iq, ik: (b_, 0, ik)))
    return specs


def _flash_fwd_lse(q, k, v, bias):
    """Forward returning (o, lse) with lse in log2 space, for the fused bwd."""
    q, k, v, bias, lq_pad, lk_pad = _pad_qkv(q, k, v, bias)
    b, h, lq_p, d = q.shape
    lk_p = k.shape[2]
    bq = _pick_block(lq_p, DEFAULT_BLOCK_Q_BWD)
    bk = _pick_block(lk_p, DEFAULT_BLOCK_K_BWD)
    grid = (b, h, lq_p // bq, lk_p // bk)
    with_bias = bias is not None
    kernel = functools.partial(
        _fwd_lse_kernel if with_bias else _fwd_lse_kernel_nobias, scale=d ** -0.5
    )
    operands = [q, k, v] + ([bias] if with_bias else [])
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs(b, h, bq, bk, d, with_bias),
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, lq_p, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    return o, lse, (q, k, v, bias, lq_pad, lk_pad)


@jax.custom_vjp
def flash_mha(q, k, v, bias):
    """Flash attention: q, k, v (B, H, L, D) bf16/fp32, bias (B, Lk) fp32 or None."""
    d = q.shape[-1]
    lq_p = q.shape[2] + (-q.shape[2]) % PIPELINE_BLOCK_Q
    lk_p = k.shape[2] + (-k.shape[2]) % 128
    if _PIPELINE_ENABLED and _pipeline_fits(lq_p, lk_p, d, rope=False):
        q, k, v, bias, lq, lq_pad = _pad_for_pipeline(q, k, v, bias)
        out = _flash_fwd_pipelined(q, k, v, bias)
        return out[:, :, :lq] if lq_pad else out
    return _flash_fwd(q, k, v, bias)


def _flash_mha_fwd(q, k, v, bias):
    lq = q.shape[2]
    o, lse, (qp, kp, vp, biasp, lq_pad, lk_pad) = _flash_fwd_lse(q, k, v, bias)
    out = o[:, :, :lq] if lq_pad else o
    # Store lse compact (B, H, Lq_p, 1): the kernel writes it lane-broadcast
    # to 128 (TPU lane-tiling minimum), but persisting the full broadcast as
    # a VJP residual costs 128x the HBM — ~50 MB/call at serving shapes,
    # which is what pushes the two-segment remat policy (models/flux.py
    # "dots_split") out of memory. The backward re-broadcasts for the
    # kernels' (1, 1, bq, 128) operand blocks.
    return out, (qp, kp, vp, biasp, o, lse[..., :1], lq_pad, lk_pad, bias is not None)


def _pallas_bwd_padded(q, k, v, bias, do, lse, delta):
    """Fused backward on already-padded operands.

    q, do: (B, H, Lq_p, D); k, v: (B, H, Lk_p, D) — both seq dims multiples of
    128. bias: (B, 1, Lk_p) in log2 units or None. lse, delta: (B, H, Lq_p, 128)
    lane-broadcast fp32 (lse in log2 units). Returns padded (dq, dk, dv).
    Shared by the full flash_mha VJP and the ring-attention chunk backward.
    """
    b, h, lq_p, d = q.shape
    lk_p = k.shape[2]
    bq = _pick_block(lq_p, DEFAULT_BLOCK_Q_BWD)
    bk = _pick_block(lk_p, DEFAULT_BLOCK_K_BWD)
    with_bias = bias is not None
    scale = d ** -0.5

    # dq: grid (b, h, q-blocks, k-blocks), k innermost accumulating
    specs = _specs(b, h, bq, bk, d, with_bias)
    specs = specs + [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),  # do
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),  # delta
    ]
    operands = [q, k, v] + ([bias] if with_bias else []) + [do, lse, delta]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel if with_bias else _dq_kernel_nobias, scale=scale),
        grid=(b, h, lq_p // bq, lk_p // bk),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*operands)

    # dk/dv: grid (b, h, k-blocks, q-blocks), q innermost accumulating
    kv_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ikk, iq: (b_, h_, iq, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ikk, iq: (b_, h_, ikk, 0)),  # k
        pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ikk, iq: (b_, h_, ikk, 0)),  # v
    ]
    if with_bias:
        kv_specs.append(pl.BlockSpec((1, 1, bk), lambda b_, h_, ikk, iq: (b_, 0, ikk)))
    kv_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ikk, iq: (b_, h_, iq, 0)),  # do
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, ikk, iq: (b_, h_, iq, 0)),  # lse
        pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, ikk, iq: (b_, h_, iq, 0)),  # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel if with_bias else _dkv_kernel_nobias, scale=scale),
        grid=(b, h, lk_p // bk, lq_p // bq),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ikk, iq: (b_, h_, ikk, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, ikk, iq: (b_, h_, ikk, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    return dq, dk, dv


def _flash_mha_bwd(res, g):
    q, k, v, bias, o, lse, lq_pad, lk_pad, had_bias = res
    lq_p = q.shape[2]
    lk_p = k.shape[2]
    lse = jnp.broadcast_to(lse, (*lse.shape[:3], 128))  # un-compact the residual
    do = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad), (0, 0))) if lq_pad else g
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (*delta.shape[:3], 128))  # lane-broadcast (B,H,Lq,128)

    dq, dk, dv = _pallas_bwd_padded(q, k, v, bias, do, lse, delta)

    lq = lq_p - lq_pad
    lk = lk_p - lk_pad
    dq = dq[:, :, :lq] if lq_pad else dq
    dk = dk[:, :, :lk] if lk_pad else dk
    dv = dv[:, :, :lk] if lk_pad else dv
    return dq, dk, dv, None


flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def chunk_bwd_pallas(q, k, v, bias, do, lse, delta):
    """Ring-attention chunk backward via the fused Pallas kernels.

    Unpadded operands: q, do (B, H, Lq, D); k, v (B, H, Lk, D); bias (B, Lk)
    additive fp32 (natural units) or None; lse (B, H, Lq) GLOBAL log-sum-exp
    in log2 units; delta (B, H, Lq) fp32 rowsum(do*o_final). Returns
    (dq, dk, dv) partial gradients for this (q-shard, kv-chunk) pair.
    """
    lq = q.shape[2]
    lk = k.shape[2]
    qp, kp, vp, biasp, lq_pad, lk_pad = _pad_qkv(q, k, v, bias)
    if lq_pad:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
        # padded q rows: do = 0 and (with zero q) s - lse = 0 -> p finite, dl = 0
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, lq_pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad)))
    lse_l = jnp.broadcast_to(lse.astype(jnp.float32)[..., None], (*lse.shape, 128))
    delta_l = jnp.broadcast_to(delta.astype(jnp.float32)[..., None], (*delta.shape, 128))
    dq, dk, dv = _pallas_bwd_padded(qp, kp, vp, biasp, do, lse_l, delta_l)
    if lq_pad:
        dq = dq[:, :, :lq]
    if lk_pad:
        dk, dv = dk[:, :, :lk], dv[:, :, :lk]
    return dq, dk, dv
