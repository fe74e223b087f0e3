"""Pallas int8-weight matmul: y = x_bf16 @ (w_int8 * scale).

Serving kernel for weight-only-quantized linears (models/quant.py): weight
tiles stream from HBM as int8 (half the bandwidth of bf16) and are converted
to bf16 in VMEM right before the MXU dot — the convert never materializes in
HBM, which also makes the kernel layout-agnostic (it consumes the default
int8 array layout, sidestepping the PJRT whole-tree relayout that OOMs when
feeding a pre-built 12 GB tree to a jitted XLA program; docs/ROADMAP.md #2).

fp32 accumulation across k blocks in VMEM scratch; per-output-channel scale
applied at the final k step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BM = 512
DEFAULT_BN = 1024
DEFAULT_BK = 1024


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (bm, bk) bf16
    w = w_ref[:].astype(x.dtype)  # (bk, bn) int8 -> bf16 in VMEM
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * scale_ref[0][None, :].astype(jnp.float32)).astype(o_ref.dtype)


def _pick(length: int, preferred: int) -> int:
    block = preferred
    while length % block:
        block //= 2
    return max(block, 128)


def int8_matmul(
    x: jnp.ndarray,
    w_int8: jnp.ndarray,
    scale: jnp.ndarray,
    block_m: int = DEFAULT_BM,
    block_n: int = DEFAULT_BN,
    block_k: int = DEFAULT_BK,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """x (..., K) bf16 @ w_int8 (K, N) * scale (N,) -> (..., N) out_dtype.

    Leading dims of x are flattened into M; M is padded to a lane multiple.
    K and N must be multiples of 128 (true for all FLUX shapes).
    """
    *lead, k = x.shape
    kn, n = w_int8.shape
    assert kn == k, (x.shape, w_int8.shape)
    if k % 128 or n % 128:
        # a non-dividing block would floor-truncate the grid and leave the
        # tail output columns as uninitialized memory — fail loudly instead
        raise ValueError(f"K and N must be multiples of 128, got K={k} N={n}")
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    m_pad = (-m) % 128
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    mp = m + m_pad

    bm = _pick(mp, block_m)
    bn = _pick(n, block_n)
    bk = _pick(k, block_k)
    grid = (mp // bm, n // bn, k // bk)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2,
            transcendentals=0,
        ),
    )(x2, w_int8, scale.reshape(1, n).astype(jnp.float32))
    if m_pad:
        out = out[:m]
    return out.reshape(*lead, n)
