"""Pallas fused 3x3 convolution for the VAE resnet path (v5e).

XLA's NHWC 3x3 conv runs ~17% MFU at the VAE's shapes (C=128..512, huge
spatial dims) and every GroupNorm/swish between convs is a separate HBM
round-trip. This kernel computes

    y = conv3x3(act(x * a + b0), w) + bias (+ residual)

in one pass: the input strip is loaded to VMEM once, the GroupNorm affine
(per-(batch, channel) scale/offset, stats computed separately on the tiny
channel-sum path — see models/autoencoder.group_norm_affine) and swish are
applied in fp32 on the loaded tile, and the 9 shifted (bh*W, C) @ (C, Cout)
MXU matmuls accumulate in fp32 registers. Replaces the reference's
torch GroupNorm->SiLU->Conv2d chains (ref models/modules/autoencoder.py:
55-83) with a single fused op. Measured v5e at the serving row shape
(2x384x1152): encoder 118->53 ms, decoder 213->111 ms vs the XLA conv path
(35.6% / 41.1% model-level MFU vs ~17%).

Grid layout: (B, H/bh) row strips. SAME padding is pre-applied on the host
side of the call (one cheap XLA pad); each step reads its strip plus a
2-row halo through a second BlockSpec on the same array — block height 2,
index (r+1)*bh/2, which lands exactly on the strip's bottom edge for even
bh. The lane dim stays C (a 128 multiple for every fused level), W sits on
sublanes, so the dj in {0,1,2} column shifts are cheap vector shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_H = 4  # bh=8 at W*C=147k blows the 16 MB scoped-vmem limit (double-buffered blocks + fp32 acc)
# per-step window budget in elements: (bh+2)(W+2)max(C,Cout) must stay under
# this for the 16 MB scoped-vmem limit (measured incl. the fp32 activation
# temp and double-buffered blocks). Shared by the kernel's bh reduction,
# _pick_bw and the fusable() gate so they can never disagree.
VMEM_BUDGET = 880_000


def _kernel(*refs, bh: int, w_out: int, pre: bool, act: str):
    if pre:
        x_ref, halo_ref, w_ref, b_ref, a_ref, off_ref, o_ref = refs
    else:
        x_ref, halo_ref, w_ref, b_ref, o_ref = refs

    xa = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)  # (bh+2, W+2, C)
    if pre:
        x32 = (
            xa.astype(jnp.float32) * a_ref[0, 0][None, None, :]
            + off_ref[0, 0][None, None, :]
        )
        if act == "swish":
            x32 = x32 * jax.nn.sigmoid(x32)
        # zero-padding is conv-side, i.e. AFTER the activation: swish(b0) != 0
        # on the pad border, so mask the transformed halo back to zero. Valid
        # global rows/cols are [1, H] / [1, W] in the padded frame.
        ncol = x32.shape[1]
        # natively-3D iotas: mosaic can't insert a minor dim on an i1 vector
        row = pl.program_id(1) * bh + jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        nr = pl.num_programs(1)
        valid = (row >= 1) & (row <= nr * bh) & (col >= 1) & (col <= ncol - 2)
        x32 = jnp.where(valid, x32, 0.0)
        xa = x32.astype(x_ref.dtype)

    # One sublane shift per dj (cheap vector rotate on the (W, C) tile dims);
    # the di row slices index the untiled leading dim and are free views.
    # (K-packing variants were tried and rejected: packing the dj shifts into
    # K=3C does not lower — mosaic cannot concatenate lane-dim vectors with
    # distinct sublane offsets — and packing the di row views (same offsets,
    # legal) measured flat, so the 9-matmul form is not issue-bound.)
    acc = None
    for dj in range(3):
        xv = xa[:, dj : dj + w_out, :]  # (bh+2, W, C)
        for di in range(3):
            y = jax.lax.dot_general(
                xv[di : di + bh], w_ref[di, dj],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    acc = acc + b_ref[0][None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _kernel_wtiled(*refs, bh: int, bw: int, pre: bool, act: str):
    """Column-tiled variant: assembles the (bh+2, bw+2, C) window from four
    blocks — main strip, an 8-wide right halo (width-2 blocks are not
    TPU-legal; only the first 2 columns are used), a 2-row bottom halo and
    the 8-wide bottom-right corner."""
    if pre:
        x_ref, right_ref, bot_ref, cor_ref, w_ref, b_ref, a_ref, off_ref, o_ref = refs
    else:
        x_ref, right_ref, bot_ref, cor_ref, w_ref, b_ref, o_ref = refs

    top = jnp.concatenate([x_ref[0], right_ref[0][:, :2]], axis=1)  # (bh, bw+2, C)
    bottom = jnp.concatenate([bot_ref[0], cor_ref[0][:, :2]], axis=1)  # (2, bw+2, C)
    xa = jnp.concatenate([top, bottom], axis=0)  # (bh+2, bw+2, C)
    if pre:
        x32 = (
            xa.astype(jnp.float32) * a_ref[0, 0][None, None, :]
            + off_ref[0, 0][None, None, :]
        )
        if act == "swish":
            x32 = x32 * jax.nn.sigmoid(x32)
        row = pl.program_id(1) * bh + jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        col = pl.program_id(2) * bw + jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        valid = (
            (row >= 1)
            & (row <= pl.num_programs(1) * bh)
            & (col >= 1)
            & (col <= pl.num_programs(2) * bw)
        )
        x32 = jnp.where(valid, x32, 0.0)
        xa = x32.astype(x_ref.dtype)

    acc = None
    for dj in range(3):
        xv = xa[:, dj : dj + bw, :]
        for di in range(3):
            y = jax.lax.dot_general(
                xv[di : di + bh], w_ref[di, dj],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    acc = acc + b_ref[0][None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_bw(W: int, C: int, Cout: int, bh: int, budget: int = VMEM_BUDGET) -> int | None:
    """Largest 8-multiple divisor of W whose (bh+2)(bw+2)max(C,Cout) window
    fits the scoped-vmem budget; None if even the full width fits (single-
    tile fast path) or no legal tile exists."""
    maxc = max(C, Cout)
    if (bh + 2) * (W + 2) * maxc <= budget:
        return None
    for bw in range((W // 2) // 8 * 8, 127, -8):
        if W % bw == 0 and (bh + 2) * (bw + 2) * maxc <= budget:
            return bw
    return None


def conv3x3_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    pre_affine: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    act: str = "swish",
    residual: jnp.ndarray | None = None,
    block_h: int = DEFAULT_BLOCK_H,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused act(x*a+b0) -> conv3x3 SAME -> +bias (+residual).

    Args:
      x: (B, H, W, C) bf16/fp32; H must be a multiple of block_h (even).
      w: (3, 3, C, Cout); b: (Cout,).
      pre_affine: optional per-(batch, channel) fp32 (a, b0), each (B, C) —
        the collapsed GroupNorm normalize+affine. When given, `act` is
        applied after the affine ("swish" or "none").
      residual: optional (B, H, W, Cout) added to the output (outside the
        kernel; bf16 add, matching the unfused path's semantics).
    Returns: (B, H, W, Cout) in x.dtype.
    """
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    if pre_affine is None and act != "none":
        raise ValueError("act is applied to the pre_affine transform; pass "
                         "act='none' for a plain conv")
    # bh=4 measured fastest where it fits (bh=8 at the 48x144x512 bottleneck
    # is 10% slower; the W*C=147k C=512 level needs bh=2 in model context —
    # 16.44M scoped-vmem at bh=4, 452K over the limit). Widths whose full-row
    # strip exceeds the budget tile the column dim too (_pick_bw).
    bh = block_h
    while bh > 1 and H % bh:
        bh //= 2
    if bh < 2 or bh % 2:
        raise ValueError(f"H={H} not tileable (needs an even strip height)")
    bw = _pick_bw(W, C, Cout, bh)
    while bw is None and (bh + 2) * (W + 2) * max(C, Cout) > VMEM_BUDGET:
        bh //= 2
        if bh < 2:
            raise ValueError(f"shape {x.shape}->{Cout} not tileable")
        bw = _pick_bw(W, C, Cout, bh)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)

    pre = pre_affine is not None
    cost = pl.CostEstimate(
        flops=2 * B * H * W * C * Cout * 9,
        bytes_accessed=(B * H * W * (C + Cout) + 9 * C * Cout) * x.dtype.itemsize,
        transcendentals=B * H * W * C if pre else 0,
    )
    bias_op = b.reshape(1, Cout).astype(jnp.float32)
    if pre:
        a, b0 = pre_affine
        # (B, 1, C) so the block's last two dims (1, C) match the array's
        # (TPU lowering requires (8k, 128k) or dim-equal trailing blocks)
        aff_ops = [
            a.reshape(B, 1, C).astype(jnp.float32),
            b0.reshape(B, 1, C).astype(jnp.float32),
        ]

    if bw is None:
        main_spec = pl.BlockSpec((1, bh, W + 2, C), lambda b_, r: (b_, r, 0, 0))
        halo_spec = pl.BlockSpec(
            (1, 2, W + 2, C), lambda b_, r, bh=bh: (b_, (r + 1) * (bh // 2), 0, 0)
        )
        in_specs = [
            main_spec,
            halo_spec,
            pl.BlockSpec((3, 3, C, Cout), lambda b_, r: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda b_, r: (0, 0)),
        ]
        operands = [xp, xp, w, bias_op]
        if pre:
            aff_spec = pl.BlockSpec((1, 1, C), lambda b_, r: (b_, 0, 0))
            in_specs += [aff_spec, aff_spec]
            operands += aff_ops
        out = pl.pallas_call(
            functools.partial(_kernel, bh=bh, w_out=W, pre=pre, act=act),
            grid=(B, H // bh),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bh, W, Cout), lambda b_, r: (b_, r, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
    else:
        hh, ww = bh // 2, bw // 8
        in_specs = [
            pl.BlockSpec((1, bh, bw, C), lambda b_, r, c_: (b_, r, c_, 0)),
            pl.BlockSpec(  # right halo: 8 wide (width 2 is not TPU-legal)
                (1, bh, 8, C), lambda b_, r, c_, ww=ww: (b_, r, (c_ + 1) * ww, 0)
            ),
            pl.BlockSpec(
                (1, 2, bw, C), lambda b_, r, c_, hh=hh: (b_, (r + 1) * hh, c_, 0)
            ),
            pl.BlockSpec(
                (1, 2, 8, C),
                lambda b_, r, c_, hh=hh, ww=ww: (b_, (r + 1) * hh, (c_ + 1) * ww, 0),
            ),
            pl.BlockSpec((3, 3, C, Cout), lambda b_, r, c_: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda b_, r, c_: (0, 0)),
        ]
        operands = [xp, xp, xp, xp, w, bias_op]
        if pre:
            aff_spec = pl.BlockSpec((1, 1, C), lambda b_, r, c_: (b_, 0, 0))
            in_specs += [aff_spec, aff_spec]
            operands += aff_ops
        out = pl.pallas_call(
            functools.partial(_kernel_wtiled, bh=bh, bw=bw, pre=pre, act=act),
            grid=(B, H // bh, W // bw),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bh, bw, Cout), lambda b_, r, c_: (b_, r, c_, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
    if residual is not None:
        # added outside the kernel: a residual block operand costs 2x its
        # size in double-buffered VMEM (blew the 16 MB scoped budget at the
        # W*C=147k levels), while this is one cheap fused XLA pass.
        out = out + residual.astype(out.dtype)
    return out


def fusable(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    """Shapes the kernel handles: 128-multiple channels, tileable H, and a
    (bh=2) strip — full-width or column-tiled — fitting the scoped-vmem
    budget."""
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    if not (C % 128 == 0 and Cout % 128 == 0 and tuple(w.shape[:2]) == (3, 3) and H % 2 == 0):
        return False
    return (
        4 * (W + 2) * max(C, Cout) <= VMEM_BUDGET
        or _pick_bw(W, C, Cout, 2) is not None
    )
