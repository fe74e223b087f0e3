"""On-hardware numerics check for the RoPE-fused serving attention path.

The fused kernel (ops/flash_attention.flash_mha_rope) is equivalence-tested
in Pallas interpret mode on CPU (tests/test_ops.py), but interpret mode
cannot catch TPU-lowering-specific issues (tiling of the lane-swap concat,
fp32->bf16 rounding order of the on-tile rotation). This script runs the
REAL kernel on the attached chip at the serving shape and compares against
the XLA rotate-then-attend path, both layouts:

  python scripts/check_rope_fused_tpu.py [--l 3968] [--h 24] [--d 128]

Pass criterion mirrors the torch-oracle tolerance used for the model
(rtol 2e-3 on bf16 activations): max|delta| between pallas-fused and
xla-rotated outputs must sit within a few bf16 ulps of the baseline's own
bf16 rounding noise (measured here as xla-bf16 vs xla-fp32 reference).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from visualcloze_tpu.ops.attention import attention, mask_to_bias  # noqa: E402
from visualcloze_tpu.ops.rope import embed_nd  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--l", type=int, default=3968, help="joint seq len (txt+img)")
    p.add_argument("--h", type=int, default=24)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--pad", type=int, default=128, help="trailing key padding")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    b, h, l, d = 1, args.h, args.l, args.d
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    # serving-style 3-axis ids: (batch, row, col) like sampling.prepare_modified
    side = int(np.ceil(np.sqrt(l)))
    ids = np.stack(
        [np.zeros(l), np.arange(l) // side, np.arange(l) % side], -1
    )[None]
    pe = embed_nd(jnp.asarray(ids, jnp.float32), (16, 56, 56), 10_000)
    mask = np.ones((b, l), np.int32)
    if args.pad:
        mask[:, l - args.pad:] = 0
    mask = jnp.asarray(mask)

    fused = jax.jit(
        lambda q, k, v: attention(q, k, v, pe, mask=mask, impl="pallas",
                                  rope_layout="half")
    )(q, k, v)
    xla_b16 = jax.jit(
        lambda q, k, v: attention(q, k, v, pe, mask=mask, impl="xla",
                                  rope_layout="half")
    )(q, k, v)
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    xla_f32 = jax.jit(
        lambda q, k, v: attention(q, k, v, pe, mask=mask, impl="xla",
                                  rope_layout="half")
    )(qf, kf, vf)

    fused_h = np.asarray(fused, np.float32)
    base_h = np.asarray(xla_b16, np.float32)
    ref_h = np.asarray(xla_f32, np.float32)

    real = np.asarray(mask, bool)[0]
    fused_h, base_h, ref_h = (t[:, real] for t in (fused_h, base_h, ref_h))

    d_fused = np.abs(fused_h - ref_h)
    d_base = np.abs(base_h - ref_h)
    d_cross = np.abs(fused_h - base_h)
    scale = np.abs(ref_h).max()

    print(f"shape (B,H,L,D)=({b},{args.h},{l},{d}), pad={args.pad}, "
          f"|ref|max={scale:.3f}")
    print(f"pallas-fused vs fp32 ref : max {d_fused.max():.3e}  "
          f"mean {d_fused.mean():.3e}")
    print(f"xla-bf16     vs fp32 ref : max {d_base.max():.3e}  "
          f"mean {d_base.mean():.3e}")
    print(f"pallas-fused vs xla-bf16 : max {d_cross.max():.3e}  "
          f"mean {d_cross.mean():.3e}")

    # the fused kernel must not be meaningfully noisier than bf16 XLA itself
    ok = d_fused.max() <= 4 * max(d_base.max(), 1e-6) and np.isfinite(
        fused_h
    ).all()
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
