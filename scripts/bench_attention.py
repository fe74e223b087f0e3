"""Standalone flash-attention kernel microbenchmark (v5e).

Measures fwd MFU at the serving shape over block-size / precision variants:
  python scripts/bench_attention.py [--bwd]

Attention MFU accounting: 4*B*H*L^2*D FLOPs per forward call.

CAVEAT (docs/PROFILE.md): the chained-call methodology UNDERESTIMATES the
kernel — the output->input feedback serializes the Pallas block-DMA pipeline
between calls (38-39% MFU here vs 71% measured in the real model by device
trace). Use these numbers to compare variants A/B, not as absolute MFU; for
absolute numbers, trace the model and read per-op device durations.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

V5E_PEAK_BF16 = 197e12


INNER = 20  # kernel calls per compiled program: amortizes the tunnel RTT


def chain(call):
    """Loop the kernel INNER times inside ONE program, feeding the output back
    as q so XLA can't elide iterations (axon-tunnel timing rule: time big
    compiled programs, never micro-ops)."""

    def run(q, k, v):
        def body(qc, _):
            o = call(qc, k, v)
            return o.astype(qc.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=INNER)
        return out

    return jax.jit(run)


def measure(fn, *args, iters=5):
    _ = np.asarray(fn(*args)[..., :1, :1], np.float32)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args)[..., :1, :1], np.float32)
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / INNER


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=1)
    p.add_argument("--h", type=int, default=24)
    p.add_argument("--l", type=int, default=4096)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--bias", action="store_true")
    p.add_argument("--bwd", action="store_true")
    args = p.parse_args()

    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((args.b, args.h, args.l, args.d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((args.b, args.h, args.l, args.d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((args.b, args.h, args.l, args.d)), jnp.bfloat16)
    bias = None
    if args.bias:
        mask = np.ones((args.b, args.l), np.int32)
        mask[:, -128:] = 0
        bias = jnp.asarray(np.where(mask > 0, 0.0, -1e30), jnp.float32)

    flops = 4 * args.b * args.h * args.l * args.l * args.d
    if args.bwd:
        flops *= 3.5  # fwd + recompute + dq + dkv

        def grad_call(qc, k, v):
            def loss(q, k, v):
                return jnp.sum(fa.flash_mha(q, k, v, bias).astype(jnp.float32) ** 2)

            return jax.grad(loss, argnums=(0,))(qc, k, v)[0]

        t = measure(chain(grad_call), q, k, v)
        print(f"bwd: {t * 1e3:.2f} ms  MFU {flops / t / V5E_PEAK_BF16:.1%}")
        return

    for bq, bk in [(1024, 1024), (2048, 1024), (1024, 512), (512, 1024), (512, 512)]:
        f = chain(lambda qc, k, v, bq=bq, bk=bk: fa._flash_fwd(qc, k, v, bias, block_q=bq, block_k=bk))
        try:
            t = measure(f, q, k, v)
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}")
            continue
        print(f"bq={bq} bk={bk}: {t * 1e3:.2f} ms  MFU {flops / t / V5E_PEAK_BF16:.1%}")

    ref = chain(lambda qc, k, v: jax.nn.dot_product_attention(
        qc.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3))
    t = measure(ref, q, k, v)
    print(f"XLA dot_product_attention: {t * 1e3:.2f} ms  MFU {flops / t / V5E_PEAK_BF16:.1%}")


if __name__ == "__main__":
    main()
