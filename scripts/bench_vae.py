"""VAE microbenchmark: encoder/decoder breakdown + raw-conv probes (v5e).

The e2e bench (bench.py phase V) measures the VAE at ~17% MFU; this script
localizes where the time goes so tuning targets the right stage:

  python scripts/bench_vae.py            # component breakdown at bench shapes
  python scripts/bench_vae.py --probe    # raw conv3x3 MFU at each pyramid level

Chained timing (axon rule): every measured quantity loops INNER times inside
one compiled program with a data dependency, so tunnel RTT amortizes away.
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
INNER = 8


def chain(call):
    """Loop `call` INNER times in one program; re-inject a scalar of the
    output into the input so XLA cannot elide iterations."""

    def run(x):
        def body(xc, _):
            y = call(xc)
            # fold a scalar of y back into x to create the dependency
            bump = jnp.mean(y).astype(xc.dtype) * 1e-8
            return xc + bump, None

        out, _ = jax.lax.scan(body, x, None, length=INNER)
        return out

    return jax.jit(run)


def measure(fn, x, iters=5):
    np.asarray(jax.block_until_ready(fn(x))[..., :1], np.float32)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(x))[..., :1], np.float32)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / INNER


def conv_flops(h, w, cin, cout, k=3):
    return 2.0 * h * w * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--rows", type=int, default=2)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=1152)
    args = ap.parse_args()

    from visualcloze_tpu.config import AutoEncoderConfig
    from visualcloze_tpu.models import autoencoder as ae

    cfg = AutoEncoderConfig()
    rng = np.random.default_rng(0)

    if args.probe:
        # raw conv3x3 at each decoder pyramid level (bf16, NHWC)
        chans = [cfg.ch * m for m in cfg.ch_mult]  # [128, 256, 512, 512]
        levels = []
        h, w = args.h // 8, args.w // 8
        for c in reversed(chans):
            levels.append((h, w, c))
            h, w = h * 2, w * 2
        for h, w, c in levels:
            x = jnp.asarray(rng.standard_normal((args.rows, h, w, c)), jnp.bfloat16)
            wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)

            def call(xc, wt=wt):
                return jax.lax.conv_general_dilated(
                    xc, wt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            t = measure(chain(call), x)
            fl = args.rows * conv_flops(h, w, c, c)
            print(f"conv3x3 {args.rows}x{h}x{w}x{c}: {t*1e3:7.2f} ms  "
                  f"{fl/t/1e12:6.1f} TF/s  {fl/t/V5E_PEAK_BF16*100:5.1f}% MFU")

            # groupnorm at the same shape
            gp = {"scale": jnp.ones((c,), jnp.bfloat16), "bias": jnp.zeros((c,), jnp.bfloat16)}
            t = measure(chain(lambda xc, gp=gp: ae.group_norm(gp, xc)), x)
            gb = 2 * args.rows * h * w * c * 2 / 1e9  # bf16 read+write
            print(f"  groupnorm: {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s eff")
        return

    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rows = jnp.asarray(
        rng.uniform(-1, 1, (args.rows, args.h, args.w, 3)), jnp.bfloat16)
    z = jnp.asarray(
        rng.standard_normal((args.rows, args.h // 8, args.w // 8, cfg.z_channels)),
        jnp.bfloat16)

    enc = chain(lambda x: ae.encoder_apply(cfg, params["encoder"], x)[..., :3])
    dec = chain(lambda zc: ae.decoder_apply(cfg, params["decoder"], zc)[:, ::8, ::8, :])

    t_enc = measure(enc, rows)
    t_dec = measure(dec, z)

    # split analytic FLOPs into enc/dec parts
    import bench as B
    total = B.vae_flops(cfg, args.h, args.w) * args.rows
    # encoder share: recompute encoder-only
    def enc_flops():
        chans = [cfg.ch * m for m in cfg.ch_mult]
        tot = conv_flops(args.h, args.w, cfg.in_channels, chans[0])
        hh, ww, cin = args.h, args.w, chans[0]
        for i, c in enumerate(chans):
            for _ in range(cfg.num_res_blocks):
                tot += conv_flops(hh, ww, cin, c) + conv_flops(hh, ww, c, c)
                cin = c
            if i != len(chans) - 1:
                tot += conv_flops(hh // 2, ww // 2, c, c)
                hh, ww = hh // 2, ww // 2
        tot += 6 * conv_flops(hh, ww, cin, cin)
        tot += conv_flops(hh, ww, cin, 2 * cfg.z_channels)
        return tot

    fe = enc_flops() * args.rows
    fd = total - fe
    print(f"encoder {args.rows}x{args.h}x{args.w}: {t_enc*1e3:7.1f} ms  "
          f"{fe/t_enc/1e12:6.1f} TF/s  {fe/t_enc/V5E_PEAK_BF16*100:5.1f}% MFU")
    print(f"decoder {args.rows}x{args.h//8}x{args.w//8}->x8: {t_dec*1e3:7.1f} ms  "
          f"{fd/t_dec/1e12:6.1f} TF/s  {fd/t_dec/V5E_PEAK_BF16*100:5.1f}% MFU")


if __name__ == "__main__":
    main()
