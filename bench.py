"""Benchmark: 384-grid / 30-step rectified-flow sampling latency on TPU.

Measures the denoise hot loop (the pipeline's dominant cost, SURVEY.md §3.2:
30 Euler steps x full DiT over 3456 img + 512 txt tokens) on ONE chip and
reports the headline metric as one JSON line.

The full 12B FLUX does not fit a single v5e chip in bf16 (16 GB HBM), so the
measurement runs the flagship *width* (hidden 3072, 24 heads, fill 384-ch
input, bf16, Pallas flash attention) at reduced depth and extrapolates
per-step latency linearly in analytic FLOPs — block structure is identical,
so per-block cost is constant; multi-chip serving shards depth-complete
models (parallel/).

vs_baseline: the reference publishes no speed numbers (BASELINE.md), so the
comparison is against the hardware speed-of-light for the same FLOPs
(v5e bf16 peak 197 TFLOP/s): vs_baseline = SOL_latency / measured_latency,
i.e. 1.0 == running at peak MXU utilization.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s

# flagship sampling config (SURVEY.md §3.2): 2x3 grid @ 384 -> one row is
# 384x1152 px -> latent 48x144 -> 1728 tokens; 2 rows = 3456 img tokens
L_IMG, L_TXT = 3456, 512  # true image tokens (2x3 grid @ 384)
L_IMG_PAD = 3584          # bucketed to keep txt+img a 512-multiple (serving config)
STEPS = 30
BENCH_DEPTH, BENCH_DEPTH_SINGLE = 4, 8


def linear_flops(cfg, l_img: int, l_txt: int) -> float:
    """Analytic matmul+attention FLOPs for one DiT forward."""
    h = cfg.hidden_size
    L = l_img + l_txt
    double = 2 * L * 18 * h * h + 4 * L * L * h  # per double block (both streams)
    single = 2 * L * 15 * h * h + 4 * L * L * h  # per single block
    io = 2 * l_img * cfg.in_channels * h + 2 * l_txt * cfg.context_in_dim * h \
        + 2 * l_img * h * cfg.out_channels
    return cfg.depth * double + cfg.depth_single_blocks * single + io


def main() -> None:
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import flux_apply, init_flux
    from visualcloze_tpu.ops.schedule import ode_timesteps
    from visualcloze_tpu.transport.sampling import denoise_ode

    from visualcloze_tpu.models.weights import permute_rope_layout

    full_cfg = FluxConfig()
    cfg = dataclasses.replace(
        full_cfg, depth=BENCH_DEPTH, depth_single_blocks=BENCH_DEPTH_SINGLE
    )
    print(f"init {cfg.depth}+{cfg.depth_single_blocks}-block flagship-width DiT (bf16)...",
          file=sys.stderr)
    params = init_flux(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # serving configuration: half-rope layout (pipeline default)
    params = permute_rope_layout(params, cfg)

    rng = np.random.default_rng(0)
    b = 1
    img_ids = np.zeros((b, L_IMG_PAD, 3), np.float32)
    img_ids[:, :L_IMG, 0] = np.repeat([1, 2], L_IMG // 2)
    img_ids[:, :L_IMG, 1] = np.tile(np.arange(L_IMG // 2) // 72, 2)
    img_ids[:, :L_IMG, 2] = np.tile(np.arange(L_IMG // 2) % 72, 2)
    img_mask = np.zeros((b, L_IMG_PAD), np.int32)
    img_mask[:, :L_IMG] = 1
    x = jnp.asarray(rng.standard_normal((b, L_IMG_PAD, 64)), jnp.bfloat16)
    cond = jnp.asarray(rng.standard_normal((b, L_IMG_PAD, 320)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((b, L_TXT, cfg.context_in_dim)), jnp.bfloat16)
    txt_ids = jnp.zeros((b, L_TXT, 3), jnp.float32)
    vec = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.bfloat16)
    guidance = jnp.full((b,), 30.0, jnp.bfloat16)
    ids = jnp.asarray(img_ids)
    mask = jnp.asarray(img_mask)

    @jax.jit
    def run(params, x, ts):
        def model_fn(img, timesteps, **_):
            return flux_apply(
                cfg, params, img=img, img_ids=ids, txt=txt, txt_ids=txt_ids,
                timesteps=timesteps, y=vec, guidance=guidance, rope_layout="half",
                img_mask=mask,
            )

        return denoise_ode(model_fn, x, ts, {}, cond=cond)

    ts = jnp.asarray(ode_timesteps(STEPS + 1, L_IMG, do_shift=True))  # 30 steps; mu from true length
    print("compiling + warmup...", file=sys.stderr)
    run(params, x, ts).block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run(params, x, ts).block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    per_step = p50 / STEPS

    bench_flops = linear_flops(cfg, L_IMG, L_TXT)
    full_flops = linear_flops(full_cfg, L_IMG, L_TXT)
    scale = full_flops / bench_flops
    full_latency = p50 * scale
    sol_latency = full_flops * STEPS / V5E_PEAK_BF16
    mfu = bench_flops / per_step / V5E_PEAK_BF16

    print(
        f"bench(depth {cfg.depth}+{cfg.depth_single_blocks}): p50 {p50:.3f}s "
        f"({per_step * 1e3:.1f} ms/step, MFU {mfu:.1%}); "
        f"12B extrapolation x{scale:.2f} -> {full_latency:.2f}s / 30-step query; "
        f"SOL {sol_latency:.2f}s; throughput {1.0 / full_latency:.4f} img/s/chip "
        f"(north-star secondary metric, BASELINE.md)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "p50 latency, 384-grid 2x3 / 30-step query (12B DiT, 1 chip, FLOPs-extrapolated)",
                "value": round(full_latency, 3),
                "unit": "s",
                "vs_baseline": round(sol_latency / full_latency, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
