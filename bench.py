"""Benchmark: 384-grid / 30-step rectified-flow sampling latency on TPU.

Two measurements of the denoise hot loop (the pipeline's dominant cost,
SURVEY.md §3.2: 30 Euler steps x full DiT over 3456 img + 512 txt tokens),
both at the shipped serving configuration (bf16 compute, Pallas flash
attention, half-rope layout, 512-bucketed masked sequences):

  A. flagship-width bf16 slice (4+8 of 19+38 blocks — the 12B bf16 model
     does not fit one 16 GB chip) -> per-step MFU + FLOPs-linear
     extrapolation to the full model;
  B. the FULL 12B model with int8 weight-only quantization (models/quant.py)
     -> MEASURED single-chip query latency (headline). Weights are built
     in-program (random int8; ~0.3s of the reported time) so no 12 GB
     host->device relayout is involved.

vs_baseline: the reference publishes no speed numbers (BASELINE.md), so the
comparison is the hardware speed-of-light for the same bf16 FLOPs (v5e peak
197 TFLOP/s): vs_baseline = SOL_latency / measured_latency (1.0 == peak MXU).
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

# flagship sampling config (SURVEY.md §3.2): 2x3 grid @ 384 -> 3456 img tokens
L_IMG, L_TXT = 3456, 512  # true image tokens
L_IMG_PAD = 3584          # bucketed so txt+img stays a 512-multiple
STEPS = 30
BENCH_DEPTH, BENCH_DEPTH_SINGLE = 4, 8


def linear_flops(cfg, l_img: int, l_txt: int) -> float:
    h = cfg.hidden_size
    L = l_img + l_txt
    double = 2 * L * 18 * h * h + 4 * L * L * h
    single = 2 * L * 15 * h * h + 4 * L * L * h
    io = 2 * l_img * cfg.in_channels * h + 2 * l_txt * cfg.context_in_dim * h \
        + 2 * l_img * h * cfg.out_channels
    return cfg.depth * double + cfg.depth_single_blocks * single + io


def make_inputs(cfg):
    rng = np.random.default_rng(0)
    b = 1
    img_ids = np.zeros((b, L_IMG_PAD, 3), np.float32)
    img_ids[:, :L_IMG, 0] = np.repeat([1, 2], L_IMG // 2)
    img_ids[:, :L_IMG, 1] = np.tile(np.arange(L_IMG // 2) // 72, 2)
    img_ids[:, :L_IMG, 2] = np.tile(np.arange(L_IMG // 2) % 72, 2)
    img_mask = np.zeros((b, L_IMG_PAD), np.int32)
    img_mask[:, :L_IMG] = 1
    return dict(
        x=jnp.asarray(rng.standard_normal((b, L_IMG_PAD, 64)), jnp.bfloat16),
        cond=jnp.asarray(rng.standard_normal((b, L_IMG_PAD, 320)), jnp.bfloat16),
        txt=jnp.asarray(rng.standard_normal((b, L_TXT, cfg.context_in_dim)), jnp.bfloat16),
        txt_ids=jnp.zeros((b, L_TXT, 3), jnp.float32),
        vec=jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.bfloat16),
        guidance=jnp.full((b,), 30.0, jnp.bfloat16),
        ids=jnp.asarray(img_ids),
        mask=jnp.asarray(img_mask),
    )


def make_run(cfg, inp, rope_layout="half"):
    from visualcloze_tpu.models.flux import flux_apply
    from visualcloze_tpu.transport.sampling import denoise_ode

    def run(params, x, ts):
        def model_fn(img, timesteps, **_):
            return flux_apply(
                cfg, params, img=img, img_ids=inp["ids"], txt=inp["txt"],
                txt_ids=inp["txt_ids"], timesteps=timesteps, y=inp["vec"],
                guidance=inp["guidance"], rope_layout=rope_layout,
                img_mask=inp["mask"],
            )

        return denoise_ode(model_fn, x, ts, {}, cond=inp["cond"])

    return run


def bench_bf16_slice(ts) -> dict:
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import init_flux
    from visualcloze_tpu.models.weights import permute_rope_layout

    full_cfg = FluxConfig()
    cfg = dataclasses.replace(full_cfg, depth=BENCH_DEPTH, depth_single_blocks=BENCH_DEPTH_SINGLE)
    params = permute_rope_layout(init_flux(jax.random.PRNGKey(0), cfg, jnp.bfloat16), cfg)
    inp = make_inputs(cfg)
    run = jax.jit(make_run(cfg, inp))
    print("A) bf16 slice: compiling...", file=sys.stderr)
    _ = np.asarray(run(params, inp["x"], ts)[:, :8, :8], np.float32)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(params, inp["x"], ts)[:, :8, :8], np.float32)
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    bench_fl = linear_flops(cfg, L_IMG, L_TXT)
    full_fl = linear_flops(full_cfg, L_IMG, L_TXT)
    mfu = bench_fl / (p50 / STEPS) / V5E_PEAK_BF16
    extrap = p50 * full_fl / bench_fl
    print(
        f"A) bf16 slice ({cfg.depth}+{cfg.depth_single_blocks} blocks): "
        f"{p50 / STEPS * 1e3:.1f} ms/step, MFU {mfu:.1%}; 12B extrapolation {extrap:.2f}s",
        file=sys.stderr,
    )
    return {"extrapolated": extrap, "mfu": mfu, "full_flops": full_fl}


def bench_int8_full(ts) -> float | None:
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.quant import init_flux_int8

    cfg = FluxConfig()
    inp = make_inputs(cfg)
    run = make_run(cfg, inp, rope_layout="interleaved")

    @jax.jit
    def init_and_run(key, x, ts):
        params = init_flux_int8(key, cfg)
        return run(params, x, ts)

    key = jax.random.PRNGKey(0)
    try:
        print("B) FULL 12B int8: compiling...", file=sys.stderr)
        _ = np.asarray(init_and_run(key, inp["x"], ts)[:, :8, :8], np.float32)
    except Exception as e:  # pragma: no cover - hardware dependent
        print(f"B) FULL 12B int8 unavailable ({type(e).__name__}); "
              "falling back to extrapolated headline", file=sys.stderr)
        return None
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(init_and_run(key, inp["x"], ts)[:, :8, :8], np.float32)
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    print(f"B) FULL 12B int8 (measured, 1 chip): {p50:.2f}s / 30-step query "
          f"({p50 / STEPS * 1e3:.0f} ms/step incl. ~0.3s in-program weight init)",
          file=sys.stderr)
    return p50


def main() -> None:
    from visualcloze_tpu.ops.schedule import ode_timesteps
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ts = jnp.asarray(ode_timesteps(STEPS + 1, L_IMG, do_shift=True))
    slice_res = bench_bf16_slice(ts)
    int8_p50 = bench_int8_full(ts)

    sol = slice_res["full_flops"] * STEPS / V5E_PEAK_BF16
    if int8_p50 is not None:
        value, label = int8_p50, "12B DiT int8 weights, 1 chip, measured"
    else:
        value, label = slice_res["extrapolated"], "12B DiT bf16, 1 chip, FLOPs-extrapolated"
    print(f"throughput {1.0 / value:.4f} img/s/chip; SOL {sol:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"p50 latency, 384-grid 2x3 / 30-step query ({label})",
                "value": round(value, 3),
                "unit": "s",
                "vs_baseline": round(sol / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
