"""Benchmark: end-to-end 384-grid / 30-step query latency on one TPU chip.

Measures every pipeline phase at the shipped serving configuration (bf16
compute, Pallas flash attention, 512-bucketed masked sequences) and reports
the full per-query latency (SURVEY.md §3.2 call stack):

  T. text conditioning — T5-XXL (512 tokens) + CLIP-L (77) forward, bf16;
  V. VAE — encode the 2 grid rows (384x1152 px each) + decode them back;
  A. flagship-width bf16 DiT slice (4+8 of 19+38 blocks — the 12B bf16 model
     does not fit one 16 GB chip) -> per-step MFU + FLOPs-linear
     extrapolation (cross-check for B);
  B. the FULL 12B DiT, int8 weight-only (models/quant.py), loaded from an
     ON-DISK checkpoint via compile-first + format-matched per-leaf
     device_put (pipeline/serving.py — no whole-tree relayout copy), 30-step
     denoise measured.

Headline: e2e = T + V + B. Serving topology note: T5-XXL bf16 (~9.5 GB)
cannot co-reside with the int8 12B DiT (~12 GB) on one 16 GB chip, so
production serving disaggregates — encoders+VAE on one chip, DiT on another;
the single-query latency is the phase sum either way (phases are sequential
for one query), and the DiT chip bounds throughput.

vs_baseline: the reference publishes no speed numbers (BASELINE.md), so the
comparison is the hardware speed-of-light for the same bf16 FLOPs (v5e peak
197 TFLOP/s): vs_baseline = SOL_e2e / measured_e2e (1.0 == peak MXU).
"""

from __future__ import annotations

import dataclasses
import gc
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s

# flagship sampling config (SURVEY.md §3.2): 2x3 grid @ 384 -> 3456 img tokens
L_IMG, L_TXT = 3456, 512  # true image tokens
L_IMG_PAD = 3456          # 128-bucketed: 3456 is a lane multiple, no padding
                          # (the flash kernel pads internally to block
                          # multiples — ops/flash_attention._choose_block)
ROW_H, ROW_W = 384, 1152  # one grid row in pixels
N_ROWS = 2
STEPS = 30
BENCH_DEPTH, BENCH_DEPTH_SINGLE = 4, 8


def _sync(x) -> None:
    np.asarray(jax.tree.leaves(x)[0][..., :1], np.float32)  # tunnel-safe sync


def _time3(fn, *args) -> float:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _free() -> None:
    """Call AFTER dropping the phase's references (each phase function holds
    them in locals that die on return): collect + drop compiled programs so
    the next phase starts with a clean HBM."""
    gc.collect()
    jax.clear_caches()


# ----------------------------- FLOPs models -----------------------------

def dit_flops(cfg, l_img: int, l_txt: int) -> float:
    h = cfg.hidden_size
    L = l_img + l_txt
    double = 2 * L * 18 * h * h + 4 * L * L * h
    single = 2 * L * 15 * h * h + 4 * L * L * h
    io = 2 * l_img * cfg.in_channels * h + 2 * l_txt * cfg.context_in_dim * h \
        + 2 * l_img * h * cfg.out_channels
    return cfg.depth * double + cfg.depth_single_blocks * single + io


def t5_flops(cfg, L: int) -> float:
    per_tok = 2 * (4 * cfg.d_model**2 + 3 * cfg.d_model * cfg.d_ff)
    attn = cfg.num_layers * 4 * L * L * cfg.d_model
    return cfg.num_layers * L * per_tok + attn


def clip_flops(cfg, L: int) -> float:
    per_tok = 2 * (4 * cfg.hidden_size**2 + 2 * cfg.hidden_size * cfg.intermediate_size)
    return cfg.num_layers * L * per_tok


def vae_flops(cfg, h: int, w: int) -> float:
    """Analytic conv FLOPs for one encode + one decode of an (h, w) image."""
    def conv(hh, ww, cin, cout, k=3):
        return 2.0 * hh * ww * cin * cout * k * k

    chans = [cfg.ch * m for m in cfg.ch_mult]
    total = conv(h, w, cfg.in_channels, chans[0])  # enc conv_in
    hh, ww, cin = h, w, chans[0]
    for i, c in enumerate(chans):  # encoder
        for _ in range(cfg.num_res_blocks):
            total += conv(hh, ww, cin, c) + conv(hh, ww, c, c)
            cin = c
        if i != len(chans) - 1:
            total += conv(hh // 2, ww // 2, c, c)
            hh, ww = hh // 2, ww // 2
    total += 4 * conv(hh, ww, cin, cin) + 2 * conv(hh, ww, cin, cin)  # mid enc (2 res + attn-ish)
    total += conv(hh, ww, cin, 2 * cfg.z_channels)
    # decoder (mirror, num_res_blocks+1 per level)
    total += conv(hh, ww, cfg.z_channels, chans[-1])
    cin = chans[-1]
    for i, c in enumerate(reversed(chans)):
        for _ in range(cfg.num_res_blocks + 1):
            total += conv(hh, ww, cin, c) + conv(hh, ww, c, c)
            cin = c
        if i != len(chans) - 1:
            hh, ww = hh * 2, ww * 2
            total += conv(hh, ww, c, c)
    total += 4 * conv(hh, ww, cin, cin)
    total += conv(hh, ww, cin, cfg.out_ch)
    return total


# ----------------------------- inputs -----------------------------

def make_inputs(cfg, l_img: int = L_IMG, l_img_pad: int | None = None, l_txt: int = L_TXT):
    rng = np.random.default_rng(0)
    b = 1
    if l_img_pad is None:
        # the flagship length keeps its module-level bucketing knob
        l_img_pad = L_IMG_PAD if l_img == L_IMG else l_img
    l_pad = l_img_pad
    img_ids = np.zeros((b, l_pad, 3), np.float32)
    img_ids[:, :l_img, 0] = np.repeat([1, 2], l_img // 2)
    img_ids[:, :l_img, 1] = np.tile(np.arange(l_img // 2) // 72, 2)
    img_ids[:, :l_img, 2] = np.tile(np.arange(l_img // 2) % 72, 2)
    img_mask = np.zeros((b, l_pad), np.int32)
    img_mask[:, :l_img] = 1
    full = l_pad == l_img
    return dict(
        x=jnp.asarray(rng.standard_normal((b, l_pad, 64)), jnp.bfloat16),
        cond=jnp.asarray(rng.standard_normal((b, l_pad, 320)), jnp.bfloat16),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, cfg.context_in_dim)), jnp.bfloat16),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        vec=jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.bfloat16),
        guidance=jnp.full((b,), 30.0, jnp.bfloat16),
        ids=jnp.asarray(img_ids),
        mask=None if full else jnp.asarray(img_mask),
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


# ----------------------------- phases -----------------------------

def bench_text_encoders() -> float:
    """Phase T: T5-XXL + CLIP-L forward, bf16 random weights, measured alone."""
    from visualcloze_tpu.config import CLIPTextConfig, T5Config
    from visualcloze_tpu.models.clip import clip_encode, init_clip
    from visualcloze_tpu.models.t5 import init_t5, t5_encode

    t5_cfg, clip_cfg = T5Config(), CLIPTextConfig()
    print("T) text encoders: compiling...", file=sys.stderr)
    t5_params = init_t5(jax.random.PRNGKey(0), t5_cfg, dtype=jnp.bfloat16)
    clip_params = init_clip(jax.random.PRNGKey(1), clip_cfg, dtype=jnp.bfloat16)
    t5_ids = jnp.asarray(np.random.default_rng(2).integers(0, 32000, (1, L_TXT)))
    clip_ids = jnp.asarray(np.random.default_rng(3).integers(0, 49000, (1, 77)))

    def text_fwd(tp, cp, ti, ci):
        return t5_encode(t5_cfg, tp, ti), clip_encode(clip_cfg, cp, ci)[1]

    f = jax.jit(text_fwd)
    _sync(f(t5_params, clip_params, t5_ids, clip_ids))
    p50 = _time3(f, t5_params, clip_params, t5_ids, clip_ids)
    print(f"T) T5-XXL(512)+CLIP-L(77) bf16: {p50 * 1e3:.0f} ms", file=sys.stderr)
    del t5_params, clip_params, f
    _free()
    return p50


def bench_vae() -> float:
    """Phase V: encode the N_ROWS grid rows + decode them back, bf16."""
    from visualcloze_tpu.config import AutoEncoderConfig
    from visualcloze_tpu.models.autoencoder import (
        decoder_apply,
        encoder_apply,
        init_autoencoder,
    )

    cfg = AutoEncoderConfig()
    print("V) VAE: compiling...", file=sys.stderr)
    params = init_autoencoder(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rows = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (N_ROWS, ROW_H, ROW_W, 3)), jnp.bfloat16
    )

    def roundtrip(p, x):
        moments = encoder_apply(cfg, p["encoder"], x)
        z = jnp.split(moments, 2, axis=-1)[0]
        return decoder_apply(cfg, p["decoder"], z)

    f = jax.jit(roundtrip)
    _sync(f(params, rows))
    p50 = _time3(f, params, rows)
    print(f"V) VAE encode+decode {N_ROWS}x{ROW_H}x{ROW_W} bf16: {p50 * 1e3:.0f} ms",
          file=sys.stderr)
    del params, f
    _free()
    return p50


def bench_stage2() -> None:
    """Phase U: SDEdit upsampling-stage shapes (ref visualcloze.py:247-318;
    SURVEY §3.3) — 1024^2 VAE decode + DiT slice per-step at the stage-2
    sequence (64x64 latent patches = 4096 tokens + 512 txt). Reported on
    stderr only; the JSON headline stays the 384-grid stage-1 query."""
    from visualcloze_tpu.config import AutoEncoderConfig, FluxConfig
    from visualcloze_tpu.models.autoencoder import decoder_apply, init_autoencoder
    from visualcloze_tpu.models.flux import init_flux
    from visualcloze_tpu.models.weights import permute_rope_layout
    from visualcloze_tpu.ops.schedule import ode_timesteps

    STEPS2, L2 = 10, 4096
    cfg = AutoEncoderConfig()
    print("U) stage-2: compiling...", file=sys.stderr)
    params = init_autoencoder(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    z = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 128, 128, cfg.z_channels)),
        jnp.bfloat16,
    )
    dec = jax.jit(lambda p, zz: decoder_apply(cfg, p["decoder"], zz))
    _sync(dec(params, z))
    t_dec = _time3(dec, params, z)
    del params, dec
    _free()

    full_cfg = FluxConfig()
    fcfg = dataclasses.replace(
        full_cfg, depth=BENCH_DEPTH, depth_single_blocks=BENCH_DEPTH_SINGLE
    )
    fparams = permute_rope_layout(init_flux(jax.random.PRNGKey(0), fcfg, jnp.bfloat16), fcfg)
    inp = make_inputs(fcfg, l_img=L2)
    ts2 = jnp.asarray(ode_timesteps(STEPS2 + 1, L2, do_shift=True))
    run = jax.jit(make_run(fcfg, inp))
    _sync(run(fparams, inp["x"], ts2))
    p50 = _time3(run, fparams, inp["x"], ts2)
    bench_fl = dit_flops(fcfg, L2, L_TXT)
    mfu = bench_fl / (p50 / STEPS2) / V5E_PEAK_BF16
    extrap = p50 * dit_flops(full_cfg, L2, L_TXT) / bench_fl
    print(
        f"U) stage-2 1024^2: VAE decode {t_dec * 1e3:.0f} ms; DiT slice "
        f"{p50 / STEPS2 * 1e3:.1f} ms/step (MFU {mfu:.1%}); est. 10-step "
        f"12B bf16 upsampling {extrap + t_dec:.2f}s",
        file=sys.stderr,
    )
    del fparams, run, inp
    _free()


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
    _sync(run(params, inp["x"], ts))
    p50 = _time3(run, params, inp["x"], ts)
    bench_fl = dit_flops(cfg, L_IMG, L_TXT)
    full_fl = dit_flops(full_cfg, L_IMG, L_TXT)
    mfu = bench_fl / (p50 / STEPS) / V5E_PEAK_BF16
    extrap = p50 * full_fl / bench_fl
    print(
        f"A) bf16 slice ({cfg.depth}+{cfg.depth_single_blocks} blocks): "
        f"{p50 / STEPS * 1e3:.1f} ms/step, MFU {mfu:.1%}; 12B extrapolation {extrap:.2f}s",
        file=sys.stderr,
    )
    del params, run, inp
    _free()
    return {"extrapolated": extrap, "mfu": mfu, "full_flops": full_fl}


def bench_int8_full(ts) -> float | None:
    """Phase B: the real single-chip serving path — FULL 12B int8 weights
    from an on-disk checkpoint, format-matched per-leaf device_put
    (pipeline/serving.py), 30-step denoise measured with weights resident."""
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.pipeline.serving import (
        build_synthetic_int8_checkpoint,
        load_compiled_params,
        load_params_dir,
    )

    cfg = FluxConfig()
    ckpt = os.environ.get("BENCH_INT8_CKPT", "build/bench_int8_ckpt")
    try:
        if not os.path.exists(os.path.join(ckpt, "manifest.json")):
            print(f"B) writing synthetic 12B int8 checkpoint to {ckpt} "
                  "(one-time, ~12 GB)...", file=sys.stderr)
            build_synthetic_int8_checkpoint(cfg, ckpt)
        host = load_params_dir(ckpt)

        inp = make_inputs(cfg)
        run = make_run(cfg, inp, rope_layout="interleaved")
        print("B) FULL 12B int8: compiling + loading from disk...", file=sys.stderr)
        t_load0 = time.perf_counter()
        compiled, dev_params, (dev_x, dev_ts) = load_compiled_params(
            run, host, np.asarray(inp["x"]), np.asarray(ts)
        )
        _sync(compiled(dev_params, dev_x, dev_ts))
        t_load = time.perf_counter() - t_load0
        p50 = _time3(compiled, dev_params, dev_x, dev_ts)
    except Exception as e:  # pragma: no cover - hardware dependent
        print(f"B) FULL 12B int8 unavailable ({type(e).__name__}: {e}); "
              "falling back to extrapolated headline", file=sys.stderr)
        return None
    print(f"B) FULL 12B int8 (measured, 1 chip, on-disk ckpt): {p50:.2f}s / "
          f"30-step query ({p50 / STEPS * 1e3:.0f} ms/step; compile+load {t_load:.0f}s one-time)",
          file=sys.stderr)
    del compiled, dev_params, dev_x, dev_ts, host
    _free()
    return p50


def main() -> None:
    from visualcloze_tpu.config import AutoEncoderConfig, CLIPTextConfig, T5Config
    from visualcloze_tpu.ops.schedule import ode_timesteps
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ts = jnp.asarray(ode_timesteps(STEPS + 1, L_IMG, do_shift=True))
    t_text = bench_text_encoders()
    t_vae = bench_vae()
    if os.environ.get("BENCH_STAGE2", "0") == "1":
        bench_stage2()  # opt-in: ~8 min cold compile (1024^2 conv variants)
    slice_res = bench_bf16_slice(ts)
    int8_p50 = bench_int8_full(ts)

    aux_fl = (
        t5_flops(T5Config(), L_TXT)
        + clip_flops(CLIPTextConfig(), 77)
        + N_ROWS * vae_flops(AutoEncoderConfig(), ROW_H, ROW_W)
    )
    sol = (slice_res["full_flops"] * STEPS + aux_fl) / V5E_PEAK_BF16

    denoise = int8_p50 if int8_p50 is not None else slice_res["extrapolated"]
    kind = "measured" if int8_p50 is not None else "FLOPs-extrapolated"
    e2e = t_text + t_vae + denoise
    print(
        f"E2E query: text {t_text:.2f}s + vae {t_vae:.2f}s + denoise {denoise:.2f}s "
        f"= {e2e:.2f}s; throughput {1.0 / e2e:.4f} img/s/chip; SOL {sol:.2f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "p50 end-to-end query latency, 384-grid 2x3 / 30 steps "
                          f"(T5+CLIP+VAE bf16 + 12B DiT int8, 1 chip, {kind})",
                "value": round(e2e, 3),
                "unit": "s",
                "vs_baseline": round(sol / e2e, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
