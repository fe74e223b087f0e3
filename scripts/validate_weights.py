"""One-command real-weight validation + quality-gate-flip harness.

Everything the repo's quality gates wait on (PSNR>40 vs the reference,
w8a8 un-gating, cached:K un-gating, int4-T5) reduces to a fixed protocol
once checkpoints are available. This script runs that protocol end-to-end
and prints a per-gate verdict plus the exact config flips to apply:

    python scripts/validate_weights.py \
        --flux /path/flux1-fill-dev.safetensors \
        --ae /path/ae.safetensors \
        --t5 /path/t5-xxl-snapshot/ --clip /path/clip-l-snapshot/ \
        --lora /path/visualcloze-lora-384.safetensors \
        [--reference_outputs /path/ref_renders/] [--out validation/]

Stages (each reported in the final table and validation/report.json):

  1. convert   — run every provided checkpoint through the repo converters
                 (BFL / diffusers / reference-LoRA autodetected); LoRA folded.
  2. act-diff  — per-block activation diff of the converted DiT against the
                 independent torch oracle (models/torch_oracle.py) on fixed
                 inputs; localizes converter transposition errors to a block.
  3. configs   — run the five BASELINE.json configs end-to-end; input grids
                 are saved under <out>/inputs/ so the torch reference can be
                 run on the SAME pixels (runbook: docs/VALIDATION.md).
  4. gates     — PSNR/SSIM vs --reference_outputs (when given), plus the
                 self-relative gates on identical latents: w8a8 vs bf16,
                 cached:2 / cached:3 vs euler, int4-T5 vs bf16-T5.
  5. report    — PASS/FAIL/SKIP per gate + config flips, exit 1 on real-mode
                 gate failure.

CI mode (`--ci`, no checkpoints needed) builds a tiny random BFL-format
checkpoint, pushes it through the REAL converter + oracle path, and runs
every stage on a tiny pipeline — the machinery is exercised end-to-end;
quality gates are reported as measured but only conversion fidelity (exact
numerics) is required to pass. tests/test_validate_weights.py runs this.

Reference protocol: visualcloze.py:247-467 (generation), BASELINE.json
(configs + PSNR>40 north star).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

PSNR_REF_MIN = 40.0  # the north-star gate (BASELINE.json)
PSNR_MODE_MIN = 30.0  # fast-mode fidelity vs the bf16/euler pipeline
ORACLE_PSNR_MIN = 40.0  # conversion fidelity vs the torch oracle
T5_REL_ERR_MAX = 0.02  # int4-T5 embedding relative error


@dataclasses.dataclass
class Gate:
    name: str
    status: str  # PASS / FAIL / SKIP / INFO
    value: str
    threshold: str
    flip: str  # the config change un-gated by a PASS


def _psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    peak = peak if peak is not None else (float(np.max(np.abs(b))) or 1.0)
    return 10.0 * math.log10(peak**2 / max(mse, 1e-20))


# ----------------------------- stage 1: convert -----------------------------


def build_bundle(args):
    """Construct the bf16/fp32 pipeline from the provided checkpoints (real
    mode) or a tiny random BFL-format checkpoint through the same converter
    path (--ci). Returns (model, report_dict, oracle_pack)."""
    import jax
    import jax.numpy as jnp

    from visualcloze_tpu.pipeline.loader import (
        convert_flux_any,
        convert_lora_any,
        load_ae,
        load_clip,
        load_flux_state,
        load_t5,
        load_torch_checkpoint,
        random_components,
    )
    from visualcloze_tpu.models.lora import fold_lora
    from visualcloze_tpu.pipeline.visualcloze import VisualClozeModel

    rep: dict = {"mode": "ci" if args.ci else "real", "checkpoints": {}}

    if args.ci:
        # tiny random checkpoint in the BFL source format -> REAL converters
        import torch
        from safetensors.torch import save_file

        from visualcloze_tpu.models.torch_oracle import make_state

        donor = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64)
        flux_cfg = donor.cfg
        state_t = make_state(flux_cfg, seed=0)
        flux_path = os.path.join(args.out, "ci_flux.safetensors")
        save_file({k: v.contiguous() for k, v in state_t.items()}, flux_path)
        state = load_flux_state(flux_path)
        params = convert_flux_any(state, flux_cfg, dtype=np.float32)
        rep["checkpoints"]["flux"] = f"{flux_path} (tiny random, CI)"
        for name in ("ae", "t5", "clip"):
            rep["checkpoints"][name] = "tiny random components (CI)"
        model = VisualClozeModel(
            flux_cfg, jax.tree.map(jnp.asarray, params),
            donor.ae, donor.t5, donor.clip, resolution=64,
        )
        oracle_pack = (state_t, flux_cfg, params)
        return model, rep, oracle_pack

    if not args.flux:
        raise SystemExit("--flux is required outside --ci")
    from visualcloze_tpu.config import configs

    spec = configs[args.model_name]
    flux_cfg = spec.flux
    state = load_flux_state(args.flux)
    params = convert_flux_any(state, flux_cfg, dtype=np.float32)
    rep["checkpoints"]["flux"] = f"{args.flux} ({len(state)} tensors)"
    oracle_state = None
    if args.act_diff:
        import torch

        oracle_state = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in state.items()}
    if args.lora:
        lora_state = load_torch_checkpoint(args.lora)
        lora = convert_lora_any(lora_state, flux_cfg, dtype=np.float32)
        params = fold_lora(params, lora, scale=args.lora_scale)
        rep["checkpoints"]["lora"] = f"{args.lora} (folded, scale {args.lora_scale})"
    dtype = jnp.bfloat16
    model = VisualClozeModel(
        flux_cfg, jax.tree.map(lambda x: jnp.asarray(x, dtype), params),
        load_ae(dtype, path=args.ae),
        load_t5(dtype=dtype, directory=args.t5),
        load_clip(dtype=dtype, directory=args.clip),
        resolution=args.resolution,
    )
    rep["checkpoints"]["ae"] = args.ae or "$AE"
    rep["checkpoints"]["t5"] = args.t5 or "$T5_PATH"
    rep["checkpoints"]["clip"] = args.clip or "$CLIP_PATH"
    # oracle diff runs on the UNFOLDED base conversion (the oracle state is
    # the raw checkpoint); LoRA folding is linear algebra covered by
    # tests/test_adapters.py round-trips
    oracle_pack = (oracle_state, flux_cfg, convert_flux_any(state, flux_cfg, dtype=np.float32)) \
        if args.act_diff else None
    return model, rep, oracle_pack


# ----------------------------- stage 2: activation diff -----------------------------


def run_act_diff(oracle_pack, gates: list[Gate]) -> dict:
    """Per-block torch-oracle activation diff of the converted DiT."""
    import jax
    import jax.numpy as jnp
    import torch

    from visualcloze_tpu.models.flux import flux_apply
    from visualcloze_tpu.models.torch_oracle import make_inputs, t_flux_forward

    state_t, cfg, params = oracle_pack
    inp = make_inputs(cfg, b=1, l_img=64, l_txt=16)
    capture: dict[str, np.ndarray] = {}
    with torch.no_grad():
        t_flux_forward(
            state_t, cfg,
            *(torch.from_numpy(inp[k]) for k in
              ("img", "img_ids", "txt", "txt_ids", "timesteps", "y")),
            guidance=torch.from_numpy(inp["guidance"]), capture=capture,
        )
    out, acts = jax.jit(
        lambda p, kw: flux_apply(cfg, p, **kw, attn_impl="xla", capture_activations=True)
    )(jax.tree.map(jnp.asarray, params), {k: jnp.asarray(v) for k, v in inp.items()})

    per_block: dict[str, float] = {}
    flat: dict[str, np.ndarray] = {}
    for name in ("embed_img", "embed_txt", "vec", "out"):
        if name in acts:
            flat[name] = np.asarray(acts[name], np.float32)
    for name in ("double_img", "double_txt", "single"):
        if name in acts:
            stacked = np.asarray(acts[name], np.float32)
            for i in range(stacked.shape[0]):
                flat[f"{name}_{i}"] = stacked[i]
    worst = ("", float("inf"))
    for k, ours in flat.items():
        if k not in capture:
            continue
        p = _psnr(ours, capture[k])
        per_block[k] = round(p, 2)
        if p < worst[1]:
            worst = (k, p)
    final = per_block.get("out", -1.0)
    gates.append(Gate(
        "conversion_fidelity",
        "PASS" if final >= ORACLE_PSNR_MIN else "FAIL",
        f"out {final:.1f} dB (worst block {worst[0]} {worst[1]:.1f} dB)",
        f"out PSNR >= {ORACLE_PSNR_MIN} dB vs torch oracle",
        "none (prerequisite for every other gate)",
    ))
    return {"per_block_psnr": per_block, "worst": {"block": worst[0], "psnr": round(worst[1], 2)}}


# ----------------------------- stage 3: the five BASELINE configs -----------------------------


def _synth_image(res: int, seed: int, kind: str):
    """Deterministic synthetic grid-cell image (saved to disk so the torch
    reference can be run on the same pixels)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / max(res - 1, 1)
    if kind == "photo":
        arr = np.stack([
            0.5 + 0.5 * np.sin(6.28 * (xx + rng.uniform())),
            yy,
            0.5 + 0.5 * np.cos(6.28 * (yy * 2 + rng.uniform())),
        ], -1)
        arr += rng.normal(0, 0.03, arr.shape)
    else:  # "cond": a depth-map-like monotone ramp with a blob
        cx, cy = rng.uniform(0.3, 0.7, 2)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.05))
        arr = np.repeat((0.8 * yy + 0.6 * blob)[..., None], 3, -1)
    return Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))


def baseline_configs(res: int, steps: int, ups_steps: int):
    """The five BASELINE.json eval configs as runnable query specs.
    Grid cells: PIL image or None (= masked target cell)."""
    ph = lambda s: _synth_image(res, s, "photo")
    cd = lambda s: _synth_image(res, s, "cond")
    lay = lambda r, c: (
        f"A grid layout with {r} rows and {c} columns, displaying {r * c} "
        "images arranged side by side."
    )
    task_d2i = ("Each row outlines a logical process, starting from [IMAGE1] a depth "
                "map of the scene, to achieve [IMAGE2] a high-quality image.")
    return [
        # 1. single query-row depth-to-image, 384 grid, 30-step flow sampling
        dict(name="depth_to_image", grid=[[cd(1), None]],
             prompts=[lay(1, 2), task_d2i, ""], steps=steps, is_upsampling=False),
        # 2. in-context unseen task: 2 demonstration rows + query row
        dict(name="incontext_2rows",
             grid=[[cd(2), ph(3)], [cd(4), ph(5)], [cd(6), None]],
             prompts=[lay(3, 2), task_d2i, ""], steps=steps, is_upsampling=False),
        # 3. multi-task consolidation: condition -> intermediate + target in one pass
        dict(name="consolidation", grid=[[cd(7), None, None]],
             prompts=[lay(1, 3),
                      "Each row presents a task that leverages [IMAGE1] a depth map of "
                      "the scene to produce [IMAGE2] a canny edge map and [IMAGE3] a "
                      "high-quality image.", ""],
             steps=steps, is_upsampling=False),
        # 4. reverse generation: target image -> condition (mask-inverted grid)
        dict(name="reverse_generation", grid=[[ph(8), None]],
             prompts=[lay(1, 2),
                      "Each row outlines a logical process, starting from [IMAGE1] a "
                      "high-quality image, to achieve [IMAGE2] a depth map of the scene.",
                      ""],
             steps=steps, is_upsampling=False),
        # 5. two-stage: grid sampling + SDEdit upsampling to native resolution
        dict(name="two_stage_sdedit", grid=[[cd(9), None]],
             prompts=[lay(1, 2), task_d2i,
                      "The content of the last image in the final row is: a scene."],
             steps=steps, is_upsampling=True, upsampling_steps=ups_steps),
    ]


def run_config(model, spec: dict, seed: int):
    model.set_grid_size(len(spec["grid"]), len(spec["grid"][0]))
    return model.process_images(
        [list(row) for row in spec["grid"]], spec["prompts"], seed=seed,
        steps=spec["steps"], is_upsampling=spec["is_upsampling"],
        upsampling_steps=spec.get("upsampling_steps", 10),
    )


def save_inputs(spec: dict, inputs_dir: Path) -> None:
    d = inputs_dir / spec["name"]
    d.mkdir(parents=True, exist_ok=True)
    for r, row in enumerate(spec["grid"]):
        for c, img in enumerate(row):
            if img is not None:
                img.save(d / f"row{r}_col{c}.png")
    (d / "query.json").write_text(json.dumps(
        {"prompts": spec["prompts"], "steps": spec["steps"],
         "is_upsampling": spec["is_upsampling"],
         "mask": [[img is None for img in row] for row in spec["grid"]]},
        indent=1))


# ----------------------------- stage 4: gates -----------------------------


def gate_vs_reference(outputs: dict, ref_dir: str | None, gates: list[Gate]) -> None:
    from visualcloze_tpu.utils.metrics import psnr as m_psnr, ssim as m_ssim

    if not ref_dir:
        gates.append(Gate(
            "psnr_vs_reference", "SKIP", "no --reference_outputs given",
            f"PSNR > {PSNR_REF_MIN} dB per config",
            "README north-star: serving parity with the reference validated",
        ))
        return
    vals, missing = [], []
    for name, imgs in outputs.items():
        ref_path = os.path.join(ref_dir, f"{name}.png")
        if not os.path.exists(ref_path):
            missing.append(name)
            continue
        from PIL import Image

        ref = np.asarray(Image.open(ref_path).convert("RGB"), np.float32)
        got = np.asarray(imgs[0].resize((ref.shape[1], ref.shape[0])), np.float32)
        vals.append((name, m_psnr(got, ref), m_ssim(got, ref)))
    if not vals:
        gates.append(Gate("psnr_vs_reference", "SKIP",
                          f"no matching renders in {ref_dir} (need <config>.png)",
                          f"PSNR > {PSNR_REF_MIN} dB per config", "see above"))
        return
    worst = min(vals, key=lambda v: v[1])
    detail = "; ".join(f"{n} {p:.1f}dB/ssim {s:.3f}" for n, p, s in vals)
    if missing:
        detail += f" (missing: {','.join(missing)})"
    gates.append(Gate(
        "psnr_vs_reference",
        "PASS" if worst[1] > PSNR_REF_MIN and not missing else "FAIL",
        detail, f"PSNR > {PSNR_REF_MIN} dB on every config",
        "README north-star: declare reference parity",
    ))


def gate_fast_modes(model, spec: dict, seed: int, gates: list[Gate], ci: bool) -> None:
    """Self-relative gates on IDENTICAL latents: each fast mode vs the bf16
    euler pipeline on the depth_to_image config."""
    base = np.asarray(run_config(model, spec, seed)[0], np.float32)

    def relgate(name, build_and_run, flip):
        try:
            out = np.asarray(build_and_run(), np.float32)
            p = _psnr(out, base, peak=255.0)
            ok = p > PSNR_MODE_MIN
            status = ("INFO" if ci else ("PASS" if ok else "FAIL"))
            val = f"{p:.1f} dB vs bf16/euler"
        except Exception as e:  # report machinery errors without killing the run
            status, val = "FAIL", f"error: {e}"
        gates.append(Gate(name, status, val,
                          f"PSNR > {PSNR_MODE_MIN} dB vs bf16/euler output", flip))

    # --- int8 weight-only: the DEFAULT 12B serving mode (serve.py/bench.py
    # headline numbers all ship on it) — gated like every other fast mode
    # instead of assumed near-lossless (VERDICT r4 weak #3) ---
    from visualcloze_tpu.models.quant import (
        quantize_flux_int8,
        quantize_flux_w8a8,
        quantize_t5_int4,
    )

    def run_int8():
        keep = model.params
        model.params = quantize_flux_int8(keep)
        try:
            return run_config(model, spec, seed)[0]
        finally:
            model.params = keep

    relgate("int8_weight_only", run_int8,
            "the DEFAULT --quantize int8 serving mode (bench.py headline)")

    # --- w8a8: swap the param tree in place (the denoise jit takes params as
    # an argument, so the int8 tree just traces a new program) ---
    def run_w8a8():
        keep = model.params
        model.params = quantize_flux_w8a8(keep)
        try:
            return run_config(model, spec, seed)[0]
        finally:
            model.params = keep

    relgate("w8a8", run_w8a8,
            "serve.py/inference.py --quantize w8a8 (1.08x of bf16 SOL, BENCH_r03)")

    # --- cached:K ---
    prev = model.solver
    for k in (2, 3):
        def run_cached(k=k):
            model.solver = f"cached:{k}"
            try:
                return run_config(model, spec, seed)[0]
            finally:
                model.solver = prev
        relgate(f"cached:{k}", run_cached,
                f"--solver cached:{k} ({'1.79x' if k == 2 else '2.59x'} denoise speedup, BENCH)")

    # --- int4 T5 ---
    def run_int4_t5():
        q = quantize_t5_int4(model.t5.params)
        keep = model.t5.params
        model.t5.params = q
        try:
            emb_q = np.asarray(model.t5(["a depth map of the scene"]), np.float32)
        finally:
            model.t5.params = keep
        emb = np.asarray(model.t5(["a depth map of the scene"]), np.float32)
        rel = float(np.linalg.norm(emb_q - emb) / max(np.linalg.norm(emb), 1e-9))
        model.t5.params = q
        try:
            out = run_config(model, spec, seed)[0]
        finally:
            model.t5.params = keep
        run_int4_t5.rel = rel
        return out

    relgate("int4_t5", run_int4_t5,
            "serve.py/inference.py --t5_int4 (T5 9.5 GB -> 2.4 GB; single-chip encoders+DiT)")
    if hasattr(run_int4_t5, "rel"):
        gates[-1].value += f"; T5 emb rel err {run_int4_t5.rel:.4f} (<= {T5_REL_ERR_MAX})"
        # Both criteria gate the flip: image PSNR (relgate above) AND the
        # embedding relative error the threshold string advertises.
        if gates[-1].status == "PASS" and run_int4_t5.rel > T5_REL_ERR_MAX:
            gates[-1].status = "FAIL"
        gates[-1].threshold += f" AND T5 emb rel err <= {T5_REL_ERR_MAX}"


# ----------------------------- stage 5: report -----------------------------


def print_report(gates: list[Gate], rep: dict, out_dir: Path) -> int:
    w = max(len(g.name) for g in gates) + 1
    print("\n" + "=" * 78)
    print("GATE VERDICTS")
    print("=" * 78)
    for g in gates:
        print(f"{g.name:<{w}} {g.status:<5} {g.value}")
        print(f"{'':<{w}}       threshold: {g.threshold}")
        if g.status == "PASS" and g.flip != "none":
            print(f"{'':<{w}}       FLIP NOW: {g.flip}")
        elif g.status in ("INFO", "SKIP"):
            print(f"{'':<{w}}       flip when PASS on real weights: {g.flip}")
    rep["gates"] = [dataclasses.asdict(g) for g in gates]
    (out_dir / "report.json").write_text(json.dumps(rep, indent=1))
    print(f"\nreport: {out_dir / 'report.json'}")
    hard_fail = [g for g in gates if g.status == "FAIL"]
    if hard_fail:
        print(f"FAILED gates: {[g.name for g in hard_fail]}")
        return 1
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--flux", default=None, help="FLUX.1-Fill-dev safetensors / diffusers dir")
    ap.add_argument("--ae", default=None, help="VAE safetensors (default $AE)")
    ap.add_argument("--t5", default=None, help="T5-XXL snapshot dir (default $T5_PATH)")
    ap.add_argument("--clip", default=None, help="CLIP-L snapshot dir (default $CLIP_PATH)")
    ap.add_argument("--lora", default=None, help="VisualCloze LoRA (.pth / diffusers safetensors)")
    ap.add_argument("--lora_scale", type=float, default=1.0)
    ap.add_argument("--model_name", default="flux-dev-fill-lora")
    ap.add_argument("--resolution", type=int, default=384)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--upsampling_steps", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--reference_outputs", default=None,
                    help="dir of reference renders named <config>.png, produced "
                         "by running the torch reference on <out>/inputs/ "
                         "(runbook: docs/VALIDATION.md)")
    ap.add_argument("--out", default="validation")
    ap.add_argument("--ci", action="store_true",
                    help="tiny random weights through the real converter path; "
                         "machinery check, quality gates reported as INFO")
    ap.add_argument("--no_act_diff", dest="act_diff", action="store_false",
                    help="skip the torch-oracle activation diff (stage 2)")
    ap.add_argument("--configs", default=None,
                    help="comma list to restrict stage 3 (e.g. depth_to_image)")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    out_dir = Path(args.out)
    gates: list[Gate] = []
    t0 = time.time()

    print("[1/5] converting checkpoints...")
    model, rep, oracle_pack = build_bundle(args)
    print(f"      {json.dumps(rep['checkpoints'], indent=8)}")

    if args.act_diff and oracle_pack is not None and oracle_pack[0] is not None:
        print("[2/5] torch-oracle activation diff...")
        rep["act_diff"] = run_act_diff(oracle_pack, gates)
        print(f"      worst block: {rep['act_diff']['worst']}")
    else:
        gates.append(Gate("conversion_fidelity", "SKIP", "--no_act_diff",
                          f"out PSNR >= {ORACLE_PSNR_MIN} dB vs torch oracle", "none"))

    print("[3/5] running the five BASELINE configs...")
    res = model.resolution
    specs = baseline_configs(res, args.steps, args.upsampling_steps)
    if args.configs:
        keep = set(args.configs.split(","))
        specs = [s for s in specs if s["name"] in keep]
    outputs: dict[str, list] = {}
    rep["configs"] = {}
    for spec in specs:
        save_inputs(spec, out_dir / "inputs")
        t = time.time()
        imgs = run_config(model, spec, args.seed)
        dt = time.time() - t
        (out_dir / "outputs").mkdir(exist_ok=True)
        for i, img in enumerate(imgs):
            img.save(out_dir / "outputs" / (f"{spec['name']}.png" if i == 0
                                            else f"{spec['name']}_{i}.png"))
        outputs[spec["name"]] = imgs
        rep["configs"][spec["name"]] = {"seconds": round(dt, 2), "outputs": len(imgs)}
        print(f"      {spec['name']}: {len(imgs)} image(s) in {dt:.1f}s")

    print("[4/5] quality gates...")
    gate_vs_reference(outputs, args.reference_outputs, gates)
    fast_spec = next((s for s in specs if s["name"] == "depth_to_image"), specs[0])
    gate_fast_modes(model, fast_spec, args.seed, gates, ci=args.ci)

    print(f"[5/5] report ({time.time() - t0:.0f}s total)")
    return print_report(gates, rep, out_dir)


if __name__ == "__main__":
    raise SystemExit(main())
