"""Minimal inference CLI (counterpart of the reference inference.py:7-78).

Runs one in-context grid through the pipeline and saves the generated cell.
With --demo (no checkpoints required) a tiny random model runs end-to-end to
validate the installation.

Example (real weights):
  FLUX_DEV_FILL=... AE=... T5_PATH=... CLIP_PATH=... \
  python inference.py --model_path visualcloze-384.pth --resolution 384 \
      --rows examples/row1_a.png,examples/row1_b.png \
      --rows examples/query.png,MASK \
      --layout "A grid with 2 rows and 2 columns" \
      --task "every row maps a garment to a person wearing it" \
      --content "a person wearing the garment" -o example.jpg
"""

from __future__ import annotations

import argparse

import jax
from PIL import Image

from visualcloze_tpu.transport.sampling import solver_arg


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None, help="VisualCloze LoRA checkpoint")
    p.add_argument("--model_name", default="flux-dev-fill-lora")
    p.add_argument("--resolution", type=int, default=384)
    p.add_argument("--lora_rank", type=int, default=256)
    p.add_argument("--rows", action="append", default=[],
                   help="comma-separated image paths per row; MASK for the target cell")
    p.add_argument("--layout", default=None)
    p.add_argument("--task", default="")
    p.add_argument("--content", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg", type=float, default=30.0)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--upsampling_steps", type=int, default=10)
    p.add_argument("--upsampling_noise", type=float, default=0.4)
    p.add_argument("--no_upsampling", action="store_true")
    p.add_argument(
        "--solver", default="euler", type=solver_arg,
        help="ODE method: euler, heun, ab2, dopri5, or cached[:K] (K>=1) — "
        "the velocity-cache serving mode (model evals only every K-th step, "
        "linear extrapolation between — ~K-fold fewer DiT calls; quality is "
        "checkpoint-dependent)",
    )
    p.add_argument("-o", "--output", default="example.jpg")
    p.add_argument("--demo", action="store_true", help="tiny random model, no checkpoints")
    p.add_argument("--tp", type=int, default=1,
                   help="shard the DiT over N tensor-parallel devices (multi-chip serving)")
    p.add_argument("--fsdp", type=int, default=1,
                   help="additionally shard DiT weights over N fsdp devices")
    p.add_argument("--cp", type=int, default=1,
                   help="sequence parallelism: ring attention over N devices "
                        "for very long grids (e.g. 5x5 at 512 = ~26k tokens)")
    p.add_argument("--lora", action="append", default=[], metavar="NAME=PATH",
                   help="register a runtime LoRA adapter (repeatable; "
                        "'random' with --demo builds a tiny random one)")
    p.add_argument("--adapter", default=None,
                   help="runtime adapter to apply to this query (--lora name)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "w8a8", "w8a8_smooth"],
                   help="int8 DiT: weight-only (int8) or dynamic-activation "
                        "int8 MXU compute (w8a8; single-chip 12B serving)")
    p.add_argument("--t5_int4", action="store_true",
                   help="int4 weight-only T5-XXL (encoders + int8 DiT on one "
                        "16 GB chip); quality-gated — un-gate via "
                        "scripts/validate_weights.py")
    p.add_argument("--aot_dir", default=None,
                   help="AOT executable cache dir (default $VISUALCLOZE_AOT_DIR "
                        "or ~/.cache/visualcloze_tpu/aot): repeat invocations "
                        "load compiled programs instead of recompiling")
    p.add_argument("--no_aot", action="store_true",
                   help="disable the executable cache")
    return p.parse_args(argv)


def serving_mesh(args):
    """(dp=1, fsdp, tp, cp) serving mesh, or None for single-device serving.

    The reference has no multi-device serving at all (SURVEY §2.9: fairscale
    scaffolding with model_parallel_size=1); here a mesh spec on the CLI
    shards the 12B DiT across chips via GSPMD."""
    cp = getattr(args, "cp", 1)
    if args.tp * args.fsdp * cp <= 1:
        return None
    from visualcloze_tpu.parallel import create_mesh

    n = len(jax.devices())
    need = args.tp * args.fsdp * cp
    if n < need:
        raise SystemExit(
            f"--tp {args.tp} --fsdp {args.fsdp} --cp {cp} needs {need} "
            f"devices, found {n}"
        )
    return create_mesh(fsdp=args.fsdp, tp=args.tp, cp=cp)


def serving_attn_impl(args, mesh):
    """RingSpec when --cp > 1 (sequence-parallel exact attention for long
    grids), else the default dispatch."""
    if getattr(args, "cp", 1) <= 1 or mesh is None:
        return "auto"
    from visualcloze_tpu.ops.attention import RingSpec

    return RingSpec(mesh=mesh, axis="cp", chunk_impl="auto")


def main(argv=None):
    args = parse_args(argv)
    if not args.demo and not args.rows:
        # fail fast: without this, the multi-minute checkpoint load finishes
        # and THEN an IndexError fires on the empty grid
        raise SystemExit(
            "--rows is required (repeat once per grid row, comma-separated "
            "cells, MASK for the target), e.g. "
            "--rows a.png,b.png --rows query.png,MASK"
        )
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = serving_mesh(args)
    if args.demo:
        from visualcloze_tpu.pipeline import random_components

        model = random_components(
            jax.random.PRNGKey(0), tiny=True, resolution=64, mesh=mesh,
            attn_impl=serving_attn_impl(args, mesh),
        )
        model.solver = args.solver
        if args.quantize == "w8a8_smooth":
            model.calibrate_w8a8_smooth(steps=4, stride=2)
        elif args.quantize:
            from visualcloze_tpu.models.quant import (
                quantize_flux_int8,
                quantize_flux_w8a8,
            )

            model.params = {
                "int8": quantize_flux_int8, "w8a8": quantize_flux_w8a8,
            }[args.quantize](model.params)
        if not args.rows:
            blank = Image.new("RGB", (64, 64), (120, 180, 90))
            tmp = "/tmp/_vc_demo.png"
            blank.save(tmp)
            args.rows = [f"{tmp},{tmp}", f"{tmp},MASK"]
    else:
        from visualcloze_tpu.pipeline import build_visualcloze

        model = build_visualcloze(
            solver=args.solver,
            model_path=args.model_path,
            model_name=args.model_name,
            lora_rank=args.lora_rank,
            resolution=args.resolution,
            mesh=mesh,
            quantize=args.quantize,
            attn_impl=serving_attn_impl(args, mesh),
        )
    if args.t5_int4:
        from visualcloze_tpu.models.quant import quantize_t5_int4

        model.t5.params = quantize_t5_int4(model.t5.params)
    if not args.no_aot:
        model.enable_aot(args.aot_dir)
    if args.lora:
        from serve import _add_adapters

        _add_adapters(model, args)

    grid = [
        [None if cell.strip() == "MASK" else Image.open(cell.strip()).convert("RGB")
         for cell in row.split(",")]
        for row in args.rows
    ]
    grid_h, grid_w = len(grid), len(grid[0])
    model.set_grid_size(grid_h, grid_w)

    layout = args.layout or (
        f"A grid layout with {grid_h} rows and {grid_w} columns, "
        f"displaying {grid_h * grid_w} images arranged side by side."
    )
    images = model.process_images(
        grid,
        [layout, args.task, args.content],
        seed=args.seed,
        cfg=args.cfg,
        steps=args.steps,
        upsampling_steps=args.upsampling_steps,
        upsampling_noise=args.upsampling_noise,
        is_upsampling=not args.no_upsampling,
        adapter=args.adapter,
    )
    images[0].save(args.output)
    print(f"saved {args.output} ({images[0].size})")


if __name__ == "__main__":
    main()
