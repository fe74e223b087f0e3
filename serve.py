"""Production serving daemon: HTTP API over the pipelined orchestrator.

The reference ships only the Gradio research demo (app.py); production
deployment needs a machine-facing endpoint. This CLI wraps a
VisualClozeModel in PipelinedServer (two-chip encoder/DiT disaggregation
when devices allow) and serves the JSON API of
visualcloze_tpu/pipeline/server.py:

  python serve.py --demo --port 8000            # tiny random model
  python serve.py --model_path ckpt.pth --quantize int8 --port 8000
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/generate -d @query.json

With >=2 devices the encoders+VAE are pinned to device 0 and the DiT to
device 1 (the bench.py serving topology: T5-XXL bf16 cannot co-reside with
the int8 12B DiT on a 16 GB chip); --tp/--fsdp instead shards the DiT over
a mesh. Queries are admission-controlled (429 beyond --max_queue).
"""

from __future__ import annotations

import argparse

import jax

from visualcloze_tpu.transport.sampling import solver_arg


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--model_name", default="flux-dev-fill-lora")
    p.add_argument("--resolution", type=int, default=384)
    p.add_argument("--solver", default="euler", type=solver_arg,
                   help="euler / heun / ab2 / dopri5 / cached[:K] (K>=1)")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "w8a8", "w8a8_smooth"])
    p.add_argument("--t5_int4", action="store_true",
                   help="int4 weight-only T5-XXL (~2.4 GB vs 9.5 GB bf16): "
                        "lets the encoders co-reside with the int8 DiT on one "
                        "16 GB chip; quality-gated — un-gate via "
                        "scripts/validate_weights.py")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--cp", type=int, default=1,
                   help="ring-attention sequence parallelism for long grids")
    p.add_argument("--lora", action="append", default=[], metavar="NAME=PATH",
                   help="register a runtime LoRA adapter, selectable per "
                        "request via the JSON 'adapter' field; repeatable. "
                        "PATH: reference-trainer .pth or diffusers LoRA "
                        "safetensors ('random' with --demo builds a random "
                        "tiny adapter). Applied UN-folded, so one base tree "
                        "serves every adapter with zero recompiles")
    p.add_argument("--lora_scale", type=float, default=1.0,
                   help="scale for runtime adapters (ref lora.py:92-98)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--replicas", type=int, default=1,
                   help="N serving replicas with least-loaded dispatch "
                        "(each gets its own chip pair when devices allow); "
                        "replicas, not batching, are the throughput lever")
    p.add_argument("--max_inflight", type=int, default=2,
                   help="pipeline depth (concurrent queries on device)")
    p.add_argument("--max_queue", type=int, default=8,
                   help="admitted requests beyond which POSTs get 429")
    p.add_argument("--result_timeout", type=float, default=900.0,
                   help="seconds one request may wait (queue + compile + "
                        "denoise) before a 504; 0 disables")
    p.add_argument("--no_disaggregate", action="store_true",
                   help="keep encoders and DiT on the default device even "
                        "with 2+ chips")
    p.add_argument("--aot_dir", default=None,
                   help="directory for AOT-serialized executables (default "
                        "$VISUALCLOZE_AOT_DIR or ~/.cache/visualcloze_tpu/aot); "
                        "a daemon restart then loads compiled programs from "
                        "disk instead of re-paying XLA compilation")
    p.add_argument("--no_aot", action="store_true",
                   help="disable the executable cache (always compile)")
    p.add_argument("--warmup_grids", default="2x3",
                   help="comma list of HxW grids to pre-compile, e.g. 2x3,3x3"
                        " ('' skips warmup)")
    p.add_argument("--warmup_upsampling", default="",
                   help="comma list of WxH NATIVE query-cell sizes to "
                        "pre-compile the SDEdit stage-2 bucket for (e.g. "
                        "1024x1024 — stage 2 runs at the query cell's "
                        "original size, not the grid resolution)")
    p.add_argument("--demo", action="store_true",
                   help="tiny random model, no checkpoints")
    p.add_argument("--synthetic_full", action="store_true",
                   help="FULL-SIZE random weights initialized on device "
                        "(bench seam: proves the production single-chip "
                        "residency — 12B int8 DiT + int4 T5 + CLIP + VAE on "
                        "16 GB — and serves real queries without checkpoints; "
                        "implies --t5_int4, the single-chip co-residency mode:"
                        " pipeline.loader.synthetic_full_components)")
    return p.parse_args(argv)


def _parse_adapters(specs: list[str]) -> dict[str, str]:
    out = {}
    for spec in specs:
        if "=" not in spec:
            raise SystemExit(f"--lora expects NAME=PATH, got {spec!r}")
        name, path = spec.split("=", 1)
        if name in out:
            raise SystemExit(
                f"duplicate --lora adapter name {name!r} "
                f"({out[name]!r} vs {path!r})"
            )
        out[name] = path
    return out


def _add_adapters(model, args):
    from visualcloze_tpu.models.lora import init_lora, randomize_lora_b
    from visualcloze_tpu.pipeline.loader import (
        convert_lora_any,
        load_torch_checkpoint,
    )

    model.lora_scale = args.lora_scale
    for i, (name, path) in enumerate(_parse_adapters(args.lora).items()):
        if path == "random":
            if not args.demo:
                raise SystemExit("--lora NAME=random needs --demo")
            tree = randomize_lora_b(
                init_lora(jax.random.PRNGKey(100 + i), model.params, rank=4),
                jax.random.PRNGKey(200 + i),
            )
        else:
            tree = convert_lora_any(load_torch_checkpoint(path), model.cfg)
        model.add_adapter(name, tree)


def _build_model(args, mesh, attn_impl, seed=0):
    if args.synthetic_full:
        from visualcloze_tpu.pipeline import synthetic_full_components

        model = synthetic_full_components(
            jax.random.PRNGKey(seed), resolution=args.resolution,
            attn_impl=attn_impl, solver=args.solver,
        )
        _add_adapters(model, args)
        return model
    if args.demo:
        from visualcloze_tpu.pipeline import random_components

        model = random_components(
            jax.random.PRNGKey(seed), tiny=True, resolution=64, mesh=mesh,
            attn_impl=attn_impl,
        )
        model.solver = args.solver
        if args.quantize == "w8a8_smooth":
            model.calibrate_w8a8_smooth(steps=4, stride=2)
        elif args.quantize:  # int8 / w8a8, same as inference.py's demo path
            from visualcloze_tpu.models.quant import (
                quantize_flux_int8,
                quantize_flux_w8a8,
            )

            model.params = {
                "int8": quantize_flux_int8, "w8a8": quantize_flux_w8a8,
            }[args.quantize](model.params)
        if args.t5_int4:
            _quantize_t5(model)
        _add_adapters(model, args)
        return model
    from visualcloze_tpu.pipeline import build_visualcloze

    model = build_visualcloze(
        model_path=args.model_path, model_name=args.model_name,
        resolution=args.resolution, solver=args.solver, mesh=mesh,
        quantize=args.quantize, attn_impl=attn_impl,
    )
    if args.t5_int4:
        _quantize_t5(model)
    _add_adapters(model, args)
    return model


def _quantize_t5(model):
    from visualcloze_tpu.models.quant import quantize_clip_int8, quantize_t5_int4

    model.t5.params = quantize_t5_int4(model.t5.params, quantize_embed=True)
    model.clip.params = quantize_clip_int8(model.clip.params)
    if len(jax.devices()) == 1:
        # single-chip co-residency (the point of --t5_int4): ~14 GiB resident
        # leaves too little HBM for concurrently-enqueued programs' temps —
        # serialize per-stage dispatch (pipeline/visualcloze.py hbm_serialize)
        model.hbm_serialize = True


def _warm_server(ps, model, shapes, steps: int, upsampling_sizes=()):
    """Pre-compile the serving programs through the PipelinedServer path
    (device placement identical to real requests), one pass per grid shape
    per distinct adapter jit signature. `upsampling_sizes` additionally
    warms the SDEdit stage-2 bucket at those NATIVE cell sizes: stage 2
    runs at the query cell's original resolution (preprocessing.py:93-94),
    so a 384-res grid warmup alone leaves e.g. the 1024^2 bucket cold."""
    from PIL import Image

    res = model.resolution
    cell_sizes = [(res, res)] + [
        s for s in upsampling_sizes if s != (res, res)
    ]
    for gh, gw in shapes:
        for cw, ch in cell_sizes:
            blank = Image.new("RGB", (cw, ch), (0, 0, 0))
            grid = [[blank] * gw for _ in range(gh)]
            grid[-1][-1] = None
            for adapter in model.adapter_warm_set():
                ps.submit(
                    grid, ["warmup", "", ""], grid_size=(gh, gw), seed=1,
                    steps=steps, is_upsampling=True, adapter=adapter,
                ).result()


def main(argv=None):
    args = parse_args(argv)
    from inference import serving_attn_impl, serving_mesh
    from visualcloze_tpu.pipeline import PipelinedServer, ReplicaPool
    from visualcloze_tpu.pipeline.server import run_frontend
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = serving_mesh(args)
    attn_impl = serving_attn_impl(args, mesh)
    devices = jax.devices()
    disaggregate = mesh is None and len(devices) >= 2 and not args.no_disaggregate
    warm_shapes = [
        tuple(int(v) for v in g.split("x"))
        for g in args.warmup_grids.split(",") if g
    ] if args.warmup_grids else []
    warm_upsampling = [
        tuple(int(v) for v in s.split("x"))
        for s in args.warmup_upsampling.split(",") if s
    ] if args.warmup_upsampling else []

    replicas = []
    for r in range(args.replicas):
        model = _build_model(args, mesh, attn_impl, seed=0)
        if not args.no_aot:
            d = model.enable_aot(args.aot_dir)
            if r == 0:
                print(f"aot executable cache: {d}")
        # replica r owns chip pair (2r, 2r+1) when the machine has them;
        # otherwise replicas share the default device (still pipelining
        # dispatch — useful for tests and single-chip overlap)
        enc_dev = dit_dev = None
        if disaggregate and args.replicas * 2 <= len(devices):
            enc_dev, dit_dev = devices[2 * r], devices[2 * r + 1]
        ps = PipelinedServer(
            model, encoder_device=enc_dev, dit_device=dit_dev,
            max_inflight=args.max_inflight,
        )
        if warm_shapes:
            # AFTER PipelinedServer pins weights, and THROUGH its submit
            # path: model.warmup() before construction would compile every
            # program for the wrong device placement (first real request
            # recompiles) and co-locate T5-XXL + DiT on one chip — the exact
            # co-residency the disaggregated topology exists to avoid
            _warm_server(ps, model, warm_shapes, steps=4 if args.demo else 30,
                         upsampling_sizes=warm_upsampling)
        replicas.append(ps)
    server = replicas[0] if args.replicas == 1 else ReplicaPool(replicas)

    print(f"serving on {args.host}:{args.port} "
          f"(replicas={args.replicas}, disaggregated={disaggregate}, "
          f"mesh={mesh is not None})")
    run_frontend(
        server, host=args.host, port=args.port,
        max_inflight=args.max_inflight * args.replicas,
        max_queue=args.max_queue, block=True,
        result_timeout_s=args.result_timeout or None,
    )


if __name__ == "__main__":
    main()
