"""Device-trace profile of the SDEdit stage-2 denoise bucket (1024^2).

Mirrors the stage-1 methodology recorded in docs/PROFILE.md: trace one
jitted denoise of the 4+8-block slice at the bucket's token shape with
`jax.profiler.trace`, then aggregate per-op device durations (and XLA's own
`model_flops` / `bytes_accessed` accounting) from the raw .xplane.pb proto.
The reference has no profiling story at all; its serving loop is
visualcloze.py:247-467 (torch, unprofiled).

Usage (real chip):
    python scripts/profile_stage2.py --dtype int8          # stage-2 bucket
    python scripts/profile_stage2.py --dtype int8 --stage1 # same cfg, stage-1
    python scripts/profile_stage2.py --xplane path.pb --steps 10  # parse only

Parsing uses tensorflow.tsl's xplane proto (the tensorboard_plugin_profile
converters are broken against this protobuf version; the raw proto is not).
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ----------------------------- xplane parsing -----------------------------

def _stat_map(plane, holder):
    out = {}
    for st in holder.stats:
        name = plane.stat_metadata[st.metadata_id].name
        for f in ("double_value", "uint64_value", "int64_value", "str_value"):
            v = getattr(st, f)
            if v:
                out[name] = v
                break
        else:
            out.setdefault(name, 0)
    return out


def summarize_xplane(path: str, steps: int, top: int = 24) -> list[dict]:
    """Aggregate the device plane's 'XLA Ops' line per op (metadata id).

    Returns rows sorted by total device time: one dict per distinct HLO op
    with calls, total ms, ms/step, TF/s on XLA's model_flops, and effective
    HBM GB/s on bytes_accessed. Excludes host/python planes.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501  (tb-plugin converters are broken; raw proto works)

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    rows = {}
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                st = _stat_map(plane, ev)
                dur = int(st.get("device_duration_ps", ev.duration_ps))
                total_ps += dur
                r = rows.setdefault(ev.metadata_id, {
                    "name": md.display_name or md.name.split(" = ")[0].lstrip("%"),
                    "hlo": md.name,
                    "calls": 0,
                    "ps": 0,
                    **{k: int(v) for k, v in _stat_map(plane, md).items()
                       if k in ("model_flops", "bytes_accessed")},
                    "category": _stat_map(plane, md).get("hlo_category", ""),
                })
                r["calls"] += 1
                r["ps"] += dur
    out = sorted(rows.values(), key=lambda r: -r["ps"])
    for r in out:
        r["ms_total"] = r["ps"] / 1e9
        r["ms_step"] = r["ms_total"] / steps
        r["per_call_ms"] = r["ms_total"] / max(r["calls"], 1)
        fl = r.get("model_flops", 0) * r["calls"]
        by = r.get("bytes_accessed", 0) * r["calls"]
        r["tf_s"] = fl / (r["ms_total"] / 1e3) / 1e12 if r["ms_total"] else 0.0
        r["gb_s"] = by / (r["ms_total"] / 1e3) / 1e9 if r["ms_total"] else 0.0
    return out[:top] + [{
        "name": "TOTAL (device XLA ops)", "hlo": "", "calls": 0, "category": "",
        "ps": total_ps, "ms_total": total_ps / 1e9,
        "ms_step": total_ps / 1e9 / steps, "per_call_ms": 0.0,
        "tf_s": 0.0, "gb_s": 0.0,
    }]


def _src_hint(hlo: str) -> str:
    """Pull the repo source annotation XLA embeds in op metadata, if any."""
    m = re.findall(r"([\w/]+\.py):(\d+)", hlo)
    for f, ln in m:
        if "visualcloze_tpu" in f or "flash" in f:
            return f"{f.split('visualcloze_tpu/')[-1]}:{ln}"
    return m[0][0].rsplit("/", 1)[-1] + ":" + m[0][1] if m else ""


def print_table(rows: list[dict], peak_tf: float) -> None:
    print(f"{'op':42s} {'cat':14s} {'calls':>5s} {'ms/step':>8s} "
          f"{'per-call':>9s} {'TF/s':>6s} {'MFU':>6s} {'GB/s':>6s}  src")
    for r in rows:
        mfu = r["tf_s"] / peak_tf * 100 if r["tf_s"] else 0
        print(f"{r['name'][:42]:42s} {str(r['category'])[:14]:14s} "
              f"{r['calls']:5d} {r['ms_step']*1e3:8.2f} "
              f"{r['per_call_ms']*1e3:9.3f} "
              f"{r['tf_s']:6.0f} {mfu:5.1f}% {r['gb_s']:6.0f}  "
              f"{_src_hint(r['hlo'])}")


# ----------------------------- trace driver -----------------------------

def run_trace(args) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import init_flux
    from visualcloze_tpu.models.quant import init_flux_int8
    from visualcloze_tpu.models.weights import permute_rope_layout
    from visualcloze_tpu.ops.schedule import get_schedule

    full = FluxConfig()
    cfg = dataclasses.replace(
        full, depth=args.depth, depth_single_blocks=args.depth_single)
    key = jax.random.PRNGKey(0)
    if args.dtype == "int8":
        # random int8 tree, device-initialized (no 12 GB checkpoint needed);
        # half rope layout = the serving path (flash_mha_rope fuses rotation)
        params = init_flux_int8(key, cfg)
    else:
        params = permute_rope_layout(init_flux(key, cfg, jnp.bfloat16), cfg)

    l_img = bench.L_IMG if args.stage1 else bench.L2
    steps = args.steps
    inp = bench.make_inputs(cfg, l_img=l_img)
    run = jax.jit(bench.make_run(cfg, inp, rope_layout="half"))
    ts = jnp.asarray(get_schedule(steps + 1, l_img, shift=True), jnp.float32)
    if not args.stage1:
        # SDEdit truncation: stage-2 integrates the strength-suffix of the
        # schedule (pipeline prepare_upsampling; bench STEPS2/NOISE2)
        ts = ts[-(steps + 1):]

    print(f"compiling {args.dtype} {cfg.depth}+{cfg.depth_single_blocks} slice "
          f"@ L={l_img}+{bench.L_TXT}, {steps} steps...", file=sys.stderr)
    bench._sync(run(params, inp["x"], ts))
    t = bench._time3(run, params, inp["x"], ts)
    fl = bench.dit_flops(cfg, l_img, bench.L_TXT)
    print(f"wall: {t:.3f}s = {t/steps*1e3:.1f} ms/step, "
          f"MFU {fl/(t/steps)/bench.V5E_PEAK_BF16:.1%}", file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        bench._sync(run(params, inp["x"], ts))
    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime)
    assert paths, f"no xplane written under {args.trace_dir}"
    return paths[-1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dtype", choices=("int8", "bf16"), default="int8")
    ap.add_argument("--stage1", action="store_true",
                    help="trace the stage-1 shape instead (comparison)")
    ap.add_argument("--steps", type=int, default=9)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--depth_single", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/profile_stage2")
    ap.add_argument("--xplane", help="parse an existing .xplane.pb and exit")
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    path = args.xplane or run_trace(args)
    print(f"xplane: {path}", file=sys.stderr)
    t0 = time.perf_counter()
    rows = summarize_xplane(path, steps=args.steps, top=args.top)
    print(f"parsed in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print_table(rows, peak_tf=197.0)


if __name__ == "__main__":
    main()
