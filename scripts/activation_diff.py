"""Per-layer activation-diff harness for weight-conversion fidelity.

The round-3 real-weight gate (PSNR>40 vs the reference on Graph200K) depends
on converter fidelity — silent transposition/layout errors dominate output
error (SURVEY.md §7 hard parts). This tool localizes them to a block:

1) JAX side — dump per-block residual-stream activations for a converted
   checkpoint on fixed inputs:

     python scripts/activation_diff.py dump \
       --ckpt /path/flux1-fill-dev.safetensors --out jax_acts.npz \
       [--tiny]  [--seed 0]

2) Torch side (run in the reference environment; not shipped here): register
   forward hooks on model.double_blocks[i] / single_blocks[i], feed the SAME
   inputs (saved alongside the dump as *_inputs.npz), and save npz with keys
   double_img_{i}, double_txt_{i}, single_{i}, out.

3) Compare:

     python scripts/activation_diff.py diff --a jax_acts.npz --b torch_acts.npz

   Prints per-block max/mean abs error and PSNR; the first block where error
   jumps is where the conversion is wrong.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def _flat_keys(acts) -> dict[str, np.ndarray]:
    """Expand stacked per-block arrays to per-block keys."""
    out = {}
    for name in ("embed_img", "embed_txt", "vec", "out"):
        if name in acts:
            out[name] = np.asarray(acts[name], np.float32)
    for name in ("double_img", "double_txt", "single"):
        if name in acts:
            stacked = np.asarray(acts[name], np.float32)
            for i in range(stacked.shape[0]):
                out[f"{name}_{i}"] = stacked[i]
    return out


def cmd_dump(args) -> None:
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the image pre-imports jax with a hardware plugin; config.update
        # before first backend use is authoritative (tests/conftest.py trick)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import flux_apply, init_flux

    if args.tiny:
        cfg = FluxConfig().tiny()
        params = init_flux(jax.random.PRNGKey(0), cfg)
    else:
        from visualcloze_tpu.models.weights import convert_flux, load_safetensors

        cfg = FluxConfig()
        params = convert_flux(load_safetensors(args.ckpt), cfg)

    rng = np.random.default_rng(args.seed)
    b, l_img, l_txt = 1, args.l_img, args.l_txt
    img_ids = np.zeros((b, l_img, 3), np.float32)
    side = max(int(np.sqrt(l_img)), 1)
    img_ids[..., 0] = 1
    img_ids[..., 1] = (np.arange(l_img) // side)[None]
    img_ids[..., 2] = (np.arange(l_img) % side)[None]
    inputs = dict(
        img=rng.standard_normal((b, l_img, cfg.in_channels)).astype(np.float32),
        img_ids=img_ids,
        txt=rng.standard_normal((b, l_txt, cfg.context_in_dim)).astype(np.float32),
        txt_ids=np.zeros((b, l_txt, 3), np.float32),
        timesteps=np.full((b,), 0.5, np.float32),
        y=rng.standard_normal((b, cfg.vec_in_dim)).astype(np.float32),
        guidance=np.full((b,), 30.0, np.float32),
    )
    np.savez(args.out.replace(".npz", "_inputs.npz"), **inputs)

    fwd = jax.jit(
        lambda p, kw: flux_apply(cfg, p, **kw, attn_impl="xla", capture_activations=True)
    )
    out, acts = fwd(params, {k: jnp.asarray(v) for k, v in inputs.items()})
    np.savez(args.out, **_flat_keys(acts))
    print(f"dumped {len(_flat_keys(acts))} activation tensors to {args.out} "
          f"(inputs alongside); out[0,0,:4]={np.asarray(out)[0, 0, :4]}")


def cmd_diff(args) -> None:
    a = dict(np.load(args.a))
    b = dict(np.load(args.b))
    keys = sorted(set(a) & set(b))
    missing = sorted(set(a) ^ set(b))
    if missing:
        print(f"(keys only on one side, skipped: {missing})")
    worst = None
    for k in keys:
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        if x.shape != y.shape:
            print(f"{k:>16}: SHAPE MISMATCH {x.shape} vs {y.shape}")
            continue
        err = np.abs(x - y)
        rng_ = max(float(np.abs(y).max()), 1e-12)
        mse = float((err ** 2).mean())
        psnr = 10 * np.log10(rng_ ** 2 / max(mse, 1e-24))
        print(f"{k:>16}: max {err.max():10.3e}  mean {err.mean():10.3e}  PSNR {psnr:6.1f} dB")
        if worst is None or psnr < worst[1]:
            worst = (k, psnr)
    if worst:
        print(f"\nworst block: {worst[0]} at {worst[1]:.1f} dB "
              f"{'(conversion suspect)' if worst[1] < 40 else '(healthy)'}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--ckpt", default=None)
    d.add_argument("--out", default="jax_acts.npz")
    d.add_argument("--tiny", action="store_true")
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--l_img", type=int, default=64)
    d.add_argument("--l_txt", type=int, default=16)
    d.set_defaults(fn=cmd_dump)
    c = sub.add_parser("diff")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)
    c.set_defaults(fn=cmd_diff)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
