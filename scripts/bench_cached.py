"""Velocity-cache solver benchmark (v5e, 1 chip).

Measures the denoise wall-clock of the flagship-width bf16 slice (full 3072
hidden / 24 heads, depth cut to fit one chip) on the serving grid
(3456 img + 512 txt tokens, 30 grid points = 29 integrator steps) with the
reference euler solver vs the velocity-cache modes (--solver cached:K,
transport/sampling.py):

  python scripts/bench_cached.py [--depth 4 --depth_single 8 --steps 30]

The cached schedule runs the DiT only on {0, 1, 1+K, 1+2K, ...} plus the
final step; skipped steps are a 3-op velocity extrapolation inside the same
compiled scan (lax.cond), so the measured speedup should approach
29 / n_evals. Axon-tunnel timing rule: the whole denoise is ONE program
(29 chained steps), so a single dispatch is safe to time
(.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))


def n_evals(n_steps: int, k: int) -> int:
    fresh = np.zeros((n_steps,), dtype=bool)
    fresh[: min(2, n_steps)] = True
    fresh[1::k] = True
    fresh[-1] = True
    return int(fresh.sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--depth_single", type=int, default=8)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--intervals", type=int, nargs="+", default=[2, 3])
    args = p.parse_args()

    from bench import L_IMG, _sync, _time3, make_inputs, make_run
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import init_flux
    from visualcloze_tpu.models.weights import permute_rope_layout
    from visualcloze_tpu.ops.schedule import ode_timesteps

    cfg = dataclasses.replace(
        FluxConfig(), depth=args.depth, depth_single_blocks=args.depth_single
    )
    params = permute_rope_layout(init_flux(jax.random.PRNGKey(0), cfg, jnp.bfloat16), cfg)
    inp = make_inputs(cfg)
    ts = jnp.asarray(ode_timesteps(args.steps, L_IMG, do_shift=True))
    n = len(ts) - 1

    results = {}
    for method in ["euler"] + [f"cached:{k}" for k in args.intervals]:
        run = jax.jit(make_run(cfg, inp, method=method))
        print(f"{method}: compiling...", file=sys.stderr)
        _sync(run(params, inp["x"], ts))
        p50 = _time3(run, params, inp["x"], ts)
        results[method] = p50
        evals = n if method == "euler" else n_evals(n, int(method.split(":")[1]))
        speedup = results["euler"] / p50
        print(
            f"{method}: {p50 * 1e3:.0f} ms for {n} integrator steps "
            f"({evals} DiT evals) -> {speedup:.2f}x euler "
            f"(ideal {n / evals:.2f}x)",
            file=sys.stderr,
        )

    import json

    print(json.dumps({
        "metric": f"denoise wall-clock, {args.depth}+{args.depth_single} bf16 slice, "
                  f"{n} steps @ L={L_IMG}+512",
        "euler_s": round(results["euler"], 3),
        **{m: round(t, 3) for m, t in results.items() if m != "euler"},
    }))


if __name__ == "__main__":
    main()
