"""Flagship-width training-step benchmark (v5e, 1 chip).

Times the full jitted train step (fwd + bwd + AdamW + EMA, LoRA trainability)
on a flagship-width slice (full 3072 hidden / 24 heads; depth cut so bf16
base weights + activations fit one 16 GB chip) at the 384-grid serving
sequence (3584 img + 512 txt tokens):

  python scripts/bench_train_step.py [--depth 4 --depth_single 8 --bs 1]

MFU accounting: 3x the forward matmul FLOPs (backward ~2x fwd), plus the
remat recompute (~1x fwd matmuls under the "dots" save policy's elementwise
recompute is free, full-remat adds 1x) — reported as both raw step time and
3x-flops MFU, with the remat policy printed. Axon-tunnel timing rule: chain
INNER steps in one program, never time a single dispatch
(.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

V5E_PEAK_BF16 = 197e12
INNER = 4  # steps per compiled program (chained via carry)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--depth_single", type=int, default=8)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--l_img", type=int, default=3584)
    p.add_argument("--l_txt", type=int, default=512)
    p.add_argument("--lora_rank", type=int, default=256)
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "dots_split", "full"])
    p.add_argument("--attn", default="auto")
    args = p.parse_args()

    from bench import dit_flops
    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import init_flux
    from visualcloze_tpu.models.lora import init_lora
    from visualcloze_tpu.training import init_train_state, make_optimizer, make_train_step
    from visualcloze_tpu.transport import create_transport

    cfg = dataclasses.replace(
        FluxConfig(), depth=args.depth, depth_single_blocks=args.depth_single
    )
    params = init_flux(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=args.lora_rank)

    transport = create_transport("Linear", "velocity", snr_type="lognorm", do_shift=True)
    opt = make_optimizer(lr=1e-4, grad_clip=2.0)
    state = init_train_state(params, lora, opt, "lora", use_ema=True)
    step = make_train_step(
        cfg, transport, opt, "lora", attn_impl=args.attn, remat=True,
        remat_policy=None if args.remat_policy == "full" else args.remat_policy,
    )

    rng = np.random.default_rng(0)
    bs, l_img, l_txt = args.bs, args.l_img, args.l_txt
    batch = {
        "x1": jnp.asarray(
            rng.standard_normal((1, bs, l_img, cfg.out_channels)), jnp.bfloat16),
        "cond": jnp.asarray(
            rng.standard_normal((1, bs, l_img, cfg.in_channels - cfg.out_channels)),
            jnp.bfloat16),
        "img_ids": jnp.zeros((1, bs, l_img, 3), jnp.float32),
        "img_mask": jnp.ones((1, bs, l_img), jnp.int32),
        "txt": jnp.asarray(
            rng.standard_normal((1, bs, l_txt, cfg.context_in_dim)), jnp.bfloat16),
        "txt_ids": jnp.zeros((1, bs, l_txt, 3), jnp.float32),
        "txt_mask": jnp.ones((1, bs, l_txt), jnp.int32),
        "vec": jnp.asarray(rng.standard_normal((1, bs, cfg.vec_in_dim)), jnp.bfloat16),
    }

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, batch, key):
        def body(carry, k):
            st, _ = carry
            st, metrics = step(st, batch, k)
            return (st, metrics["loss"]), None

        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, INNER)
        )
        return st, loss

    print("compiling...", file=sys.stderr)
    st, loss = chained(state, batch, jax.random.PRNGKey(2))
    _ = float(np.asarray(loss))

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        st, loss = chained(st, batch, jax.random.PRNGKey(3 + i))
        _ = float(np.asarray(loss))
        times.append((time.perf_counter() - t0) / INNER)
    t = statistics.median(times)

    fl = 3.0 * bs * dit_flops(cfg, l_img, l_txt)
    print(
        f"train step ({cfg.depth}+{cfg.depth_single_blocks} blocks, bs={bs}, "
        f"L={l_img}+{l_txt}, lora r{args.lora_rank}, remat={args.remat_policy}, "
        f"attn={args.attn}): {t * 1e3:.1f} ms/step, "
        f"MFU(3x-fwd) {fl / t / V5E_PEAK_BF16:.1%}, loss {float(np.asarray(loss)):.3f}"
    )


if __name__ == "__main__":
    main()
