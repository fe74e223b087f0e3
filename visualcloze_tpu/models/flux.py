"""The FLUX flow-matching DiT, functional and scan-compiled.

TPU-native counterpart of the reference Flux module (models/model.py:35-151).
Key departures, all TPU-motivated:
  - parameters are a pytree; the 19 double / 38 single blocks are *stacked*
    along a leading axis and executed with `lax.scan` — one compiled block
    body per block type instead of 57 inlined blocks (fast compile, small
    program, natural fit for per-block jax.checkpoint rematerialisation,
    mirrors the reference's FSDP wrap/checkpoint module lists
    model.py:147-151 / train.py:396-412),
  - LoRA is a separate pytree applied functionally (or folded into the base
    weights for inference — models/lora.py), replacing the nn.Linear
    subclassing of FluxLoraWrapper (model.py:154-175),
  - attention dispatches to the Pallas flash kernel on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import FluxConfig
from ..ops.rope import embed_nd
from ..ops.schedule import timestep_embedding
from . import layers
from .layers import Params


def init_flux(key: jax.Array, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    """Random-init Flux parameter pytree (block params stacked for scan)."""
    ks = jax.random.split(key, 8)
    double_keys = jax.random.split(ks[5], cfg.depth)
    single_keys = jax.random.split(ks[6], cfg.depth_single_blocks)
    params = {
        "img_in": layers._init_linear(ks[0], cfg.in_channels, cfg.hidden_size, dtype=dtype),
        "txt_in": layers._init_linear(ks[1], cfg.context_in_dim, cfg.hidden_size, dtype=dtype),
        "time_in": layers.init_mlp_embedder(ks[2], 256, cfg.hidden_size, dtype=dtype),
        "vector_in": layers.init_mlp_embedder(ks[3], cfg.vec_in_dim, cfg.hidden_size, dtype=dtype),
        "double_blocks": jax.vmap(lambda k: layers.init_double_block(k, cfg, dtype))(double_keys),
        "single_blocks": jax.vmap(lambda k: layers.init_single_block(k, cfg, dtype))(single_keys),
        "final_layer": layers.init_last_layer(ks[7], cfg, dtype=dtype),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = layers.init_mlp_embedder(ks[4], 256, cfg.hidden_size, dtype=dtype)
    return params


def embed_inputs(
    cfg: FluxConfig,
    params: Params,
    l: Params,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    txt_mask: jnp.ndarray | None,
    img_mask: jnp.ndarray | None,
    guidance: jnp.ndarray | None,
    lora_scale,
):
    """The pre-block prologue shared by flux_apply and the pipeline-parallel
    variant (parallel/pipeline.flux_apply_pp): token embeddings, the
    modulation vector, RoPE tables, and the concat attention mask.

    Returns (img, txt, vec, pe, attn_mask); attn_mask is None on the
    no-padding fast path (the flash kernel then skips its bias pass)."""
    img = layers.linear(params["img_in"], img, l.get("img_in"), lora_scale)
    vec = layers.mlp_embedder(
        params["time_in"], timestep_embedding(timesteps, 256), l.get("time_in"), lora_scale
    )
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance_embed model needs a guidance vector")
        vec = vec + layers.mlp_embedder(
            params["guidance_in"], timestep_embedding(guidance, 256), l.get("guidance_in"), lora_scale
        )
    vec = vec + layers.mlp_embedder(params["vector_in"], y, l.get("vector_in"), lora_scale)
    txt = layers.linear(params["txt_in"], txt, l.get("txt_in"), lora_scale)

    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    pe = embed_nd(ids, cfg.axes_dim, cfg.theta)

    b, txt_len = txt.shape[:2]
    if txt_mask is None and img_mask is None:
        attn_mask = None
    else:
        if txt_mask is None:
            txt_mask = jnp.ones((b, txt_len), dtype=jnp.int32)
        if img_mask is None:
            img_mask = jnp.ones((b, img.shape[1]), dtype=jnp.int32)
        attn_mask = jnp.concatenate([txt_mask, img_mask], axis=1)
    return img, txt, vec, pe, attn_mask


def flux_apply(
    cfg: FluxConfig,
    params: Params,
    *,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    txt_mask: jnp.ndarray | None = None,
    img_mask: jnp.ndarray | None = None,
    guidance: jnp.ndarray | None = None,
    lora: Params | None = None,
    lora_scale=1.0,
    attn_impl: str = "auto",
    remat: bool = False,
    remat_policy: str | None = None,
    rope_layout: str = "interleaved",
    capture_activations: bool = False,
    collect_a8_stats: bool = False,
) -> jnp.ndarray | tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Forward pass (ref: models/model.py:85-124).

    Args:
      img:       (B, L_img, in_channels) packed image tokens (+ fill cond).
      img_ids:   (B, L_img, 3) position ids (row, y, x).
      txt:       (B, L_txt, context_in_dim) T5 features.
      txt_ids:   (B, L_txt, 3) zeros.
      timesteps: (B,) flux time (1 = noise).
      y:         (B, vec_in_dim) CLIP pooled vector.
      txt_mask/img_mask: (B, L) int {1 real, 0 pad}.
      guidance:  (B,) embedded-guidance strength (guidance-distilled model).
      lora:      optional LoRA pytree mirroring `params` (see models/lora.py).
      remat:     checkpoint each block body (training).
      capture_activations: also return per-block residual-stream activations
        — the per-layer activation-diff harness for weight-conversion
        fidelity debugging (SURVEY.md §7 hard parts; scripts/activation_diff.py).
        Returns (out, {"embed_img", "embed_txt", "vec", "double_img"
        (depth, B, L_img, H), "double_txt", "single" (depth_s, B, L, H),
        "out"}). Memory: depth x (B, L, 3072) — use with small/offline runs.
      collect_a8_stats: instead return (out, stats) where stats holds the
        per-input-channel absmax of every token-dim block linear's input
        (stacked (depth, in) per entry) — the SmoothQuant calibration pass
        (models/quant.calibrate_flux_a8). Mutually exclusive with remat and
        capture_activations.

    Returns: (B, L_img, out_channels) velocity tokens (or a tuple when
    capture_activations / collect_a8_stats is set).
    """
    if collect_a8_stats and (capture_activations or remat):
        raise ValueError("collect_a8_stats is a standalone calibration mode")
    l = lora or {}
    img, txt, vec, pe, attn_mask = embed_inputs(
        cfg, params, l, img, img_ids, txt, txt_ids, timesteps, y,
        txt_mask, img_mask, guidance, lora_scale,
    )
    txt_len = txt.shape[1]

    # Partial-coverage adapters are legal (convert_lora_diffusers omits
    # sections absent from the checkpoint) — gate each scan on its own key.

    # remat_policy "dots": keep matmul outputs, recompute elementwise —
    # ~25% less backward compute than full recompute for more activation
    # memory; None matches the reference's full checkpoint_wrapper.
    # "dots_split": two checkpoint segments per block with the attention call
    # BETWEEN them, so the flash kernel's custom-VJP residuals are stored and
    # its forward recompute in the backward disappears (the ~12%-of-backward
    # headroom docs/PROFILE.md diagnoses; a "save attention outputs" policy
    # can't do this because the residuals are internal to the VJP).
    seg = None
    if remat and remat_policy == "dots_split":
        seg = lambda f: jax.checkpoint(  # noqa: E731
            f, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )

    def dbody(carry, xs):
        bp, bl = xs
        i, t = carry
        r = layers.double_block(
            cfg, bp, i, t, vec, pe, attn_mask, bl, lora_scale, attn_impl, rope_layout,
            seg=seg, collect_stats=collect_a8_stats,
        )
        if collect_a8_stats:
            (i, t), st = r
            return (i, t), st
        i, t = r
        return (i, t), ((i, t) if capture_activations else None)

    def sbody(x, xs):
        bp, bl = xs
        r = layers.single_block(
            cfg, bp, x, vec, pe, attn_mask, bl, lora_scale, attn_impl, rope_layout,
            seg=seg, collect_stats=collect_a8_stats,
        )
        if collect_a8_stats:
            x, st = r
            return x, st
        x = r
        return x, (x if capture_activations else None)

    if remat and remat_policy != "dots_split":
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat_policy == "dots" else None
        )
        dbody = jax.checkpoint(dbody, policy=policy)
        sbody = jax.checkpoint(sbody, policy=policy)

    d_lora = l.get("double_blocks")
    s_lora = l.get("single_blocks")
    acts: dict[str, jnp.ndarray] = {}
    if capture_activations:
        acts["embed_img"], acts["embed_txt"], acts["vec"] = img, txt, vec
    (img, txt), d_ys = jax.lax.scan(dbody, (img, txt), (params["double_blocks"], d_lora))

    x = jnp.concatenate([txt, img], axis=1)
    x, s_ys = jax.lax.scan(sbody, x, (params["single_blocks"], s_lora))
    img = x[:, txt_len:]

    out = layers.last_layer(
        params["final_layer"], img, vec, l.get("final_layer"), lora_scale
    )
    if collect_a8_stats:
        return out, {"double_blocks": d_ys, "single_blocks": s_ys}
    if capture_activations:
        acts["double_img"], acts["double_txt"] = d_ys
        acts["single"] = s_ys
        acts["out"] = out
        return out, acts
    return out


def flux_apply_cfg(
    cfg: FluxConfig,
    params: Params,
    cfg_scale: float,
    **kwargs,
) -> jnp.ndarray:
    """Classifier-free-guidance forward (ref: models/model.py:126-145):
    batch is [cond | uncond] halves; returns guided velocities duplicated."""
    out = flux_apply(cfg, params, **kwargs)
    cond_v, uncond_v = jnp.split(out, 2, axis=0)
    cond_v = uncond_v + cfg_scale * (cond_v - uncond_v)
    return jnp.concatenate([cond_v, uncond_v], axis=0)


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
