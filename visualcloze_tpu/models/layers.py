"""Functional FLUX transformer layers.

TPU-native counterpart of the reference's nn.Module layers
(models/modules/layers.py). Everything here is a pure function over parameter
pytrees; blocks are designed to be stacked along a leading axis and driven by
`lax.scan` (one compiled block body instead of 57 unrolled blocks — compile
time and HBM-resident code size both drop by ~50x).

Precision policy (mirrors the reference under torch.autocast bf16):
  - matmuls in the parameter dtype (bf16 on TPU) with MXU fp32 accumulation,
  - LayerNorm / RMSNorm / RoPE / softmax in fp32,
  - modulation arithmetic in fp32, cast to bf16 at the next matmul.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import FluxConfig
from ..ops.attention import attention, rope_qk

Params = dict[str, Any]


# ----------------------------- primitives -----------------------------

MOE_TOP_K = 2  # reference MixtureOfLoRAExperts default (lora.py:112)


def _lora_delta(lora: Params, x: jnp.ndarray, scale) -> jnp.ndarray:
    """x @ A @ B * scale (+ B bias); lora_B carries a bias in the reference
    (models/modules/lora.py:77-88, lora_bias=True)."""
    if "expert_a" in lora:
        return _moe_lora_delta(lora, x, scale)
    y = jnp.einsum("...i,ir->...r", x, lora["a"].astype(x.dtype))
    y = jnp.einsum("...r,ro->...o", y, lora["b"].astype(x.dtype))
    if "b_bias" in lora:
        y = y + lora["b_bias"].astype(y.dtype)
    return y * jnp.asarray(scale, dtype=y.dtype)


def _moe_lora_delta(lora: Params, x: jnp.ndarray, scale) -> jnp.ndarray:
    """Mixture-of-LoRA-Experts delta: shared LoRA + top-k gated expert LoRAs
    (working TPU-native version of the reference's dead MixtureOfLoRAExperts,
    models/modules/lora.py:101-199; see models/lora.init_moe_lora).

    TPU-first routing: every expert's low-rank delta is computed DENSELY as
    one batched einsum over the expert axis and combined with the sparse
    top-k gate weights. For the MoE-LoRA regime (E <= 8, rank <= 256) the
    extra FLOPs are far cheaper than gather/scatter token routing, which
    XLA cannot tile onto the MXU; the expert einsums also shard cleanly over
    an `ep` mesh axis (one psum over experts, inserted by GSPMD).
    """
    shared = jnp.einsum("...i,ir->...r", x, lora["shared_a"].astype(x.dtype))
    shared = jnp.einsum("...r,ro->...o", shared, lora["shared_b"].astype(x.dtype))

    # token-wise gate in fp32, softmax over experts, renormalized top-k
    logits = jnp.einsum(
        "...i,ie->...e", x.astype(jnp.float32), lora["gate_w"].astype(jnp.float32)
    ) + lora["gate_b"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (..., E)
    n_exp = probs.shape[-1]
    k = min(MOE_TOP_K, n_exp)
    top_v, top_i = jax.lax.top_k(probs, k)
    top_v = top_v / jnp.sum(top_v, axis=-1, keepdims=True)
    weights = jnp.sum(
        jax.nn.one_hot(top_i, n_exp, dtype=jnp.float32) * top_v[..., None], axis=-2
    )  # (..., E) sparse gate weights

    h = jnp.einsum("...i,eir->...er", x, lora["expert_a"].astype(x.dtype))
    d = jnp.einsum("...er,ero->...eo", h, lora["expert_b"].astype(x.dtype))
    expert_out = jnp.einsum("...eo,...e->...o", d, weights.astype(d.dtype))

    return (shared + expert_out) * jnp.asarray(scale, dtype=x.dtype)


def linear(p: Params, x: jnp.ndarray, lora: Params | None = None, lora_scale=1.0) -> jnp.ndarray:
    """y = x @ W (+ b) (+ LoRA delta). W stored (in, out).

    Also dispatches int8 weight-only entries (models/quant.py): storage int8,
    compute bf16 — XLA fuses the convert into the matmul's weight loads."""
    if "w_int8" in p and "a8" in p:
        # w8a8 (models/quant.quantize_flux_w8a8): per-token dynamic int8
        # activations x int8 weights -> s32 on the MXU int8 path, rescaled
        # by act_scale * w_scale. Measured on v5e the int8 MXU runs ~1.37x
        # the bf16 rate, making this 1.34x faster than the weight-only
        # branch in-model (docs/DESIGN.md). The barrier pins the weight
        # load in-loop exactly like the weight-only branch.
        from .quant import act_quant_int8

        # SmoothQuant equalization (models/quant.quantize_flux_w8a8_smooth):
        # the quantized matmul computes (x * a_sinv) @ (s * w) == x @ w with
        # activation outliers migrated into the weights; the divide fuses
        # into the quantize's elementwise chain. LoRA below still sees the
        # original x.
        xs = x.astype(jnp.float32) * p["a_sinv"] if "a_sinv" in p else x
        xq, x_scale = act_quant_int8(xs)
        w8 = jax.lax.optimization_barrier(p["w_int8"])
        acc = jnp.einsum(
            "...i,io->...o", xq, w8, preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * x_scale * p["w_scale"]
        y = y.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)  # for the LoRA delta below
    elif "w_int8" in p:
        x = x.astype(jnp.bfloat16)
        # XLA's fused convert-dot beats the hand-written Pallas int8 kernel
        # here (measured 80% vs 61% MFU — ops/int8_matmul.py remains as a
        # layout-agnostic alternative). The barrier sits on the INT8 value:
        # it pins the weight load inside the (denoise) loop body — without
        # it XLA hoists the loop-invariant converts and materializes the
        # whole bf16 model (OOM on a 16 GB chip) — while leaving the
        # convert free to fuse into the matmul's weight-tile loads
        # (barrier-after-convert forced a materialized bf16 copy instead).
        w_bf16 = jax.lax.optimization_barrier(p["w_int8"]).astype(jnp.bfloat16)
        y = jnp.einsum("...i,io->...o", x, w_bf16)
        # rescale in fp32 like dequantize_linear (the parity oracle) — a
        # bf16-rounded scale adds up to 2^-9 systematic per-channel bias on
        # top of the int8 noise; XLA fuses multiply-then-cast either way
        y = (y.astype(jnp.float32) * p["w_scale"]).astype(jnp.bfloat16)
    elif "w_int4" in p:
        # int4 entries (models/quant.quantize_weight_int4): group-scaled
        # nibble codes, unpacked in-loop behind the same anti-hoist barrier.
        # Capacity mode for memory-constrained serving; DiT quality under
        # int4 is gated on real-weight validation (docs/ROADMAP.md).
        from .quant import dequant_weight_int4

        x = x.astype(jnp.bfloat16)
        w4 = dict(p, w_int4=jax.lax.optimization_barrier(p["w_int4"]))
        y = jnp.einsum("...i,io->...o", x, dequant_weight_int4(w4, jnp.bfloat16))
    else:
        w = p["w"]
        x = x.astype(w.dtype)
        y = jnp.einsum("...i,io->...o", x, w)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    if lora is not None:
        y = y + _lora_delta(lora, x, lora_scale)
    return y


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm in fp32 (returns fp32, like torch autocast)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """fp32 RMS norm, cast back before the learned scale
    (ref: models/modules/layers.py:63-72)."""
    x32 = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (x32 * rrms).astype(x.dtype) * scale.astype(x.dtype)


def qk_norm(p: Params, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """RMS-normalize q and k, cast to v's dtype (ref layers.py:75-84)."""
    q = rms_norm(q, p["q_scale"]).astype(v.dtype)
    k = rms_norm(k, p["k_scale"]).astype(v.dtype)
    return q, k


def mlp_embedder(p: Params, x: jnp.ndarray, lora: Params | None = None, lora_scale=1.0) -> jnp.ndarray:
    """out_layer(silu(in_layer(x))) (ref layers.py:52-60)."""
    l = lora or {}
    h = linear(p["in_layer"], x, l.get("in_layer"), lora_scale)
    h = jax.nn.silu(h)
    return linear(p["out_layer"], h, l.get("out_layer"), lora_scale)


def modulation(p: Params, vec: jnp.ndarray, double: bool, lora: Params | None = None, lora_scale=1.0):
    """adaLN modulation: silu -> linear -> chunks of (shift, scale, gate)
    (ref layers.py:113-126). Returns fp32 chunks with a length-1 seq axis."""
    mult = 6 if double else 3
    out = linear(p["lin"], jax.nn.silu(vec), lora, lora_scale)
    out = out.astype(jnp.float32)[:, None, :]
    chunks = jnp.split(out, mult, axis=-1)
    m1 = {"shift": chunks[0], "scale": chunks[1], "gate": chunks[2]}
    m2 = {"shift": chunks[3], "scale": chunks[4], "gate": chunks[5]} if double else None
    return m1, m2


def _absmax_in(t: jnp.ndarray) -> jnp.ndarray:
    """Per-input-channel absmax over batch+seq: (..., in) -> (in,) fp32.
    Calibration statistic for SmoothQuant activation equalization
    (models/quant.smooth_scales)."""
    return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=tuple(range(t.ndim - 1)))


def _split_heads(qkv: jnp.ndarray, num_heads: int):
    """(B, L, 3*H*D) -> three (B, H, L, D); feature order (k, h, d) matches
    the reference rearrange "B L (K H D) -> K B H L D"."""
    b, l, f = qkv.shape
    d = f // (3 * num_heads)
    x = qkv.reshape(b, l, 3, num_heads, d)
    x = jnp.moveaxis(x, (2, 3), (0, 2))  # (3, B, H, L, D)
    return x[0], x[1], x[2]


# ----------------------------- blocks -----------------------------

def double_block(
    cfg: FluxConfig,
    p: Params,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    vec: jnp.ndarray,
    pe,
    attn_mask: jnp.ndarray | None,
    lora: Params | None = None,
    lora_scale=1.0,
    attn_impl: str = "auto",
    rope_layout: str = "interleaved",
    seg=None,
    collect_stats: bool = False,
):
    """DoubleStreamBlock (ref layers.py:129-196): separate img/txt streams with
    joint attention over concat(txt, img).

    seg: optional checkpoint wrapper applied to the pre-attention and
    post-attention halves (two-segment remat). The attention call itself runs
    OUTSIDE the checkpointed segments so the flash kernel's custom-VJP
    residuals (rotated q/k, v, o, lse) are stored rather than recomputed in
    the backward — the recompute elimination docs/PROFILE.md identifies.
    RoPE is applied inside the first segment so the rotated q/k double as the
    kernel residuals instead of duplicating them.

    collect_stats: additionally return the per-input-channel absmax of each
    token-dim linear's input (SmoothQuant calibration,
    models/quant.calibrate_flux_a8); incompatible with seg."""
    l = lora or {}
    txt_len = txt.shape[1]
    if collect_stats and seg is not None:
        raise ValueError("collect_stats is a calibration (no-remat) mode")
    stats: dict | None = {} if collect_stats else None

    def rec(mod_key, leaf_key, t):
        if stats is not None:
            stats.setdefault(mod_key, {})[leaf_key] = _absmax_in(t)

    def qkv_stream(name, stream_p, stream_l, x, mod):
        x_mod = (1.0 + mod["scale"]) * layer_norm(x) + mod["shift"]
        rec(name, "qkv", x_mod)
        qkv = linear(stream_p["qkv"], x_mod, stream_l.get("qkv"), lora_scale)
        q, k, v = _split_heads(qkv, cfg.num_heads)
        q, k = qk_norm(stream_p["norm"], q, k, v)
        return q, k, v

    def pre(img, txt):
        img_mod1, img_mod2 = modulation(p["img_mod"], vec, True, l.get("img_mod", {}).get("lin"), lora_scale)
        txt_mod1, txt_mod2 = modulation(p["txt_mod"], vec, True, l.get("txt_mod", {}).get("lin"), lora_scale)
        img_q, img_k, img_v = qkv_stream("img_attn", p["img_attn"], l.get("img_attn", {}), img, img_mod1)
        txt_q, txt_k, txt_v = qkv_stream("txt_attn", p["txt_attn"], l.get("txt_attn", {}), txt, txt_mod1)
        q = jnp.concatenate([txt_q, img_q], axis=2)
        k = jnp.concatenate([txt_k, img_k], axis=2)
        v = jnp.concatenate([txt_v, img_v], axis=2)
        if seg is not None:  # remat path: rotated q/k double as kernel residuals
            q, k = rope_qk(q, k, pe, rope_layout)
        return q, k, v, (img_mod1, img_mod2, txt_mod1, txt_mod2)

    def post(img, txt, attn, mods):
        img_mod1, img_mod2, txt_mod1, txt_mod2 = mods
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]
        rec("img_attn", "proj", img_attn)
        rec("txt_attn", "proj", txt_attn)

        def mlp(name, stream_p, stream_l, x, mod):
            x_mod = ((1.0 + mod["scale"]) * layer_norm(x) + mod["shift"])
            rec(name, "0", x_mod)
            h = linear(stream_p["0"], x_mod, stream_l.get("0"), lora_scale)
            h = jax.nn.gelu(h, approximate=True)
            rec(name, "2", h)
            return linear(stream_p["2"], h, stream_l.get("2"), lora_scale)

        img = img + (img_mod1["gate"] * linear(
            p["img_attn"]["proj"], img_attn, l.get("img_attn", {}).get("proj"), lora_scale
        ).astype(jnp.float32)).astype(img.dtype)
        img = img + (img_mod2["gate"] * mlp("img_mlp", p["img_mlp"], l.get("img_mlp", {}), img, img_mod2).astype(jnp.float32)).astype(img.dtype)

        txt = txt + (txt_mod1["gate"] * linear(
            p["txt_attn"]["proj"], txt_attn, l.get("txt_attn", {}).get("proj"), lora_scale
        ).astype(jnp.float32)).astype(txt.dtype)
        txt = txt + (txt_mod2["gate"] * mlp("txt_mlp", p["txt_mlp"], l.get("txt_mlp", {}), txt, txt_mod2).astype(jnp.float32)).astype(txt.dtype)
        return img, txt

    if seg is not None:
        pre, post = seg(pre), seg(post)
    q, k, v, mods = pre(img, txt)
    attn = attention(q, k, v, None if seg is not None else pe, mask=attn_mask,
                     impl=attn_impl, rope_layout=rope_layout)
    out = post(img, txt, attn, mods)
    if collect_stats:
        return out, stats
    return out


def single_block(
    cfg: FluxConfig,
    p: Params,
    x: jnp.ndarray,
    vec: jnp.ndarray,
    pe,
    attn_mask: jnp.ndarray | None,
    lora: Params | None = None,
    lora_scale=1.0,
    attn_impl: str = "auto",
    rope_layout: str = "interleaved",
    seg=None,
    collect_stats: bool = False,
) -> jnp.ndarray:
    """SingleStreamBlock (ref layers.py:199-245): fused parallel attn+MLP.

    seg: optional two-segment checkpoint wrapper — see double_block. The
    fused linear1 output `h` is a segment boundary; the mlp half is re-sliced
    from it in the second segment so it isn't stored twice.

    collect_stats: see double_block."""
    l = lora or {}
    if collect_stats and seg is not None:
        raise ValueError("collect_stats is a calibration (no-remat) mode")
    stats: dict | None = {} if collect_stats else None

    def pre(x):
        mod, _ = modulation(p["modulation"], vec, False, l.get("modulation", {}).get("lin"), lora_scale)
        x_mod = ((1.0 + mod["scale"]) * layer_norm(x) + mod["shift"]).astype(x.dtype)
        if stats is not None:
            stats["linear1"] = _absmax_in(x_mod)
        h = linear(p["linear1"], x_mod, l.get("linear1"), lora_scale)
        q, k, v = _split_heads(h[..., : 3 * cfg.hidden_size], cfg.num_heads)
        q, k = qk_norm(p["norm"], q, k, v)
        if seg is not None:  # remat path: rotated q/k double as kernel residuals
            q, k = rope_qk(q, k, pe, rope_layout)
        return q, k, v, h, mod

    def post(x, attn, h, mod):
        mlp_h = h[..., 3 * cfg.hidden_size :]
        cat = jnp.concatenate([attn, jax.nn.gelu(mlp_h, approximate=True)], axis=-1)
        if stats is not None:
            stats["linear2"] = _absmax_in(cat)
        out = linear(p["linear2"], cat, l.get("linear2"), lora_scale)
        return x + (mod["gate"] * out.astype(jnp.float32)).astype(x.dtype)

    if seg is not None:
        pre, post = seg(pre), seg(post)
    q, k, v, h, mod = pre(x)
    attn = attention(q, k, v, None if seg is not None else pe, mask=attn_mask,
                     impl=attn_impl, rope_layout=rope_layout)
    out = post(x, attn, h, mod)
    if collect_stats:
        return out, stats
    return out


def last_layer(
    p: Params,
    x: jnp.ndarray,
    vec: jnp.ndarray,
    lora: Params | None = None,
    lora_scale=1.0,
) -> jnp.ndarray:
    """LastLayer (ref layers.py:248-259): adaLN (shift, scale) + linear."""
    l = lora or {}
    mod = linear(p["adaLN"], jax.nn.silu(vec), l.get("adaLN"), lora_scale).astype(jnp.float32)
    shift, scale = jnp.split(mod, 2, axis=-1)
    x = (1.0 + scale[:, None]) * layer_norm(x) + shift[:, None]
    # linear() casts its input per weight layout (plain/int8/int4/w8a8)
    return linear(p["linear"], x, l.get("linear"), lora_scale)


# ----------------------------- initializers -----------------------------

def _init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, _ = jax.random.split(key)
    w = jax.random.normal(kw, (d_in, d_out), dtype=jnp.float32) * (d_in ** -0.5)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def init_mlp_embedder(key, d_in: int, d_hidden: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in_layer": _init_linear(k1, d_in, d_hidden, dtype=dtype),
        "out_layer": _init_linear(k2, d_hidden, d_hidden, dtype=dtype),
    }


def init_double_block(key, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 10)
    h, mh, d = cfg.hidden_size, cfg.mlp_hidden_dim, cfg.head_dim
    return {
        "img_mod": {"lin": _init_linear(ks[0], h, 6 * h, dtype=dtype)},
        "txt_mod": {"lin": _init_linear(ks[1], h, 6 * h, dtype=dtype)},
        "img_attn": {
            "qkv": _init_linear(ks[2], h, 3 * h, bias=cfg.qkv_bias, dtype=dtype),
            "proj": _init_linear(ks[3], h, h, dtype=dtype),
            "norm": {"q_scale": jnp.ones((d,), dtype), "k_scale": jnp.ones((d,), dtype)},
        },
        "txt_attn": {
            "qkv": _init_linear(ks[4], h, 3 * h, bias=cfg.qkv_bias, dtype=dtype),
            "proj": _init_linear(ks[5], h, h, dtype=dtype),
            "norm": {"q_scale": jnp.ones((d,), dtype), "k_scale": jnp.ones((d,), dtype)},
        },
        "img_mlp": {
            "0": _init_linear(ks[6], h, mh, dtype=dtype),
            "2": _init_linear(ks[7], mh, h, dtype=dtype),
        },
        "txt_mlp": {
            "0": _init_linear(ks[8], h, mh, dtype=dtype),
            "2": _init_linear(ks[9], mh, h, dtype=dtype),
        },
    }


def init_single_block(key, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    h, mh, d = cfg.hidden_size, cfg.mlp_hidden_dim, cfg.head_dim
    return {
        "linear1": _init_linear(ks[0], h, 3 * h + mh, dtype=dtype),
        "linear2": _init_linear(ks[1], h + mh, h, dtype=dtype),
        "norm": {"q_scale": jnp.ones((d,), dtype), "k_scale": jnp.ones((d,), dtype)},
        "modulation": {"lin": _init_linear(ks[2], h, 3 * h, dtype=dtype)},
    }


def init_last_layer(key, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    h = cfg.hidden_size
    return {
        "linear": _init_linear(k1, h, cfg.out_channels, dtype=dtype),
        "adaLN": _init_linear(k2, h, 2 * h, dtype=dtype),
    }
