"""Weight-only int8 quantization for single-chip serving.

The 12B FLUX does not fit one v5e chip (16 GB HBM) in bf16. Symmetric
per-output-channel int8 weights (scales fp32) halve weight HBM to ~12 GB:
storage is int8, the MXU still computes in bf16 — XLA fuses the int8->bf16
convert into the matmul's weight-tile loads, so HBM traffic halves while the
convert cost is ~32/M of the MXU work (negligible at serving sequence
lengths).

This is an optional serving mode (quality/memory tradeoff); multi-chip bf16
via the tp/fsdp mesh remains the default. Layout: a quantized linear entry
carries {"w_int8": (..., in, out) int8, "w_scale": (..., out) fp32, "b": ...}
and is dispatched by models/layers.linear.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def quantize_linear_int8(p: Params) -> Params:
    """{"w", "b"?} -> {"w_int8", "w_scale", "b"?}; symmetric absmax per
    output channel (last dim)."""
    w = p["w"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_int8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_int8": w_int8, "w_scale": scale[..., 0, :].astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_linear(p: Params, dtype=jnp.float32) -> Params:
    w = p["w_int8"].astype(jnp.float32) * p["w_scale"][..., None, :]
    out = {"w": w.astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_flux_int8(params: Params) -> Params:
    """Quantize every linear weight of a Flux pytree (norm scales and biases
    stay in their original dtype)."""

    def walk(node):
        if isinstance(node, dict):
            if "w" in node:
                return quantize_linear_int8(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


# threefry materializes uint32 counters + outputs for the whole request
# (~8 BYTES per uint8 drawn): one eager bits() call for the stacked
# single_blocks.linear1 leaf (38 x 3072 x 21504 = 2.5 GB int8) would
# transiently need ~20 GB — measured OOM on a 16 GB chip. init_flux_int8
# therefore generates stacked leaves above this byte limit ONE LEAD INDEX
# AT A TIME into a donated buffer: peak transient = one slice's temps.
_INIT_CHUNK_LIMIT = 256 << 20


@functools.partial(jax.jit, donate_argnums=0)
def _set_slice(buf, i, s):
    return jax.lax.dynamic_update_index_in_dim(buf, s, i, 0)


def _rand_bits_int8(k, shape, lead=()):
    if not lead or int(np.prod(lead)) * int(np.prod(shape)) <= _INIT_CHUNK_LIMIT:
        bits = jax.random.bits(k, (*lead, *shape), dtype=jnp.uint8)
        return jax.lax.bitcast_convert_type(bits, jnp.int8)
    assert len(lead) == 1
    buf = jnp.zeros((*lead, *shape), jnp.int8)
    for i in range(lead[0]):
        s = jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.fold_in(k, i), shape, dtype=jnp.uint8),
            jnp.int8,
        )
        buf = _set_slice(buf, i, s)
    return buf


def init_flux_int8(key: jax.Array, cfg, seed_scale: float = 0.02) -> Params:
    """Random int8-quantized Flux params built directly on device (no fp32
    intermediates — a 12B fp32 tree would not fit host/device memory).
    Benchmarking/testing seam; real deployments quantize converted weights."""
    from .flux import init_flux
    from .layers import (
        _init_linear,
        init_double_block,
        init_last_layer,
        init_mlp_embedder,
        init_single_block,
    )

    def rand_qlin(k, d_in, d_out, bias=True, lead=()):
        k1, _ = jax.random.split(k)
        p = {
            "w_int8": _rand_bits_int8(k1, (d_in, d_out), lead),
            "w_scale": jnp.full((*lead, d_out), seed_scale * d_in ** -0.5 / 127.0, jnp.float32),
        }
        if bias:
            p["b"] = jnp.zeros((*lead, d_out), jnp.bfloat16)
        return p

    h, mh, d = cfg.hidden_size, cfg.mlp_hidden_dim, cfg.head_dim
    ks = jax.random.split(key, 23)
    D, S = cfg.depth, cfg.depth_single_blocks

    def qnorm(lead):
        return {
            "q_scale": jnp.ones((*lead, d), jnp.bfloat16),
            "k_scale": jnp.ones((*lead, d), jnp.bfloat16),
        }

    params = {
        "img_in": rand_qlin(ks[0], cfg.in_channels, h),
        "txt_in": rand_qlin(ks[1], cfg.context_in_dim, h),
        "time_in": {"in_layer": rand_qlin(ks[2], 256, h), "out_layer": rand_qlin(ks[3], h, h)},
        "vector_in": {"in_layer": rand_qlin(ks[4], cfg.vec_in_dim, h), "out_layer": rand_qlin(ks[5], h, h)},
        "double_blocks": {
            "img_mod": {"lin": rand_qlin(ks[6], h, 6 * h, lead=(D,))},
            "txt_mod": {"lin": rand_qlin(ks[7], h, 6 * h, lead=(D,))},
            "img_attn": {
                "qkv": rand_qlin(ks[8], h, 3 * h, lead=(D,)),
                "proj": rand_qlin(ks[9], h, h, lead=(D,)),
                "norm": qnorm((D,)),
            },
            "txt_attn": {
                "qkv": rand_qlin(ks[10], h, 3 * h, lead=(D,)),
                "proj": rand_qlin(ks[11], h, h, lead=(D,)),
                "norm": qnorm((D,)),
            },
            "img_mlp": {"0": rand_qlin(ks[12], h, mh, lead=(D,)), "2": rand_qlin(ks[13], mh, h, lead=(D,))},
            "txt_mlp": {"0": rand_qlin(ks[14], h, mh, lead=(D,)), "2": rand_qlin(ks[15], mh, h, lead=(D,))},
        },
        "single_blocks": {
            "linear1": rand_qlin(ks[16], h, 3 * h + mh, lead=(S,)),
            "linear2": rand_qlin(ks[17], h + mh, h, lead=(S,)),
            "norm": qnorm((S,)),
            "modulation": {"lin": rand_qlin(ks[18], h, 3 * h, lead=(S,))},
        },
        "final_layer": {
            "linear": rand_qlin(ks[19], h, cfg.out_channels),
            "adaLN": rand_qlin(ks[20], h, 2 * h),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {
            "in_layer": rand_qlin(ks[21], 256, h),
            "out_layer": rand_qlin(ks[22], h, h),
        }
    return params


# ----------------------------- w8a8 (int8 MXU) -----------------------------
#
# Dynamic-activation int8: weights stay in the weight-only int8 layout and a
# static "a8" marker key switches models/layers.linear to quantize the
# activations per token (symmetric absmax over the feature dim) and run the
# matmul as s8 x s8 -> s32 on the MXU int8 path, rescaling by
# act_scale * w_scale afterwards. Measured on v5e (docs/DESIGN.md): the
# int8 MXU runs ~1.37x the bf16 rate (167.9 TOP/s vs 122.1 TFLOP/s in the
# same chained harness), and the 4+8-block DiT slice serves 1.34x faster
# than weight-only int8 (73.1 vs 98.1 ms/step — 116% of bf16-peak
# equivalent). Serving-only and opt-in (--quantize w8a8): per-token
# activation quantization is the standard quality/throughput tradeoff and,
# like int4, is gated on real-weight validation (docs/ROADMAP.md) —
# random-weight forward parity is corr 0.9998 / 0.4% mean-rel on TPU.


def act_quant_int8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric absmax int8: x (..., in) -> (codes int8,
    scale fp32 (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    codes = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return codes, scale


# the token-dim block matmuls (~95% of DiT FLOPs). Modulation lins (vec-dim,
# B x h), the embedder MLPs, and the output head stay weight-only int8:
# int8 activations buy no MXU time there and those layers are the
# quality-sensitive ones under activation quantization.
_A8_KEYS = frozenset({"qkv", "proj", "0", "2", "linear1", "linear2"})


def mark_w8a8(int8_params: Params) -> Params:
    """Add the static "a8" markers to an ALREADY weight-only-int8 tree (e.g.
    one loaded from an on-disk serving checkpoint, pipeline/serving.py).
    Markers are host numpy so marking an mmap'd host tree stays host-side."""
    import numpy as np

    def mark(node, in_blocks, key):
        if isinstance(node, dict):
            if "w_int8" in node:
                if not (in_blocks and key in _A8_KEYS):
                    return node
                # marker carries the entry's lead (block-stack) dims so
                # lax.scan over stacked blocks can slice it like any leaf
                lead = node["w_int8"].shape[:-2]
                return dict(node, a8=np.zeros(lead, np.int8))
            return {
                k: mark(v, in_blocks or k in ("double_blocks", "single_blocks"), k)
                for k, v in node.items()
            }
        return node

    return mark(int8_params, False, "")


def quantize_flux_w8a8(params: Params) -> Params:
    """Weight tree for w8a8 serving: the int8 weight-only layout plus a
    static "a8" marker on the double/single-block token-dim linears (pytree
    keys are static under jit, so layers.linear branches at trace time)."""
    return mark_w8a8(quantize_flux_int8(params))


# ------------------- SmoothQuant equalization for w8a8 -------------------
#
# Per-token dynamic int8 adapts the activation scale per TOKEN; the residual
# error is per-CHANNEL outliers within a token (a handful of channels with
# 10-100x the typical magnitude consume the whole int8 range). SmoothQuant
# (PAPERS.md) migrates that difficulty into the weights with a per-input-
# channel equalization s: the quantized matmul computes
# (x / s) @ (s * w) == x @ w, where s_j = amax_j^alpha / wmax_j^(1-alpha)
# from a calibration pass (calibrate_flux_a8). The divide is one fused
# elementwise multiply in the activation-quantize chain (layers.linear);
# the weight side is folded offline. Exact in fp — only the quantization
# grids move.


def smooth_scales(
    a_stat: jnp.ndarray, w: jnp.ndarray, alpha: float = 0.5, eps: float = 1e-5
) -> jnp.ndarray:
    """Equalization scales s (..., in) from activation absmax stats
    a_stat (..., in) and weights w (..., in, out):
    s = a_stat^alpha / wmax^(1-alpha), clipped to a sane range."""
    a = jnp.maximum(a_stat.astype(jnp.float32), eps)
    wmax = jnp.maximum(
        jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1), eps
    )  # (..., in)
    s = a**alpha / wmax ** (1.0 - alpha)
    return jnp.clip(s, 1e-3, 1e3)


def quantize_flux_w8a8_smooth(
    params: Params, stats: Params, alpha: float = 0.5
) -> Params:
    """w8a8 tree with SmoothQuant equalization: token-dim block linears that
    have calibration stats get their weights folded with s before int8
    quantization plus an "a_sinv" = 1/s leaf (applied to activations inside
    layers.linear); everything else quantizes exactly like
    quantize_flux_w8a8. `stats` is the tree from calibrate_flux_a8."""

    def walk(node, st, in_blocks, key):
        if isinstance(node, dict):
            if "w" in node:
                if not (in_blocks and key in _A8_KEYS):
                    return quantize_linear_int8(node)
                lead = node["w"].shape[:-2]
                if st is None:
                    return dict(
                        quantize_linear_int8(node), a8=jnp.zeros(lead, jnp.int8)
                    )
                s = smooth_scales(st, node["w"], alpha)
                w_s = node["w"].astype(jnp.float32) * s[..., :, None]
                q = quantize_linear_int8(dict(node, w=w_s))
                q["a8"] = jnp.zeros(lead, jnp.int8)
                q["a_sinv"] = (1.0 / s).astype(jnp.float32)
                return q
            return {
                k: walk(
                    v,
                    st.get(k) if isinstance(st, dict) else None,
                    in_blocks or k in ("double_blocks", "single_blocks"),
                    k,
                )
                for k, v in node.items()
            }
        return node

    return walk(params, stats, False, "")


def calibrate_flux_a8(cfg, params: Params, batches, **apply_kw) -> Params:
    """Run the unquantized model over calibration batches and return the
    elementwise-max activation-stats tree for quantize_flux_w8a8_smooth.

    batches: iterable of flux_apply kwarg dicts (img, img_ids, txt, txt_ids,
    timesteps, y, ... — e.g. the serving query at a few denoise timesteps).
    """
    import numpy as np

    from .flux import flux_apply

    fn = jax.jit(
        lambda p, b: flux_apply(cfg, p, **b, **apply_kw, collect_a8_stats=True)[1]
    )
    agg = None
    for b in batches:
        st = jax.device_get(fn(params, b))
        agg = st if agg is None else jax.tree.map(np.maximum, agg, st)
    if agg is None:
        raise ValueError("calibrate_flux_a8 needs at least one batch")
    return agg


# ----------------------------- int4 (T5 capacity) -----------------------------
#
# Weight-only int4 with group-wise scales, for the frozen T5-XXL encoder:
# bf16 T5 (9.5 GB) cannot co-reside with the int8 12B DiT (12.1 GB) on a
# 16 GB chip, but int4 T5 (2.4 GB) + int8 DiT + VAE + CLIP fits — collapsing
# the disaggregated two-chip serving topology to ONE chip. T5 runs once per
# query, so the unpack cost is irrelevant (the encoder is 69 ms of a ~14 s
# query); only capacity matters. Codes are symmetric [-8, 7] with a fp32
# scale per (128-row input group, output channel); two codes pack per uint8
# along the input dim.

INT4_GROUP = 128


def quantize_weight_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> Params:
    """w (..., in, out) -> {"w_int4": (..., in/2, out) uint8,
    "w_scale": (..., in/group, out) fp32}. `group` shrinks to divide small
    (test-size) input dims."""
    *lead, din, dout = w.shape
    if din % 2:
        raise ValueError(
            f"int4 packing needs an even input dim, got weight shape {w.shape}"
        )
    while din % group or group % 2:
        group //= 2
    assert group >= 2, (w.shape, group)
    wf = w.astype(jnp.float32).reshape(*lead, din // group, group, dout)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, din, dout)
    lo = q[..., 0::2, :].astype(jnp.uint8) & 0xF
    hi = q[..., 1::2, :].astype(jnp.uint8) & 0xF
    return {
        "w_int4": (hi << 4) | lo,
        "w_scale": scale[..., 0, :].reshape(*lead, din // group, dout),
    }


def dequant_weight_int4(entry: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack {"w_int4", "w_scale"} back to (..., in, out) in `dtype`."""
    p8 = entry["w_int4"]
    scale = entry["w_scale"]
    lo = ((p8 & 0xF).astype(jnp.int8) ^ 8) - 8  # sign-extend nibble
    hi = ((p8 >> 4).astype(jnp.int8) ^ 8) - 8
    q = jnp.stack([lo, hi], axis=-2)  # (..., in/2, 2, out)
    *lead, half, _, dout = q.shape
    din = half * 2
    gin = scale.shape[-2]
    wf = q.reshape(*lead, gin, din // gin, dout).astype(jnp.float32)
    wf = wf * scale[..., :, None, :]
    return wf.reshape(*lead, din, dout).astype(dtype)


def quantize_embedding_int8(emb: jnp.ndarray) -> Params:
    """Lookup table (V, d) -> {"w_int8": (V, d) int8, "w_scale": (V, 1)
    fp32}: symmetric per-ROW (per-token) scaling. Embeddings are gathered,
    not matmul'd, so the dequant is one multiply per looked-up row —
    near-lossless (each row keeps its own dynamic range) and halves the
    table's footprint for the single-chip co-resident topology."""
    ef = emb.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(ef), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(ef / scale), -127, 127).astype(jnp.int8)
    return {"w_int8": q, "w_scale": scale}


def embedding_lookup(emb, input_ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gather rows from a plain (V, d) table or a quantize_embedding_int8
    dict; int8 rows are dequantized AFTER the gather (B*L rows, not V)."""
    if isinstance(emb, dict):
        rows = emb["w_int8"][input_ids].astype(dtype)
        return rows * emb["w_scale"][input_ids].astype(dtype)
    return emb[input_ids]


def quantize_clip_int8(params: Params) -> Params:
    """int8 weight-only CLIP-L text encoder: per-output-channel scales on
    every block linear + per-row scales on the token table (~0.23 GiB ->
    ~0.12). CLIP contributes one 77-token pass per query, so like int4 T5
    only capacity matters; models/clip._linear dequantizes per call."""
    out = dict(params)
    out["token_embed"] = quantize_embedding_int8(params["token_embed"])

    def qlin(p):
        w = p["w"].astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"w_int8": q, "w_scale": scale[..., 0, :], "b": p["b"]}

    blocks = dict(params["blocks"])
    blocks["attn"] = {k: qlin(v) for k, v in params["blocks"]["attn"].items()}
    blocks["fc1"] = qlin(params["blocks"]["fc1"])
    blocks["fc2"] = qlin(params["blocks"]["fc2"])
    out["blocks"] = blocks
    return out


def quantize_flux_int4(params: Params, group: int = INT4_GROUP) -> Params:
    """int4-quantize every linear weight of a Flux pytree (mirrors
    quantize_flux_int8; ~6 GB for the 12B model). Capacity mode — DiT
    quality under int4 needs real-weight validation before production."""

    def walk(node):
        if isinstance(node, dict):
            if "w" in node:
                out = {k: v for k, v in node.items() if k != "w"}
                out.update(quantize_weight_int4(node["w"], group))
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantize_t5_int4(
    params: Params, group: int = INT4_GROUP, quantize_embed: bool = False
) -> Params:
    """int4-quantize the T5 block matmul weights (stacked (L, in, out)
    leaves); norms and relative bias keep their dtype. quantize_embed=True
    additionally int8-quantizes the (V, d) token table per row (the
    single-chip co-resident topology squeezes another ~0.12 GiB there).
    models/t5.t5_encode dequantizes per block inside its scan, so peak HBM is
    the int4 tree + one block's bf16 weights (~390 MB for T5-XXL)."""
    out = dict(params)
    if quantize_embed:
        out["embed"] = quantize_embedding_int8(params["embed"])
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn"])
    ffn = dict(blocks["ffn"])
    for k in ("q", "k", "v", "o"):
        attn[k] = quantize_weight_int4(attn[k], group)
    for k in ("wi_0", "wi_1", "wo"):
        ffn[k] = quantize_weight_int4(ffn[k], group)
    blocks["attn"] = attn
    blocks["ffn"] = ffn
    out["blocks"] = blocks
    return out


def _int4_group_for(din: int, group: int = INT4_GROUP) -> int:
    """Mirror quantize_weight_int4's group-shrinking so directly-initialized
    int4 trees carry the exact scale shapes the quantizer would produce."""
    while din % group or group % 2:
        group //= 2
    assert group >= 2, (din, group)
    return group


def _rand_embed_int8(k, vocab: int, d: int, std: float) -> Params:
    return {
        "w_int8": _rand_bits_int8(k, (vocab, d)),
        "w_scale": jnp.full((vocab, 1), std / 127.0, jnp.float32),
    }


def init_t5_int4(key: jax.Array, cfg, quantize_embed: bool = True) -> Params:
    """Random int4-quantized T5 built directly on device: peak HBM equals the
    final ~2.5 GB tree. The init_t5 -> quantize_t5_int4 route transiently
    holds the 9.2 GB bf16 tree PLUS fp32 quantization temps, which cannot
    co-reside with the int8 12B DiT on one 15 GiB chip (the single-chip
    serving topology this seam exists to boot). Structure matches
    quantize_t5_int4(init_t5(cfg, bf16), quantize_embed=...) leaf for leaf;
    synthetic-perf seam only — real deployments quantize converted weights
    host-side (pipeline/loader.py)."""
    d, kd, f, L = cfg.d_model, cfg.num_heads * cfg.d_kv, cfg.d_ff, cfg.num_layers
    ks = jax.random.split(key, 10)

    def qlin(k, din, dout, std):
        return {
            "w_int4": jax.random.bits(k, (L, din // 2, dout), dtype=jnp.uint8),
            "w_scale": jnp.full(
                (L, din // _int4_group_for(din), dout), std / 7.0, jnp.float32
            ),
        }

    s = d ** -0.5
    blocks = {
        "attn": {
            "ln": jnp.ones((L, d), jnp.bfloat16),
            "q": qlin(ks[0], d, kd, s),
            "k": qlin(ks[1], d, kd, s),
            "v": qlin(ks[2], d, kd, s),
            "o": qlin(ks[3], kd, d, kd ** -0.5),
        },
        "ffn": {
            "ln": jnp.ones((L, d), jnp.bfloat16),
            "wi_0": qlin(ks[4], d, f, s),
            "wi_1": qlin(ks[5], d, f, s),
            "wo": qlin(ks[6], f, d, f ** -0.5),
        },
    }
    embed = (
        _rand_embed_int8(ks[7], cfg.vocab_size, d, 1.0)
        if quantize_embed
        else jax.random.normal(ks[7], (cfg.vocab_size, d)).astype(jnp.bfloat16)
    )
    return {
        "embed": embed,
        "relative_attention_bias": (
            jax.random.normal(
                ks[8], (cfg.relative_attention_num_buckets, cfg.num_heads)
            ) * 0.1
        ).astype(jnp.bfloat16),
        "blocks": blocks,
        "final_ln": jnp.ones((d,), jnp.bfloat16),
    }


def init_clip_int8(key: jax.Array, cfg) -> Params:
    """Random int8-quantized CLIP text encoder built directly on device;
    structure matches quantize_clip_int8(init_clip(cfg, bf16)). Same seam as
    init_t5_int4 (tiny next to T5, but every GB counts at 15 GiB usable)."""
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = jax.random.split(key, 8)

    def qlin(k, din, dout):
        return {
            "w_int8": _rand_bits_int8(k, (din, dout), lead=(L,)),
            "w_scale": jnp.full((L, dout), din ** -0.5 / 127.0, jnp.float32),
            "b": jnp.zeros((L, dout), jnp.bfloat16),
        }

    def ln(lead=(L,)):
        return {
            "scale": jnp.ones((*lead, d), jnp.bfloat16),
            "bias": jnp.zeros((*lead, d), jnp.bfloat16),
        }

    blocks = {
        "ln1": ln(),
        "attn": {
            "q": qlin(ks[0], d, d),
            "k": qlin(ks[1], d, d),
            "v": qlin(ks[2], d, d),
            "o": qlin(ks[3], d, d),
        },
        "ln2": ln(),
        "fc1": qlin(ks[4], d, f),
        "fc2": qlin(ks[5], f, d),
    }
    return {
        "token_embed": _rand_embed_int8(ks[6], cfg.vocab_size, d, 0.02),
        "pos_embed": (
            jax.random.normal(ks[7], (cfg.max_length, d)) * 0.01
        ).astype(jnp.bfloat16),
        "blocks": blocks,
        "final_ln": ln(lead=()),
    }
