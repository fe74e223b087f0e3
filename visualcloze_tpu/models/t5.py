"""T5 v1.1 encoder (google/t5-v1_1-xxl) in functional JAX.

TPU-native replacement for the reference's transformers T5EncoderModel
(models/modules/conditioner.py:5-37 HFEmbedder). The reference tokenizes to a
fixed max_length (512) and does NOT pass an attention mask — padded positions
participate in attention. We reproduce that default (mask=None) for parity and
accept an optional mask.

Architecture notes (HF T5 v1.1):
  - RMSNorm (fp32 stats), no biases anywhere,
  - relative position bias from block 0's bucket embedding, shared by all
    layers; q is NOT scaled by 1/sqrt(d_kv),
  - gated-GELU FFN (wi_0 * gelu gate convention: gelu(wi_0(x)) * wi_1(x)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Config

Params = dict[str, Any]


def t5_rms_norm(weight: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return x32.astype(x.dtype) * weight.astype(x.dtype)


def relative_position_bucket(
    relative_position: np.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """HF T5 bidirectional bucket function (host-side; positions are static)."""
    ret = np.zeros_like(relative_position)
    num_buckets //= 2
    ret += (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


def position_bias_table(cfg: T5Config, seq_len: int) -> np.ndarray:
    """(L, L) int bucket indices for the relative attention bias."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    return relative_position_bucket(
        mem - ctx,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )


def _w(entry, dtype) -> jnp.ndarray:
    """Weight access: raw array or an int4 dict (models/quant.py) — the
    dequant happens per block inside t5_encode's scan, so a quantized
    T5-XXL peaks at the 2.4 GB int4 tree + one block's bf16 (~390 MB)."""
    if isinstance(entry, dict):
        from .quant import dequant_weight_int4

        return dequant_weight_int4(entry, dtype)
    return entry.astype(dtype)


def t5_encode(
    cfg: T5Config,
    params: Params,
    input_ids: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """input_ids (B, L) -> last_hidden_state (B, L, d_model)."""
    from .quant import embedding_lookup

    b, L = input_ids.shape
    x = embedding_lookup(params["embed"], input_ids)

    buckets = jnp.asarray(position_bias_table(cfg, L))
    # (L, L) buckets -> (1, H, L, L) bias from block 0's embedding table
    rel_emb = params["relative_attention_bias"]  # (num_buckets, H)
    pos_bias = rel_emb[buckets].astype(jnp.float32)  # (L, L, H)
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # (1, H, L, L)
    if mask is not None:
        pos_bias = pos_bias + jnp.where(mask > 0, 0.0, -1e9)[:, None, None, :]

    def attn(p: Params, h: jnp.ndarray) -> jnp.ndarray:
        hn = t5_rms_norm(p["ln"], h)
        q = jnp.einsum("bld,dk->blk", hn, _w(p["q"], hn.dtype))
        k = jnp.einsum("bld,dk->blk", hn, _w(p["k"], hn.dtype))
        v = jnp.einsum("bld,dk->blk", hn, _w(p["v"], hn.dtype))
        q = q.reshape(b, L, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(b, L, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + pos_bias, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, L, cfg.num_heads * cfg.d_kv)
        return h + jnp.einsum("blk,kd->bld", o, _w(p["o"], o.dtype))

    def ffn(p: Params, h: jnp.ndarray) -> jnp.ndarray:
        hn = t5_rms_norm(p["ln"], h)
        gate = jax.nn.gelu(
            jnp.einsum("bld,df->blf", hn, _w(p["wi_0"], hn.dtype)), approximate=True
        )
        up = jnp.einsum("bld,df->blf", hn, _w(p["wi_1"], hn.dtype))
        return h + jnp.einsum("blf,fd->bld", gate * up, _w(p["wo"], h.dtype))

    def body(h, bp):
        h = attn(bp["attn"], h)
        h = ffn(bp["ffn"], h)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_rms_norm(params["final_ln"], x)


def init_t5(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    d, kd, f = cfg.d_model, cfg.num_heads * cfg.d_kv, cfg.d_ff

    def init_block(k):
        bk = jax.random.split(k, 7)
        s = d ** -0.5
        return {
            "attn": {
                "ln": jnp.ones((d,), dtype),
                "q": (jax.random.normal(bk[0], (d, kd)) * s).astype(dtype),
                "k": (jax.random.normal(bk[1], (d, kd)) * s).astype(dtype),
                "v": (jax.random.normal(bk[2], (d, kd)) * s).astype(dtype),
                "o": (jax.random.normal(bk[3], (kd, d)) * (kd ** -0.5)).astype(dtype),
            },
            "ffn": {
                "ln": jnp.ones((d,), dtype),
                "wi_0": (jax.random.normal(bk[4], (d, f)) * s).astype(dtype),
                "wi_1": (jax.random.normal(bk[5], (d, f)) * s).astype(dtype),
                "wo": (jax.random.normal(bk[6], (f, d)) * (f ** -0.5)).astype(dtype),
            },
        }

    block_keys = jax.random.split(ks[0], cfg.num_layers)
    return {
        "embed": (jax.random.normal(ks[1], (cfg.vocab_size, d)) * 1.0).astype(dtype),
        "relative_attention_bias": (
            jax.random.normal(ks[2], (cfg.relative_attention_num_buckets, cfg.num_heads)) * 0.1
        ).astype(dtype),
        "blocks": jax.vmap(init_block)(block_keys),
        "final_ln": jnp.ones((d,), dtype),
    }
