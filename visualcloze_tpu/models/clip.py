"""CLIP-L text encoder (openai/clip-vit-large-patch14) in functional JAX.

TPU-native replacement for the reference's transformers CLIPTextModel
(models/modules/conditioner.py:5-37). Only the pooled output is consumed by
FLUX (`pooler_output` = final-LN hidden at the EOT token, located by argmax
of the input ids — EOT has the highest vocab id). Like the reference, no
attention mask is passed: the causal mask already prevents pre-EOT positions
from seeing padding.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig

Params = dict[str, Any]


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - mu).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_int8" in p:  # quant.quantize_clip_int8: per-out-channel scales
        w = p["w_int8"].astype(x.dtype) * p["w_scale"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    return jnp.einsum("...i,io->...o", x, w) + p["b"].astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def clip_encode(
    cfg: CLIPTextConfig, params: Params, input_ids: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """input_ids (B, L) -> (last_hidden_state (B, L, D), pooled (B, D))."""
    from .quant import embedding_lookup

    b, L = input_ids.shape
    tok = embedding_lookup(params["token_embed"], input_ids)
    h = tok + params["pos_embed"][:L].astype(tok.dtype)
    heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)

    def attn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
        q = _linear(p["q"], x).reshape(b, L, heads, hd).transpose(0, 2, 1, 3)
        k = _linear(p["k"], x).reshape(b, L, heads, hd).transpose(0, 2, 1, 3)
        v = _linear(p["v"], x).reshape(b, L, heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5) + causal
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, L, cfg.hidden_size)
        return _linear(p["o"], o)

    def body(x, bp):
        x = x + attn(bp["attn"], _layer_norm(bp["ln1"], x, cfg.layer_norm_eps))
        hmid = _linear(bp["fc1"], _layer_norm(bp["ln2"], x, cfg.layer_norm_eps))
        x = x + _linear(bp["fc2"], quick_gelu(hmid))
        return x, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    h = _layer_norm(params["final_ln"], h, cfg.layer_norm_eps)
    # pooled = hidden at EOT (highest token id), HF CLIPTextModel.pooler_output
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = h[jnp.arange(b), eot]
    return h, pooled


def init_clip(key: jax.Array, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    d, f = cfg.hidden_size, cfg.intermediate_size

    def lin(k, din, dout):
        return {
            "w": (jax.random.normal(k, (din, dout)) * (din ** -0.5)).astype(dtype),
            "b": jnp.zeros((dout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def init_block(k):
        bk = jax.random.split(k, 6)
        return {
            "ln1": ln(),
            "attn": {
                "q": lin(bk[0], d, d), "k": lin(bk[1], d, d),
                "v": lin(bk[2], d, d), "o": lin(bk[3], d, d),
            },
            "ln2": ln(),
            "fc1": lin(bk[4], d, f),
            "fc2": lin(bk[5], f, d),
        }

    block_keys = jax.random.split(ks[0], cfg.num_layers)
    return {
        "token_embed": (jax.random.normal(ks[1], (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(ks[2], (cfg.max_length, d)) * 0.01).astype(dtype),
        "blocks": jax.vmap(init_block)(block_keys),
        "final_ln": ln(),
    }
