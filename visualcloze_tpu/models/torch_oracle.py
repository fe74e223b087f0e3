"""Independent torch re-statement of the Flux forward, used as a numerics
oracle.

This is a from-scratch re-statement of the reference numerics
(models/model.py:85-124, models/modules/layers.py, models/math.py) operating
directly on a BFL-format state dict — NOT the production path (that is
models/flux.py in JAX). Two consumers:

- tests/test_flux_oracle.py: tiny-config activation parity of
  convert_flux -> flux_apply against this oracle;
- scripts/validate_weights.py: per-block activation diff of a REAL converted
  checkpoint (the conversion-fidelity gate of the real-weight validation
  harness) — silent converter transposition errors dominate output error
  (SURVEY.md §7 hard parts), and this oracle localizes them to a block.

torch (CPU build) is only imported when this module is; the production
pipeline never touches it.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def t_timestep_embedding(t: torch.Tensor, dim: int, max_period=10_000, time_factor=1000.0):
    t = time_factor * t
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_rope(pos: torch.Tensor, dim: int, theta: int) -> torch.Tensor:
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / theta**scale
    out = torch.einsum("...n,d->...nd", pos.double(), omega)
    out = torch.stack([out.cos(), -out.sin(), out.sin(), out.cos()], dim=-1)
    return out.reshape(*out.shape[:-1], 2, 2).float()


def t_embed_nd(ids: torch.Tensor, axes_dim, theta) -> torch.Tensor:
    emb = torch.cat(
        [t_rope(ids[..., i], axes_dim[i], theta) for i in range(ids.shape[-1])], dim=-3
    )
    return emb.unsqueeze(1)  # (B, 1, L, D/2, 2, 2)


def t_apply_rope(xq, xk, freqs_cis):
    xq_ = xq.float().reshape(*xq.shape[:-1], -1, 1, 2)
    xk_ = xk.float().reshape(*xk.shape[:-1], -1, 1, 2)
    xq_out = freqs_cis[..., 0] * xq_[..., 0] + freqs_cis[..., 1] * xq_[..., 1]
    xk_out = freqs_cis[..., 0] * xk_[..., 0] + freqs_cis[..., 1] * xk_[..., 1]
    return xq_out.reshape(*xq.shape).type_as(xq), xk_out.reshape(*xk.shape).type_as(xk)


def t_attention(q, k, v, pe, mask=None):
    q, k = t_apply_rope(q, k, pe)
    attn_mask = None
    if mask is not None:
        attn_mask = mask[:, None, None, :].bool()  # key-padding mask
    x = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
    return x.transpose(1, 2).reshape(x.shape[0], x.shape[2], -1)


def t_rms_norm(x, scale):
    x32 = x.float()
    rrms = torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + 1e-6)
    return (x32 * rrms).to(x.dtype) * scale


def t_lin(state, key, x):
    return F.linear(x, state[f"{key}.weight"], state.get(f"{key}.bias"))


def t_mlp_embedder(state, key, x):
    return t_lin(state, f"{key}.out_layer", F.silu(t_lin(state, f"{key}.in_layer", x)))


def t_modulation(state, key, vec, n_chunks):
    out = t_lin(state, f"{key}.lin", F.silu(vec))[:, None, :]
    return out.chunk(n_chunks, dim=-1)  # [(shift, scale, gate)] * (n/3)


def _qkv_heads(qkv, num_heads):
    b, l, _ = qkv.shape
    q, k, v = qkv.reshape(b, l, 3, num_heads, -1).permute(2, 0, 3, 1, 4)
    return q, k, v


def t_double_block(state, i, img, txt, vec, pe, mask, cfg):
    p = f"double_blocks.{i}"
    im_shift1, im_scale1, im_gate1, im_shift2, im_scale2, im_gate2 = t_modulation(
        state, f"{p}.img_mod", vec, 6
    )
    tx_shift1, tx_scale1, tx_gate1, tx_shift2, tx_scale2, tx_gate2 = t_modulation(
        state, f"{p}.txt_mod", vec, 6
    )

    img_mod = (1 + im_scale1) * F.layer_norm(img, (cfg.hidden_size,), eps=1e-6) + im_shift1
    img_q, img_k, img_v = _qkv_heads(t_lin(state, f"{p}.img_attn.qkv", img_mod), cfg.num_heads)
    img_q = t_rms_norm(img_q, state[f"{p}.img_attn.norm.query_norm.scale"]).to(img_v)
    img_k = t_rms_norm(img_k, state[f"{p}.img_attn.norm.key_norm.scale"]).to(img_v)

    txt_mod = (1 + tx_scale1) * F.layer_norm(txt, (cfg.hidden_size,), eps=1e-6) + tx_shift1
    txt_q, txt_k, txt_v = _qkv_heads(t_lin(state, f"{p}.txt_attn.qkv", txt_mod), cfg.num_heads)
    txt_q = t_rms_norm(txt_q, state[f"{p}.txt_attn.norm.query_norm.scale"]).to(txt_v)
    txt_k = t_rms_norm(txt_k, state[f"{p}.txt_attn.norm.key_norm.scale"]).to(txt_v)

    q = torch.cat([txt_q, img_q], dim=2)
    k = torch.cat([txt_k, img_k], dim=2)
    v = torch.cat([txt_v, img_v], dim=2)
    attn = t_attention(q, k, v, pe, mask)
    txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1] :]

    img = img + im_gate1 * t_lin(state, f"{p}.img_attn.proj", img_attn)
    img_mlp_in = (1 + im_scale2) * F.layer_norm(img, (cfg.hidden_size,), eps=1e-6) + im_shift2
    img = img + im_gate2 * t_lin(
        state, f"{p}.img_mlp.2", F.gelu(t_lin(state, f"{p}.img_mlp.0", img_mlp_in), approximate="tanh")
    )
    txt = txt + tx_gate1 * t_lin(state, f"{p}.txt_attn.proj", txt_attn)
    txt_mlp_in = (1 + tx_scale2) * F.layer_norm(txt, (cfg.hidden_size,), eps=1e-6) + tx_shift2
    txt = txt + tx_gate2 * t_lin(
        state, f"{p}.txt_mlp.2", F.gelu(t_lin(state, f"{p}.txt_mlp.0", txt_mlp_in), approximate="tanh")
    )
    return img, txt


def t_single_block(state, i, x, vec, pe, mask, cfg):
    p = f"single_blocks.{i}"
    shift, scale, gate = t_modulation(state, f"{p}.modulation", vec, 3)
    x_mod = (1 + scale) * F.layer_norm(x, (cfg.hidden_size,), eps=1e-6) + shift
    h = cfg.hidden_size
    lin1 = t_lin(state, f"{p}.linear1", x_mod)
    qkv, mlp = torch.split(lin1, [3 * h, cfg.mlp_hidden_dim], dim=-1)
    q, k, v = _qkv_heads(qkv, cfg.num_heads)
    q = t_rms_norm(q, state[f"{p}.norm.query_norm.scale"]).to(v)
    k = t_rms_norm(k, state[f"{p}.norm.key_norm.scale"]).to(v)
    attn = t_attention(q, k, v, pe, mask)
    out = t_lin(state, f"{p}.linear2", torch.cat([attn, F.gelu(mlp, approximate="tanh")], dim=2))
    return x + gate * out


def t_flux_forward(state, cfg, img, img_ids, txt, txt_ids, timesteps, y,
                   guidance=None, txt_mask=None, img_mask=None, capture=None):
    """Full forward. When `capture` is a dict, per-block residual-stream
    activations are stored into it under the same keys flux_apply's
    capture_activations emits (embed_img/embed_txt/vec, double_img_{i},
    double_txt_{i}, single_{i}, out) so the two sides diff directly."""
    img = t_lin(state, "img_in", img)
    vec = t_mlp_embedder(state, "time_in", t_timestep_embedding(timesteps, 256))
    if cfg.guidance_embed:
        vec = vec + t_mlp_embedder(state, "guidance_in", t_timestep_embedding(guidance, 256))
    vec = vec + t_mlp_embedder(state, "vector_in", y)
    txt = t_lin(state, "txt_in", txt)

    ids = torch.cat([txt_ids, img_ids], dim=1)
    pe = t_embed_nd(ids, cfg.axes_dim, cfg.theta)

    mask = None
    if txt_mask is not None or img_mask is not None:
        b = img.shape[0]
        tm = txt_mask if txt_mask is not None else torch.ones(b, txt.shape[1])
        im = img_mask if img_mask is not None else torch.ones(b, img.shape[1])
        mask = torch.cat([tm, im], dim=1)

    if capture is not None:
        capture["embed_img"] = img.numpy()
        capture["embed_txt"] = txt.numpy()
        capture["vec"] = vec.numpy()
    for i in range(cfg.depth):
        img, txt = t_double_block(state, i, img, txt, vec, pe, mask, cfg)
        if capture is not None:
            capture[f"double_img_{i}"] = img.numpy()
            capture[f"double_txt_{i}"] = txt.numpy()
    x = torch.cat([txt, img], dim=1)
    for i in range(cfg.depth_single_blocks):
        x = t_single_block(state, i, x, vec, pe, mask, cfg)
        if capture is not None:
            capture[f"single_{i}"] = x.numpy()
    img = x[:, txt.shape[1] :]

    shift, scale = t_lin(state, "final_layer.adaLN_modulation.1", F.silu(vec)).chunk(2, dim=1)
    img = (1 + scale[:, None]) * F.layer_norm(img, (cfg.hidden_size,), eps=1e-6) + shift[:, None]
    out = t_lin(state, "final_layer.linear", img)
    if capture is not None:
        capture["out"] = out.numpy()
    return out


# ----------------------- random reference-named state dict -----------------------

def make_state(cfg, seed=0) -> dict[str, torch.Tensor]:
    """Random BFL-format state dict for a config — the converter's input
    format, used to exercise convert_flux without real checkpoints."""
    g = torch.Generator().manual_seed(seed)
    state: dict[str, torch.Tensor] = {}

    def lin(key, fan_in, fan_out, bias=True):
        state[f"{key}.weight"] = torch.randn(fan_out, fan_in, generator=g) / math.sqrt(fan_in)
        if bias:
            state[f"{key}.bias"] = torch.randn(fan_out, generator=g) * 0.02

    h, d = cfg.hidden_size, cfg.head_dim
    lin("img_in", cfg.in_channels, h)
    lin("txt_in", cfg.context_in_dim, h)
    for k in ("time_in", "vector_in", "guidance_in"):
        fan = 256 if k != "vector_in" else cfg.vec_in_dim
        lin(f"{k}.in_layer", fan, h)
        lin(f"{k}.out_layer", h, h)
    lin("final_layer.linear", h, cfg.out_channels)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    for i in range(cfg.depth):
        p = f"double_blocks.{i}"
        lin(f"{p}.img_mod.lin", h, 6 * h)
        lin(f"{p}.txt_mod.lin", h, 6 * h)
        for s in ("img_attn", "txt_attn"):
            lin(f"{p}.{s}.qkv", h, 3 * h, bias=cfg.qkv_bias)
            lin(f"{p}.{s}.proj", h, h)
            state[f"{p}.{s}.norm.query_norm.scale"] = 1 + 0.1 * torch.randn(d, generator=g)
            state[f"{p}.{s}.norm.key_norm.scale"] = 1 + 0.1 * torch.randn(d, generator=g)
        for s in ("img_mlp", "txt_mlp"):
            lin(f"{p}.{s}.0", h, cfg.mlp_hidden_dim)
            lin(f"{p}.{s}.2", cfg.mlp_hidden_dim, h)
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}"
        lin(f"{p}.linear1", h, 3 * h + cfg.mlp_hidden_dim)
        lin(f"{p}.linear2", h + cfg.mlp_hidden_dim, h)
        lin(f"{p}.modulation.lin", h, 3 * h)
        state[f"{p}.norm.query_norm.scale"] = 1 + 0.1 * torch.randn(d, generator=g)
        state[f"{p}.norm.key_norm.scale"] = 1 + 0.1 * torch.randn(d, generator=g)
    return state


def make_inputs(cfg, b=2, l_img=48, l_txt=16, seed=1):
    """Fixed random token-space inputs shared by both forward sides."""
    import numpy as np

    rng = np.random.default_rng(seed)
    img_ids = np.zeros((b, l_img, 3), np.float32)
    img_ids[..., 0] = 1
    img_ids[..., 1] = (np.arange(l_img) // 8)[None]
    img_ids[..., 2] = (np.arange(l_img) % 8)[None]
    return {
        "img": rng.standard_normal((b, l_img, cfg.in_channels)).astype(np.float32),
        "img_ids": img_ids,
        "txt": rng.standard_normal((b, l_txt, cfg.context_in_dim)).astype(np.float32),
        "txt_ids": np.zeros((b, l_txt, 3), np.float32),
        "timesteps": np.full((b,), 0.4, np.float32),
        "y": rng.standard_normal((b, cfg.vec_in_dim)).astype(np.float32),
        "guidance": np.full((b,), 4.0, np.float32),
    }
