"""FLUX VAE (AutoencoderKL) in functional JAX, NHWC.

TPU-native counterpart of the reference VAE (models/modules/autoencoder.py:
8-312). NHWC layout + HWIO conv weights (XLA's preferred TPU conv layout);
GroupNorm computed in fp32 (matching torch autocast), convs in the parameter
dtype. The same weights serve BFL-format (`ae.safetensors`) and
diffusers-format checkpoints via models/weights.py converters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import AutoEncoderConfig

Params = dict[str, Any]


# ----------------------------- primitives -----------------------------

def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    """NHWC conv; weights (kh, kw, in, out), bias (out,)."""
    w = p["w"]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(y.dtype)


def group_norm_affine(
    p: Params, x: jnp.ndarray, groups: int | None = None, eps: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GroupNorm collapsed to a per-(batch, channel) affine: y = x*a + b.

    Stats are taken channel-major: reduce (H, W) per channel first (C stays on
    the TPU's 128-lane minor dim), then aggregate channels into groups on the
    tiny (B, C) array. The naive reshape to (B, H, W, G, C/G) puts a 4-wide
    minor dim on the lanes and runs ~25 GB/s on v5e vs ~800 for this layout."""
    b, h, w, c = x.shape
    if groups is None:
        groups = min(32, c)
    cg = c // groups
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(1, 2)).reshape(b, groups, cg).mean(-1)  # (B, G)
    mu_c = jnp.repeat(mu, cg, axis=-1)  # (B, C) group-broadcast
    var_c = jnp.mean(jnp.square(x32 - mu_c[:, None, None, :]), axis=(1, 2))
    var = var_c.reshape(b, groups, cg).mean(-1)
    rsig_c = jnp.repeat(jax.lax.rsqrt(var + eps), cg, axis=-1)  # (B, C)
    a = rsig_c * p["scale"].astype(jnp.float32)[None]
    bb = p["bias"].astype(jnp.float32)[None] - mu_c * a
    return a, bb


def group_norm(p: Params, x: jnp.ndarray, groups: int | None = None, eps: float = 1e-6) -> jnp.ndarray:
    """Affine GroupNorm over channels, fp32 statistics. 32 groups like the
    reference (clamped for tiny test configs whose channels < 32)."""
    a, bb = group_norm_affine(p, x, groups=groups, eps=eps)
    y = x.astype(jnp.float32) * a[:, None, None, :] + bb[:, None, None, :]
    return y.astype(x.dtype)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def _use_fused(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    from ..ops.attention import _on_tpu
    from ..ops.conv2d import fusable

    return _on_tpu() and fusable(x, w)


def _gn_swish_conv(
    norm_p: Params, conv_p: Params, x: jnp.ndarray, residual: jnp.ndarray | None = None
) -> jnp.ndarray:
    """GroupNorm -> SiLU -> conv3x3 (+residual): the resnet half-block.

    On TPU at fusable shapes this is one Pallas kernel (ops/conv2d.py) — the
    norm's normalize/affine and the swish are applied on the conv's VMEM input
    tiles instead of separate HBM round trips, and the conv's 9 taps run as
    MXU matmuls (VAE encoder 118->53 ms, decoder 213->111 ms on v5e at the
    2x384x1152 serving rows vs the unfused XLA path)."""
    if _use_fused(x, conv_p["w"]):
        from ..ops.conv2d import conv3x3_fused

        a, bb = group_norm_affine(norm_p, x)
        return conv3x3_fused(
            x, conv_p["w"], conv_p["b"], pre_affine=(a, bb), residual=residual
        )
    y = conv2d(conv_p, swish(group_norm(norm_p, x)))
    return y if residual is None else y + residual


def resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = _gn_swish_conv(p["norm1"], p["conv1"], x)
    res = conv2d(p["nin_shortcut"], x) if "nin_shortcut" in p else x
    return _gn_swish_conv(p["norm2"], p["conv2"], h, residual=res)


@jax.custom_vjp
def _flash_fwd_only(q, k, v):
    """Forward-only flash path for the frozen VAE bottleneck: block sizes are
    tuned for D=512 (the default fused-bwd blocks would blow the VMEM budget
    at that head width), so the backward is deliberately unsupported and
    fails with a clear message instead of deep inside Pallas."""
    from ..ops.flash_attention import _flash_fwd

    return _flash_fwd(q, k, v, None, block_q=512, block_k=1024)


def _flash_fwd_only_fwd(q, k, v):
    return _flash_fwd_only(q, k, v), None


def _flash_fwd_only_bwd(res, g):
    raise NotImplementedError(
        "autoencoder.attn_block's long-sequence flash path is forward-only "
        "(the VAE is frozen in every training mode, SURVEY §2.7); route a "
        "trainable VAE through ops.flash_attention.flash_mha instead."
    )


_flash_fwd_only.defvjp(_flash_fwd_only_fwd, _flash_fwd_only_bwd)


def attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head spatial self-attention at the bottleneck
    (ref autoencoder.py:25-52).

    On TPU at serving row shapes L = (H/8)(W/8) reaches ~7k, so the einsum
    path materializes an L^2 fp32 logits matrix (~190 MB) through HBM; route
    long sequences through the Pallas flash kernel (single head, D = C = 512,
    block_k shrunk so the fp32 s-tile + D-wide operands fit VMEM). Short
    (test-size) sequences and CPU keep the einsum oracle. Forward-only: the
    VAE is frozen in every training mode (SURVEY §2.7)."""
    b, h, w, c = x.shape
    hn = group_norm(p["norm"], x)
    q = conv2d(p["q"], hn).reshape(b, h * w, c)
    k = conv2d(p["k"], hn).reshape(b, h * w, c)
    v = conv2d(p["v"], hn).reshape(b, h * w, c)
    from ..ops.attention import _on_tpu

    use_flash = h * w >= 2048 and _on_tpu()
    if use_flash:
        o = _flash_fwd_only(q[:, None], k[:, None], v[:, None])[:, 0]
    else:
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1)
        o = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v)
    o = o.reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], o)


def downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv with the reference's asymmetric (0,1) pad
    (ref autoencoder.py:86-96)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


def upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x + conv (ref autoencoder.py:99-107)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    if _use_fused(x, p["conv"]["w"]):
        from ..ops.conv2d import conv3x3_fused

        return conv3x3_fused(x, p["conv"]["w"], p["conv"]["b"], act="none")
    return conv2d(p["conv"], x)


# ----------------------------- encoder / decoder -----------------------------

def encoder_apply(cfg: AutoEncoderConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) pixels in [-1, 1] -> (B, H/8, W/8, 2*z) moments."""
    h = conv2d(p["conv_in"], x)
    for i_level in range(len(cfg.ch_mult)):
        level = p["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(level["block"][i_block], h)
        if i_level != len(cfg.ch_mult) - 1:
            h = downsample(level["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = swish(group_norm(p["norm_out"], h))
    return conv2d(p["conv_out"], h)


def decoder_apply(cfg: AutoEncoderConfig, p: Params, z: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, z) latent -> (B, 8h, 8w, 3) pixels."""
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i_level in reversed(range(len(cfg.ch_mult))):
        level = p["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(level["block"][i_block], h)
        if i_level != 0:
            h = upsample(level["upsample"], h)
    h = swish(group_norm(p["norm_out"], h))
    return conv2d(p["conv_out"], h)


def diagonal_gaussian(
    z: jnp.ndarray, key: jax.Array | None = None, sample: bool = True
) -> jnp.ndarray:
    """Split moments into (mean, logvar) and sample (ref autoencoder.py:262-274)."""
    mean, logvar = jnp.split(z, 2, axis=-1)
    if not sample:
        return mean
    assert key is not None, "sampling needs a PRNG key"
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(key, mean.shape, dtype=jnp.float32)
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)


# ----------------------------- init -----------------------------

def _init_conv(key, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * (fan_in ** -0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _init_gn(c, dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_gn(c, dtype),
        "q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


def init_encoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, cfg.in_channels, ch, dtype), "down": []}
    block_in = ch
    for i_level in range(len(cfg.ch_mult)):
        block_in = ch * in_ch_mult[i_level]
        block_out = ch * cfg.ch_mult[i_level]
        level: Params = {"block": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(_init_resnet(next(ks), block_in, block_out, dtype))
            block_in = block_out
        if i_level != len(cfg.ch_mult) - 1:
            level["downsample"] = {"conv": _init_conv(next(ks), 3, 3, block_in, block_in, dtype)}
        p["down"].append(level)
    p["mid"] = {
        "block_1": _init_resnet(next(ks), block_in, block_in, dtype),
        "attn_1": _init_attn(next(ks), block_in, dtype),
        "block_2": _init_resnet(next(ks), block_in, block_in, dtype),
    }
    p["norm_out"] = _init_gn(block_in, dtype)
    p["conv_out"] = _init_conv(next(ks), 3, 3, block_in, 2 * cfg.z_channels, dtype)
    return p


def init_decoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    ch = cfg.ch
    block_in = ch * cfg.ch_mult[-1]
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, cfg.z_channels, block_in, dtype)}
    p["mid"] = {
        "block_1": _init_resnet(next(ks), block_in, block_in, dtype),
        "attn_1": _init_attn(next(ks), block_in, dtype),
        "block_2": _init_resnet(next(ks), block_in, block_in, dtype),
    }
    up = [None] * len(cfg.ch_mult)
    for i_level in reversed(range(len(cfg.ch_mult))):
        block_out = ch * cfg.ch_mult[i_level]
        level: Params = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(_init_resnet(next(ks), block_in, block_out, dtype))
            block_in = block_out
        if i_level != 0:
            level["upsample"] = {"conv": _init_conv(next(ks), 3, 3, block_in, block_in, dtype)}
        up[i_level] = level
    p["up"] = up
    p["norm_out"] = _init_gn(block_in, dtype)
    p["conv_out"] = _init_conv(next(ks), 3, 3, block_in, cfg.out_ch, dtype)
    return p


def init_autoencoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg, dtype), "decoder": init_decoder(k2, cfg, dtype)}


# ----------------------------- facade -----------------------------

class AutoEncoder:
    """Stateless facade bundling config + params (ref autoencoder.py:277-312).

    encode/decode handle the (z - shift) * scale latent normalization used by
    the pipeline (visualcloze.py:378, 433); encode_moments/decode_raw are the
    unscaled primitives.
    """

    def __init__(self, cfg: AutoEncoderConfig, params: Params):
        self.cfg = cfg
        self.params = params
        self._encode_jit = None
        self._decode_jit = None

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return encoder_apply(self.cfg, self.params["encoder"], x)

    def encode(
        self, x: jnp.ndarray, key: jax.Array | None = None, sample: bool = True
    ) -> jnp.ndarray:
        z = diagonal_gaussian(self.encode_moments(x), key=key, sample=sample)
        return (z - self.cfg.shift_factor) * self.cfg.scale_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self.cfg.scale_factor + self.cfg.shift_factor
        return decoder_apply(self.cfg, self.params["decoder"], z)

    # jit-cached variants (per input shape); params passed as an argument so
    # donated/updated trees don't retrace
    def encode_jit(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, x, k: AutoEncoder(self.cfg, p).encode(x, key=k)
            )
        return self._encode_jit(self.params, x, key)

    def decode_jit(self, z: jnp.ndarray) -> jnp.ndarray:
        if self._decode_jit is None:
            self._decode_jit = jax.jit(lambda p, z: AutoEncoder(self.cfg, p).decode(z))
        return self._decode_jit(self.params, z)
