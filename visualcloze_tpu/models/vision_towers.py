"""Native JAX vision towers for the auxiliary image embedders.

TPU-native implementations of the two networks the reference pulls from
transformers (models/modules/image_embedders.py):
  - SigLIP vision tower (google/siglip-so400m-patch14-384) — feeds the Redux
    style projector (ref :66-103),
  - DepthAnything (DINOv2 ViT-L/14 backbone + DPT neck/head,
    LiheYoung/depth-anything-large-hf) — the depth conditioning encoder
    (ref :15-35).

Both are functional pytree models with HF state-dict converters and are
oracle-tested against transformers-constructed tiny models
(tests/test_vision_towers.py). NHWC layouts, XLA convs, fp32 numerics.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ----------------------------- shared pieces -----------------------------

def _lin(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _sdpa(q, k, v, num_heads):
    """(B, L, D) -> (B, L, D): head split/merge around the shared fp32-softmax
    attention core (ops/attention.mha_xla — one implementation to keep
    numerically consistent)."""
    from ..ops.attention import mha_xla

    b, L, D = q.shape
    hd = D // num_heads

    def split(x):
        return x.reshape(b, L, num_heads, hd).transpose(0, 2, 1, 3)

    out = mha_xla(split(q), split(k), split(v), None)
    return out.transpose(0, 2, 1, 3).reshape(b, L, D)


def _stack_blocks(blocks: list[Params]) -> Params:
    """List of per-layer pytrees -> one pytree of (L, ...) stacked leaves,
    ready for `lax.scan` (one compiled block body instead of num_layers
    unrolled copies — compile time and code size drop with depth)."""
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def patch_embed(
    p: Params, x: jnp.ndarray, patch: int
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B, H, W, 3) -> ((B, h*w, C), (h, w)) via non-overlapping patch conv."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    b, h, w, c = out.shape
    return out.reshape(b, h * w, c), (h, w)


def interpolate_bilinear(x: jnp.ndarray, size: tuple[int, int], align_corners: bool) -> jnp.ndarray:
    """(B, H, W, C) -> (B, out_h, out_w, C), matching torch F.interpolate
    semantics for both align_corners conventions."""
    b, h, w, c = x.shape
    oh, ow = size
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
    else:
        ys = jnp.clip((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0, h - 1)
        xs = jnp.clip((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0, w - 1)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([yy.ravel(), xx.ravel()])

    def one_channel(img2d):
        return jax.scipy.ndimage.map_coordinates(img2d, coords, order=1, mode="nearest")

    flat = jax.vmap(jax.vmap(one_channel))(x.transpose(0, 3, 1, 2))  # (B, C, oh*ow)
    return flat.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)


# ----------------------------- SigLIP vision -----------------------------

@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    """google/siglip-so400m-patch14-384 (the Redux feature tower)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

    def tiny(self) -> "SigLIPVisionConfig":
        return dataclasses.replace(
            self, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, image_size=28,
        )


def siglip_encode(cfg: SigLIPVisionConfig, params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) normalized pixels -> last_hidden_state (B, L, D)."""
    x, _ = patch_embed(params["patch_embed"], pixels, cfg.patch_size)
    x = x + params["pos_embed"][: x.shape[1]]

    def body(x, blk):
        h = _ln(blk["ln1"], x, cfg.layer_norm_eps)
        attn = _sdpa(_lin(blk["q"], h), _lin(blk["k"], h), _lin(blk["v"], h), cfg.num_heads)
        x = x + _lin(blk["o"], attn)
        h = _ln(blk["ln2"], x, cfg.layer_norm_eps)
        h = _lin(blk["fc2"], jax.nn.gelu(_lin(blk["fc1"], h), approximate=True))
        return x + h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _ln(params["post_ln"], x, cfg.layer_norm_eps)


def convert_siglip_vision(state: dict[str, np.ndarray], cfg: SigLIPVisionConfig) -> Params:
    """HF SiglipVisionModel state dict -> pytree."""
    pre = "vision_model."

    def w(key):
        return np.asarray(state[pre + key])

    def lin(key):
        return {"w": w(f"{key}.weight").T, "b": w(f"{key}.bias")}

    def ln(key):
        return {"scale": w(f"{key}.weight"), "bias": w(f"{key}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        blocks.append(
            {
                "ln1": ln(f"{p}.layer_norm1"),
                "q": lin(f"{p}.self_attn.q_proj"),
                "k": lin(f"{p}.self_attn.k_proj"),
                "v": lin(f"{p}.self_attn.v_proj"),
                "o": lin(f"{p}.self_attn.out_proj"),
                "ln2": ln(f"{p}.layer_norm2"),
                "fc1": lin(f"{p}.mlp.fc1"),
                "fc2": lin(f"{p}.mlp.fc2"),
            }
        )
    blocks = _stack_blocks(blocks)
    return {
        "patch_embed": {
            "w": w("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
            "b": w("embeddings.patch_embedding.bias"),
        },
        "pos_embed": w("embeddings.position_embedding.weight"),
        "blocks": blocks,
        "post_ln": ln("post_layernorm"),
    }


SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def siglip_preprocess(img, image_size: int = 384) -> jnp.ndarray:
    """PIL image -> (1, S, S, 3) normalized pixels (SiglipImageProcessor:
    resize to square, rescale 1/255, normalize mean=std=0.5)."""
    from PIL import Image

    img = img.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    x = np.asarray(img).astype(np.float32) / 255.0
    return jnp.asarray((x - SIGLIP_MEAN) / SIGLIP_STD)[None]


# ----------------------------- DINOv2 backbone -----------------------------

@dataclasses.dataclass(frozen=True)
class DepthAnythingTowerConfig:
    """LiheYoung/depth-anything-large-hf: DINOv2 ViT-L/14 + DPT neck/head."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    out_indices: tuple[int, ...] = (5, 12, 18, 24)  # 1-based encoder stages
    neck_hidden_sizes: tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    image_size: int = 518  # processor target (multiple of 14)

    def tiny(self) -> "DepthAnythingTowerConfig":
        return dataclasses.replace(
            self, hidden_size=32, intermediate_size=64, num_layers=4,
            num_heads=4, out_indices=(1, 2, 3, 4),
            neck_hidden_sizes=(8, 12, 16, 16), fusion_hidden_size=16,
            head_hidden_size=8, image_size=56,
        )


def _dinov2_backbone(cfg: DepthAnythingTowerConfig, p: Params, pixels: jnp.ndarray):
    """Returns ([stage features (B, 1+L, D)], (patch_h, patch_w))."""
    x, (ph, pw) = patch_embed(p["patch_embed"], pixels, cfg.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    pos = p["pos_embed"]  # (1, 1+L0, D) at the pretraining grid
    n_patches = ph * pw
    if pos.shape[1] - 1 != n_patches:  # bicubic pos-embed interpolation
        g0 = int(round(float(np.sqrt(pos.shape[1] - 1))))
        grid = pos[0, 1:].reshape(g0, g0, cfg.hidden_size)[None]
        grid = jax.image.resize(grid, (1, ph, pw, cfg.hidden_size), method="bicubic")
        pos = jnp.concatenate([pos[:, :1], grid.reshape(1, n_patches, cfg.hidden_size)], axis=1)
    x = x + pos

    # Scan over stacked blocks; the carry holds an (n_out, B, 1+L, D) buffer
    # that layer i+1 adds itself into when it is one of out_indices — keeps
    # only the needed stages resident instead of all num_layers scan outputs.
    out_idx = jnp.asarray(cfg.out_indices)  # 1-based, static per config

    def body(carry, inp):
        x, feats = carry
        blk, i = inp
        h = _ln(blk["ln1"], x, cfg.layer_norm_eps)
        attn = _sdpa(_lin(blk["q"], h), _lin(blk["k"], h), _lin(blk["v"], h), cfg.num_heads)
        x = x + _lin(blk["o"], attn) * blk["ls1"]
        h = _ln(blk["ln2"], x, cfg.layer_norm_eps)
        h = _lin(blk["fc2"], jax.nn.gelu(_lin(blk["fc1"], h), approximate=False))
        x = x + h * blk["ls2"]
        hit = (out_idx == i + 1).astype(x.dtype)
        feats = feats + hit[:, None, None, None] * x[None]
        return (x, feats), None

    feats0 = jnp.zeros((len(cfg.out_indices),) + x.shape, x.dtype)
    (_, feats), _ = jax.lax.scan(
        body, (x, feats0), (p["blocks"], jnp.arange(cfg.num_layers))
    )
    # Dinov2Backbone applies its final layernorm to every out feature
    feats = _ln(p["final_ln"], feats, cfg.layer_norm_eps)
    return [feats[i] for i in range(feats.shape[0])], (ph, pw)


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"]
    return out


def _conv_transpose(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out = jax.lax.conv_transpose(
        x, p["w"], strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def _pre_act_residual(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = _conv(p["conv1"], jax.nn.relu(x))
    h = _conv(p["conv2"], jax.nn.relu(h))
    return h + x


def depth_anything_apply(cfg: DepthAnythingTowerConfig, params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) normalized pixels -> relative depth (B, H, W).

    Mirrors HF DepthAnythingForDepthEstimation: DINOv2 stages -> DPT
    reassemble (project + resize 4x/2x/1x/0.5x) -> 3x3 convs -> top-down
    fusion (pre-act residual units, align_corners=True upsampling) -> head.
    """
    feats, (ph, pw) = _dinov2_backbone(cfg, params["backbone"], pixels)

    # reassemble: drop CLS, to (B, h, w, C), project + resize
    stages = []
    for i, f in enumerate(feats):
        b = f.shape[0]
        x = f[:, 1:].reshape(b, ph, pw, cfg.hidden_size)
        x = _conv(params["reassemble"][i]["projection"], x)
        factor = cfg.reassemble_factors[i]
        if factor > 1:
            x = _conv_transpose(params["reassemble"][i]["resize"], x, int(factor))
        elif factor < 1:
            # torch Conv2d(k=3, stride=2, padding=1) pads (1,1); XLA "SAME"
            # at stride 2 on even inputs would pad (0,1) and misalign
            x = _conv(
                params["reassemble"][i]["resize"], x,
                stride=int(round(1 / factor)), padding=((1, 1), (1, 1)),
            )
        stages.append(_conv(params["neck_convs"][i], x))

    # top-down fusion, deepest first
    stages = stages[::-1]
    fused = None
    for idx, (feat, fp) in enumerate(zip(stages, params["fusion"])):
        size = stages[idx + 1].shape[1:3] if idx != len(stages) - 1 else None
        if fused is None:
            h = feat
        else:
            res = feat
            if fused.shape != res.shape:
                res = interpolate_bilinear(res, fused.shape[1:3], align_corners=False)
            h = fused + _pre_act_residual(fp["residual1"], res)
        h = _pre_act_residual(fp["residual2"], h)
        out_size = size if size is not None else (h.shape[1] * 2, h.shape[2] * 2)
        h = interpolate_bilinear(h, out_size, align_corners=True)
        fused = _conv(fp["projection"], h)

    # head
    x = _conv(params["head"]["conv1"], fused)
    x = interpolate_bilinear(x, (ph * cfg.patch_size, pw * cfg.patch_size), align_corners=True)
    x = jax.nn.relu(_conv(params["head"]["conv2"], x))
    x = jax.nn.relu(_conv(params["head"]["conv3"], x))
    return x[..., 0]


def convert_depth_anything(state: dict[str, np.ndarray], cfg: DepthAnythingTowerConfig) -> Params:
    """HF DepthAnythingForDepthEstimation state dict -> pytree."""

    def w(key):
        return np.asarray(state[key])

    def lin(key):
        return {"w": w(f"{key}.weight").T, "b": w(f"{key}.bias")}

    def ln(key):
        return {"scale": w(f"{key}.weight"), "bias": w(f"{key}.bias")}

    def conv(key, bias=True):
        p = {"w": w(f"{key}.weight").transpose(2, 3, 1, 0)}
        if bias:
            p["b"] = w(f"{key}.bias")
        return p

    def conv_t(key):
        # torch ConvTranspose2d weight is (in, out, kh, kw). jax.lax.
        # conv_transpose (transpose_kernel=False) is a fractionally-strided
        # FORWARD conv, so torch's kernel must be spatially flipped to match
        # torch's true transposed convolution.
        wt = w(f"{key}.weight")[:, :, ::-1, ::-1]
        return {"w": wt.transpose(2, 3, 0, 1).copy(), "b": w(f"{key}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"backbone.encoder.layer.{i}"
        blocks.append(
            {
                "ln1": ln(f"{p}.norm1"),
                "q": lin(f"{p}.attention.attention.query"),
                "k": lin(f"{p}.attention.attention.key"),
                "v": lin(f"{p}.attention.attention.value"),
                "o": lin(f"{p}.attention.output.dense"),
                "ls1": w(f"{p}.layer_scale1.lambda1"),
                "ln2": ln(f"{p}.norm2"),
                "fc1": lin(f"{p}.mlp.fc1"),
                "fc2": lin(f"{p}.mlp.fc2"),
                "ls2": w(f"{p}.layer_scale2.lambda1"),
            }
        )
    blocks = _stack_blocks(blocks)
    backbone = {
        "patch_embed": {
            "w": w("backbone.embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
            "b": w("backbone.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": w("backbone.embeddings.cls_token")[0],
        "pos_embed": w("backbone.embeddings.position_embeddings"),
        "blocks": blocks,
        "final_ln": ln("backbone.layernorm"),
    }

    reassemble = []
    for i, factor in enumerate(cfg.reassemble_factors):
        entry = {"projection": conv(f"neck.reassemble_stage.layers.{i}.projection")}
        if factor > 1:
            entry["resize"] = conv_t(f"neck.reassemble_stage.layers.{i}.resize")
        elif factor < 1:
            entry["resize"] = conv(f"neck.reassemble_stage.layers.{i}.resize")
        reassemble.append(entry)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        p = f"neck.fusion_stage.layers.{i}"
        fusion.append(
            {
                "projection": conv(f"{p}.projection"),
                "residual1": {
                    "conv1": conv(f"{p}.residual_layer1.convolution1"),
                    "conv2": conv(f"{p}.residual_layer1.convolution2"),
                },
                "residual2": {
                    "conv1": conv(f"{p}.residual_layer2.convolution1"),
                    "conv2": conv(f"{p}.residual_layer2.convolution2"),
                },
            }
        )

    return {
        "backbone": backbone,
        "reassemble": reassemble,
        "neck_convs": [conv(f"neck.convs.{i}", bias=False) for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
        "head": {
            "conv1": conv("head.conv1"),
            "conv2": conv("head.conv2"),
            "conv3": conv("head.conv3"),
        },
    }


# ----------------------------- ViT classifier -----------------------------

@dataclasses.dataclass(frozen=True)
class ViTClassifierConfig:
    """ViT-base image classifier (the reference's NSFW gate loads
    Falconsai/nsfw_image_detection — a ViT-base with 2 labels,
    models/util.py:16-48)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    num_labels: int = 2
    layer_norm_eps: float = 1e-12

    def tiny(self) -> "ViTClassifierConfig":
        return dataclasses.replace(
            self, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, image_size=28, patch_size=14,
        )


def vit_classify(cfg: ViTClassifierConfig, params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, 3) normalized pixels -> logits (B, num_labels)."""
    x, _ = patch_embed(params["patch_embed"], pixels, cfg.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]

    def body(x, blk):
        h = _ln(blk["ln1"], x, cfg.layer_norm_eps)
        attn = _sdpa(_lin(blk["q"], h), _lin(blk["k"], h), _lin(blk["v"], h), cfg.num_heads)
        x = x + _lin(blk["o"], attn)
        h = _ln(blk["ln2"], x, cfg.layer_norm_eps)
        return x + _lin(blk["fc2"], jax.nn.gelu(_lin(blk["fc1"], h), approximate=False)), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln(params["final_ln"], x, cfg.layer_norm_eps)
    return _lin(params["classifier"], x[:, 0])


def convert_vit_classifier(state: dict[str, np.ndarray], cfg: ViTClassifierConfig) -> Params:
    """HF ViTForImageClassification state dict -> pytree."""

    def w(key):
        return np.asarray(state[key])

    def lin(key):
        return {"w": w(f"{key}.weight").T, "b": w(f"{key}.bias")}

    def ln(key):
        return {"scale": w(f"{key}.weight"), "bias": w(f"{key}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"vit.encoder.layer.{i}"
        blocks.append(
            {
                "ln1": ln(f"{p}.layernorm_before"),
                "q": lin(f"{p}.attention.attention.query"),
                "k": lin(f"{p}.attention.attention.key"),
                "v": lin(f"{p}.attention.attention.value"),
                "o": lin(f"{p}.attention.output.dense"),
                "ln2": ln(f"{p}.layernorm_after"),
                "fc1": lin(f"{p}.intermediate.dense"),
                "fc2": lin(f"{p}.output.dense"),
            }
        )
    blocks = _stack_blocks(blocks)
    return {
        "patch_embed": {
            "w": w("vit.embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
            "b": w("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": w("vit.embeddings.cls_token")[0],
        "pos_embed": w("vit.embeddings.position_embeddings")[0],
        "blocks": blocks,
        "final_ln": ln("vit.layernorm"),
        "classifier": lin("classifier"),
    }


def vit_preprocess(img, image_size: int = 224) -> jnp.ndarray:
    """PIL image -> (1, S, S, 3), ViTImageProcessor defaults (resize,
    rescale 1/255, normalize mean=std=0.5)."""
    from PIL import Image

    img = img.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
    x = np.asarray(img).astype(np.float32) / 255.0
    return jnp.asarray((x - 0.5) / 0.5)[None]


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def depth_anything_preprocess(img, target: int = 518, multiple: int = 14) -> jnp.ndarray:
    """PIL image -> (1, H', W', 3) ImageNet-normalized pixels with both dims
    multiples of `multiple` (DPTImageProcessor keep_aspect_ratio semantics:
    of the two per-axis scales to `target`, pick the one CLOSEST to 1)."""
    from PIL import Image

    w, h = img.size
    scale_h, scale_w = target / h, target / w
    scale = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h
    nh = max(multiple, int(round(h * scale / multiple)) * multiple)
    nw = max(multiple, int(round(w * scale / multiple)) * multiple)
    img = img.convert("RGB").resize((nw, nh), Image.BICUBIC)
    x = np.asarray(img).astype(np.float32) / 255.0
    return jnp.asarray((x - IMAGENET_MEAN) / IMAGENET_STD)[None]
