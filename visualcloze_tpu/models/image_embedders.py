"""Auxiliary image-conditioning encoders.

Counterpart of the reference models/modules/image_embedders.py:15-103
(Depth / Canny / Redux encoders, used by the BFL prepare_control/prepare_redux
paths — not by the VisualCloze grid pipeline itself).

- CannyImageEncoder: fully local (cv2), complete parity.
- DepthImageEncoder: native JAX DepthAnything tower (models/vision_towers.py,
  DINOv2 ViT-L + DPT) loaded from a local checkpoint (DEPTH_ANYTHING_PATH),
  or an injected callable for custom depth networks.
- ReduxImageEncoder: native JAX SigLIP vision tower + the 2-layer projector,
  both with HF weight converters (SIGLIP_PATH / FLUX_REDUX); precomputed
  features and injected callables remain supported.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def _load_state(path: str) -> dict[str, np.ndarray]:
    """Local .safetensors file / HF snapshot dir / torch .pth -> numpy dict."""
    from ..pipeline.loader import load_sharded_safetensors, load_torch_checkpoint

    if os.path.isdir(path):
        return load_sharded_safetensors(path)
    return load_torch_checkpoint(path)


class CannyImageEncoder:
    """cv2 Canny edges as a 3-channel conditioning image in [-1, 1]
    (ref image_embedders.py:38-63)."""

    def __init__(self, min_t: int = 50, max_t: int = 200):
        self.min_t = min_t
        self.max_t = max_t

    def __call__(self, img) -> jnp.ndarray:
        """PIL image -> (1, H, W, 3) float in [-1, 1]."""
        import cv2

        arr = np.asarray(img.convert("RGB"))
        edges = cv2.Canny(cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY), self.min_t, self.max_t)
        out = np.stack([edges] * 3, axis=-1).astype(np.float32) / 127.5 - 1.0
        return jnp.asarray(out)[None]


class DepthImageEncoder:
    """Depth-map conditioning via the native DepthAnything tower
    (ref image_embedders.py:15-35 uses depth-anything-large-hf).

    Weight sources, in priority order: explicit `params`, a custom
    `depth_fn` (PIL -> (H, W) array), or the DEPTH_ANYTHING_PATH env var
    pointing at a local HF checkpoint."""

    def __init__(self, depth_fn: Callable | None = None, params: Params | None = None,
                 cfg=None):
        from .vision_towers import DepthAnythingTowerConfig

        self.cfg = cfg or DepthAnythingTowerConfig()
        self.depth_fn = depth_fn
        self.params = params
        if self.params is None and self.depth_fn is None:
            path = os.environ.get("DEPTH_ANYTHING_PATH")
            if path and os.path.exists(path):
                from .vision_towers import convert_depth_anything

                self.params = convert_depth_anything(_load_state(path), self.cfg)
        self._apply = None

    def _depth(self, img) -> np.ndarray:
        from .vision_towers import depth_anything_apply, depth_anything_preprocess

        if self.params is not None:
            if self._apply is None:
                self._apply = jax.jit(
                    lambda p, x: depth_anything_apply(self.cfg, p, x)
                )
            pixels = depth_anything_preprocess(img, target=self.cfg.image_size,
                                               multiple=self.cfg.patch_size)
            return np.asarray(self._apply(self.params, pixels))[0]
        if self.depth_fn is not None:
            return np.asarray(self.depth_fn(img), dtype=np.float32)
        raise RuntimeError(
            "DepthImageEncoder needs weights: set DEPTH_ANYTHING_PATH to a "
            "local depth-anything checkpoint, pass params=, or pass depth_fn="
        )

    def __call__(self, img) -> jnp.ndarray:
        """PIL image -> (1, H, W, 3) depth conditioning in [-1, 1] at the
        input's resolution (ref: network depth, bicubic resize back, /127.5-1
        on the 0..255-scaled map — equivalent to max-normalizing)."""
        depth = self._depth(img)
        w, h = img.size
        if depth.shape != (h, w):
            depth = np.asarray(
                jax.image.resize(jnp.asarray(depth), (h, w), method="bicubic")
            )
        depth = np.clip(depth, 0.0, None)  # bicubic can undershoot the ReLU floor
        depth = depth / max(float(depth.max()), 1e-6)
        out = np.stack([depth] * 3, axis=-1) * 2.0 - 1.0
        return jnp.asarray(out)[None]


def init_redux_projector(key: jax.Array, redux_dim: int = 1152, txt_dim: int = 4096, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    s1, s2 = redux_dim ** -0.5, (txt_dim * 3) ** -0.5
    return {
        "redux_up": {
            "w": (jax.random.normal(k1, (redux_dim, txt_dim * 3)) * s1).astype(dtype),
            "b": jnp.zeros((txt_dim * 3,), dtype),
        },
        "redux_down": {
            "w": (jax.random.normal(k2, (txt_dim * 3, txt_dim)) * s2).astype(dtype),
            "b": jnp.zeros((txt_dim,), dtype),
        },
    }


def redux_project(params: Params, siglip_features: jnp.ndarray) -> jnp.ndarray:
    """SigLIP features -> T5-space tokens: down(silu(up(x)))
    (ref image_embedders.py:66-103 ReduxImageEncoder)."""
    x = siglip_features
    h = jnp.einsum("...i,io->...o", x, params["redux_up"]["w"].astype(x.dtype))
    h = h + params["redux_up"]["b"].astype(h.dtype)
    h = jax.nn.silu(h)
    h = jnp.einsum("...i,io->...o", h, params["redux_down"]["w"].astype(h.dtype))
    return h + params["redux_down"]["b"].astype(h.dtype)


def convert_redux(state: dict[str, np.ndarray], dtype=None) -> Params:
    """BFL flux1-redux-dev.safetensors -> projector pytree."""
    def w(key):
        x = np.asarray(state[key])
        return x if dtype is None else x.astype(dtype)

    return {
        "redux_up": {"w": w("redux_up.weight").T, "b": w("redux_up.bias")},
        "redux_down": {"w": w("redux_down.weight").T, "b": w("redux_down.bias")},
    }


class ReduxImageEncoder:
    """Style conditioning: SigLIP vision features projected into T5 token
    space (ref image_embedders.py:66-103). The vision tower is the native
    JAX SigLIP (models/vision_towers.py), loaded from SIGLIP_PATH; a custom
    `siglip_fn` (PIL -> (1, L, redux_dim)) or precomputed feature arrays are
    also accepted."""

    def __init__(self, params: Params, siglip_fn: Callable | None = None,
                 siglip_params: Params | None = None, siglip_cfg=None):
        from .vision_towers import SigLIPVisionConfig

        self.params = params
        self.siglip_fn = siglip_fn
        self.siglip_cfg = siglip_cfg or SigLIPVisionConfig()
        self.siglip_params = siglip_params
        if self.siglip_params is None and self.siglip_fn is None:
            path = os.environ.get("SIGLIP_PATH")
            if path and os.path.exists(path):
                from .vision_towers import convert_siglip_vision

                self.siglip_params = convert_siglip_vision(_load_state(path), self.siglip_cfg)
        self._project = jax.jit(lambda p, x: redux_project(p, x))
        self._encode = None

    def _features(self, img) -> jnp.ndarray:
        from .vision_towers import siglip_encode, siglip_preprocess

        if self.siglip_params is not None:
            if self._encode is None:
                self._encode = jax.jit(
                    lambda p, x: siglip_encode(self.siglip_cfg, p, x)
                )
            return self._encode(
                self.siglip_params, siglip_preprocess(img, self.siglip_cfg.image_size)
            )
        if self.siglip_fn is not None:
            return jnp.asarray(self.siglip_fn(img))
        raise RuntimeError(
            "ReduxImageEncoder needs SigLIP features: set SIGLIP_PATH to a "
            "local SigLIP checkpoint, pass siglip_params=/siglip_fn=, or "
            "precomputed feature arrays"
        )

    def __call__(self, img_or_features) -> jnp.ndarray:
        if isinstance(img_or_features, (np.ndarray, jnp.ndarray)):
            feats = jnp.asarray(img_or_features)
        else:
            feats = self._features(img_or_features)
        return self._project(self.params, feats)
