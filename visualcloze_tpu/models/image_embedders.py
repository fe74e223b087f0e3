"""Auxiliary image-conditioning encoders.

Counterpart of the reference models/modules/image_embedders.py:15-103
(Depth / Canny / Redux encoders, used by the BFL prepare_control/prepare_redux
paths — not by the VisualCloze grid pipeline itself).

- CannyImageEncoder: fully local (cv2), complete parity.
- DepthImageEncoder: interface + normalization; the DepthAnything network
  weights must be provided locally (DEPTH_ANYTHING_PATH) — no-network env.
- ReduxImageEncoder: the 2-layer projector in JAX with an HF weight converter;
  the SigLIP vision tower hook accepts precomputed features or a callable.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


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
    """Depth-map conditioning. Requires a local depth network; raises with a
    clear message otherwise (the reference downloads depth-anything-large-hf,
    image_embedders.py:15-35 — impossible in a no-network environment)."""

    def __init__(self, depth_fn: Callable | None = None):
        self.depth_fn = depth_fn

    def __call__(self, img) -> jnp.ndarray:
        if self.depth_fn is None:
            raise RuntimeError(
                "DepthImageEncoder needs a depth network: pass depth_fn "
                "(PIL -> (H, W) depth array) built from local weights"
            )
        depth = np.asarray(self.depth_fn(img), dtype=np.float32)
        depth = depth / max(float(depth.max()), 1e-6)  # normalize like the ref
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
    space. `siglip_fn` maps PIL -> (1, L, redux_dim) features (from local
    SigLIP weights); precomputed features may be passed directly."""

    def __init__(self, params: Params, siglip_fn: Callable | None = None):
        self.params = params
        self.siglip_fn = siglip_fn
        self._project = jax.jit(lambda p, x: redux_project(p, x))

    def __call__(self, img_or_features) -> jnp.ndarray:
        if isinstance(img_or_features, (np.ndarray, jnp.ndarray)):
            feats = jnp.asarray(img_or_features)
        elif self.siglip_fn is not None:
            feats = jnp.asarray(self.siglip_fn(img_or_features))
        else:
            raise RuntimeError(
                "ReduxImageEncoder needs SigLIP features: pass siglip_fn built "
                "from local weights, or precomputed feature arrays"
            )
        return self._project(self.params, feats)
