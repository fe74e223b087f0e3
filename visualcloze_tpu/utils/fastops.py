"""Dispatch layer for the native fastops extension.

Uses visualcloze_tpu._fastops (C, OpenMP — csrc/fastops.c) when built,
otherwise numpy/PIL fallbacks with identical semantics. All functions take
uint8 RGB (H, W, 3) and produce float32 [-1, 1] NHWC."""

from __future__ import annotations

import numpy as np

try:
    from visualcloze_tpu import _fastops  # built by setup.py build_ext

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    _fastops = None
    HAVE_NATIVE = False


def resize_normalize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize + [-1, 1] normalization."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if HAVE_NATIVE:
        return _fastops.resize_normalize(img, out_h, out_w)
    from PIL import Image

    resized = Image.fromarray(img).resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(resized, np.float32) * (2.0 / 255.0) - 1.0


def hconcat_normalize(cells: list[np.ndarray]) -> np.ndarray:
    """Horizontal concat of equal-height cells + [-1, 1] normalization."""
    cells = [np.ascontiguousarray(c, dtype=np.uint8) for c in cells]
    if HAVE_NATIVE:
        return _fastops.hconcat_normalize(cells)
    row = np.concatenate(cells, axis=1)
    return row.astype(np.float32) * (2.0 / 255.0) - 1.0
