"""Generate a synthetic example asset pack for the demo galleries.

The reference ships curated photos in-repo; this environment can't. Instead,
procedural scenes are synthesized and every condition modality is *derived*
(canny/depth/normal/etc. via the same operators the data toolkit uses), so
the galleries and the demo work fully offline:

  python -m examples.make_assets          # writes examples/assets/
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from examples.gradio_tasks import EXAMPLES_ROOT


def synth_scene(seed: int, size: int = 384) -> np.ndarray:
    """A procedural scene: gradient sky, ground plane, a few shaded shapes."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 3), np.float32)
    # sky gradient
    top = rng.uniform(80, 200, 3)
    bottom = rng.uniform(120, 255, 3)
    t = np.linspace(0, 1, size)[:, None, None]
    img += top * (1 - t) + bottom * t
    # ground
    horizon = int(size * rng.uniform(0.55, 0.75))
    ground = rng.uniform(40, 140, 3)
    img[horizon:] = ground + rng.normal(0, 6, (size - horizon, size, 3))
    # shapes with simple shading
    for _ in range(int(rng.integers(3, 7))):
        color = rng.uniform(30, 255, 3)
        cx, cy = rng.integers(size // 8, size - size // 8, 2)
        r = int(rng.integers(size // 16, size // 5))
        kind = rng.integers(0, 3)
        canvas = img.copy()
        if kind == 0:
            cv2.circle(canvas, (int(cx), int(cy)), r, color.tolist(), -1)
        elif kind == 1:
            cv2.rectangle(canvas, (int(cx - r), int(cy - r)), (int(cx + r), int(cy + r)),
                          color.tolist(), -1)
        else:
            pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]], np.int32)
            cv2.fillPoly(canvas, [pts], color.tolist())
        shade = np.linspace(1.1, 0.7, size)[None, :, None]
        img = np.where(canvas != img, canvas * shade, img)
    return np.clip(img, 0, 255).astype(np.uint8)


def depth_proxy(img: np.ndarray) -> np.ndarray:
    """Monotone vertical-distance proxy smoothed by intensity (a stand-in for
    a depth network; geometrically plausible for the synthetic scenes)."""
    h, w = img.shape[:2]
    base = np.linspace(255, 40, h)[:, None].astype(np.float32)
    lum = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = 0.8 * base + 0.2 * cv2.GaussianBlur(lum, (0, 0), 5)
    depth = cv2.normalize(depth, None, 0, 255, cv2.NORM_MINMAX)
    return np.stack([depth.astype(np.uint8)] * 3, axis=-1)


def normal_proxy(depth: np.ndarray) -> np.ndarray:
    d = depth[..., 0].astype(np.float32)
    gx = cv2.Sobel(d, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(d, cv2.CV_32F, 0, 1)
    n = np.stack([-gx, -gy, np.full_like(d, 64.0)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-6
    return ((n * 0.5 + 0.5) * 255).astype(np.uint8)


def foreground_mask(img: np.ndarray) -> np.ndarray:
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    _, mask = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
    return np.stack([mask] * 3, axis=-1)


GALLERY_DEGRADATIONS = (
    "GaussianNoise", "GaussianBlur", "JPEG", "LowLight", "SRx4", "Inpainting"
)

# per-scene style colormaps (style-transfer gallery variety)
_STYLE_MAPS = (
    cv2.COLORMAP_TWILIGHT, cv2.COLORMAP_OCEAN, cv2.COLORMAP_AUTUMN,
    cv2.COLORMAP_PINK, cv2.COLORMAP_BONE, cv2.COLORMAP_HSV,
)


def make_asset(file_id: str, seed: int, root: str) -> None:
    img = synth_scene(seed)
    depth = depth_proxy(img)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    canny = np.stack([cv2.Canny(gray, 80, 180)] * 3, axis=-1)
    hed = np.stack([cv2.GaussianBlur(cv2.Canny(gray, 40, 120), (5, 5), 2)] * 3, axis=-1)
    mlsd = np.stack([cv2.Canny(cv2.GaussianBlur(gray, (5, 5), 2), 120, 240)] * 3, axis=-1)
    seg = cv2.applyColorMap((gray // 32) * 32, cv2.COLORMAP_JET)[..., ::-1]
    fg = foreground_mask(img)
    assets = {
        "target": img,
        "reference": synth_scene(seed + 1000),
        "canny": canny,
        "depth": depth,
        "hed": hed,
        "normal": normal_proxy(depth),
        "mlsd": mlsd,
        "openpose": np.zeros_like(img),
        "sam2_mask": seg,
        "uniformer": seg,
        "foreground": (img * (fg > 0)).astype(np.uint8),
        "background": (img * (fg == 0)).astype(np.uint8),
        "mask": fg,
        "style_source": cv2.applyColorMap(gray, _STYLE_MAPS[seed % len(_STYLE_MAPS)])[..., ::-1],
        "style_target": img,
    }
    # degradation inputs for the restoration gallery (real toolkit functions)
    from visualcloze_tpu.data.degradations import add_degradation

    rng = np.random.default_rng(seed)
    for deg in GALLERY_DEGRADATIONS:
        assets[deg] = add_degradation(img, deg, rng=rng)
    # editing variants: DepthEdit = depth-guided re-render (another scene with
    # the same depth proxy), FillEdit = region-replaced copy
    assets["DepthEdit"] = synth_scene(seed + 2000)
    filled = img.copy()
    h, w = img.shape[:2]
    filled[h // 4 : h // 2, w // 4 : w // 2] = rng.integers(0, 255, 3)
    assets["FillEdit"] = filled

    for name, arr in assets.items():
        Image.fromarray(np.ascontiguousarray(arr)).save(
            os.path.join(root, f"{file_id}_{name}.jpg"), quality=85
        )


# every file id referenced by the 16 gallery families (gradio_tasks.py):
# a 4-scene pool per family prefix
ALL_FILE_IDS = [
    f"{prefix}_{i}"
    for prefix in ("dense", "cond", "rest", "style", "tryon", "relight",
                   "doodle", "edit", "subj", "unseen")
    for i in range(4)
]


def main(root: str | None = None) -> str:
    root = root or EXAMPLES_ROOT
    os.makedirs(root, exist_ok=True)
    for i, file_id in enumerate(ALL_FILE_IDS):
        make_asset(file_id, seed=17 + i, root=root)
    print(f"wrote synthetic example assets to {root}")
    return root


if __name__ == "__main__":
    main()
