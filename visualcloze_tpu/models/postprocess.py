"""Output postprocessing: invisible watermark + gated image saving.

Counterpart of the reference's WatermarkEmbedder + save_image
(models/util.py:475-516, :16-48). The reference uses the imwatermark DWT-DCT
embedder (pywt-based, unavailable here); this is a self-contained blind
block-DCT watermark in numpy+cv2 embedding the same fixed 48-bit payload
(0b001010101111111010000111100111001111010100101000 — "anti-DreamBooth"
community convention) with a matching extractor for verification.
"""

from __future__ import annotations

import numpy as np

# fixed 48-bit message, bits as in the reference (models/util.py:477-480)
WATERMARK_MESSAGE = 0b001010101111111010000111100111001111010100101000
WATERMARK_BITS = [int(b) for b in bin(WATERMARK_MESSAGE)[2:].zfill(48)]

_BLOCK = 8
_COEF_A, _COEF_B = (3, 1), (1, 3)  # mid-frequency DCT coefficient pair


def _iter_blocks(h: int, w: int):
    for by in range(h // _BLOCK):
        for bx in range(w // _BLOCK):
            yield by * _BLOCK, bx * _BLOCK


def embed_watermark(image: np.ndarray, strength: float = 6.0) -> np.ndarray:
    """Embed the 48-bit payload into the blue channel's block DCT.

    image: uint8 RGB (H, W, 3); returns a watermarked copy. Bits are written
    by ordering the (3,1)/(1,3) coefficient pair and repeated cyclically over
    all complete 8x8 blocks for redundancy.
    """
    import cv2

    out = image.astype(np.float32).copy()
    chan = out[..., 2]
    h, w = chan.shape
    for i, (y, x) in enumerate(_iter_blocks(h, w)):
        bit = WATERMARK_BITS[i % len(WATERMARK_BITS)]
        block = cv2.dct(chan[y : y + _BLOCK, x : x + _BLOCK])
        a, b = block[_COEF_A], block[_COEF_B]
        if bit and a - b < strength:
            mid = (a + b) / 2
            block[_COEF_A], block[_COEF_B] = mid + strength / 2, mid - strength / 2
        elif not bit and b - a < strength:
            mid = (a + b) / 2
            block[_COEF_A], block[_COEF_B] = mid - strength / 2, mid + strength / 2
        chan[y : y + _BLOCK, x : x + _BLOCK] = cv2.idct(block)
    out[..., 2] = chan
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def extract_watermark_score(image: np.ndarray) -> float:
    """Fraction of blocks whose coefficient ordering matches the payload
    (0.5 = random; near 1.0 = watermarked)."""
    import cv2

    chan = image.astype(np.float32)[..., 2]
    h, w = chan.shape
    match = total = 0
    for i, (y, x) in enumerate(_iter_blocks(h, w)):
        bit = WATERMARK_BITS[i % len(WATERMARK_BITS)]
        block = cv2.dct(chan[y : y + _BLOCK, x : x + _BLOCK])
        got = 1 if block[_COEF_A] > block[_COEF_B] else 0
        match += got == bit
        total += 1
    return match / max(total, 1)


def build_nsfw_classifier(path: str | None = None, nsfw_label: int = 1, params=None, cfg=None):
    """Callable PIL -> p(nsfw) from the native ViT classifier tower
    (models/vision_towers.py; the reference loads the same architecture via
    transformers pipeline, models/util.py:16-48). `path` defaults to the
    NSFW_MODEL_PATH env var (a local HF snapshot of a ViT classifier such as
    Falconsai/nsfw_image_detection, whose label 1 is 'nsfw'). Returns None
    when no weights are available (the gate then stays off)."""
    import jax

    from .vision_towers import (
        ViTClassifierConfig,
        convert_vit_classifier,
        vit_classify,
        vit_preprocess,
    )

    cfg = cfg or ViTClassifierConfig()
    if params is None:
        import os

        path = path or os.environ.get("NSFW_MODEL_PATH")
        if not path or not os.path.exists(path):
            return None
        from ..models.image_embedders import _load_state

        params = convert_vit_classifier(_load_state(path), cfg)

    classify = jax.jit(lambda p, x: jax.nn.softmax(vit_classify(cfg, p, x), axis=-1))

    def nsfw_prob(img) -> float:
        probs = classify(params, vit_preprocess(img, cfg.image_size))
        return float(probs[0, nsfw_label])

    return nsfw_prob


def save_image(
    image,
    path: str,
    add_watermark: bool = True,
    nsfw_classifier=None,
    nsfw_threshold: float = 0.85,
    metadata: dict | None = None,
) -> str | None:
    """Watermark + optional NSFW gate + EXIF-annotated save
    (ref models/util.py:16-48).

    nsfw_classifier: optional callable PIL -> p(nsfw) — e.g. from
    build_nsfw_classifier (native ViT, local weights); None skips the gate.
    Returns the path, or None when the NSFW gate rejects the image.
    """
    from PIL import Image

    if nsfw_classifier is not None:
        if float(nsfw_classifier(image)) >= nsfw_threshold:
            return None
    arr = np.asarray(image.convert("RGB"))
    if add_watermark:
        arr = embed_watermark(arr)
    out = Image.fromarray(arr)
    exif = out.getexif()
    exif[0x0131] = "visualcloze-tpu"  # Software tag
    if metadata:
        exif[0x010E] = str(metadata)  # ImageDescription
    out.save(path, exif=exif)
    return path
