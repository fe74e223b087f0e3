"""Latent <-> token packing for the FLUX sequence model.

TPU-native counterpart of the reference's einops packing
(models/sampling.py:37-118 `prepare_modified`, visualcloze.py:381-389).

Latents are NHWC here (TPU conv layout); token feature ordering matches the
reference's channel-first `(c ph pw)` convention exactly so converted
checkpoints are drop-in compatible:
  token[k] = latent[c, y*2+ph, x*2+pw] with k = c*4 + ph*2 + pw.

All functions are shape-static and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def patchify(latent: jnp.ndarray) -> jnp.ndarray:
    """2x2-patchify an NHWC latent into tokens.

    Args:
      latent: (..., H, W, C) with H, W even.
    Returns:
      (..., H//2 * W//2, C*4) tokens, feature order (c, ph, pw).

    Ref: rearrange("c (h ph) (w pw) -> (h w) (c ph pw)", ph=2, pw=2)
    (models/sampling.py:63).
    """
    *lead, h, w, c = latent.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = latent.reshape(*lead, h // 2, 2, w // 2, 2, c)
    # (..., h2, ph, w2, pw, c) -> (..., h2, w2, c, ph, pw)
    x = jnp.moveaxis(x, (-4, -2), (-2, -1))
    return x.reshape(*lead, (h // 2) * (w // 2), c * 4)


def unpatchify(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`patchify`.

    Args:
      tokens: (..., h//2 * w//2, C*4).
      h, w: latent spatial dims (even).
    Returns:
      (..., h, w, C) NHWC latent.

    Ref: rearrange("b (h w) (c ph pw) -> b c (h ph) (w pw)") (visualcloze.py:430).
    """
    *lead, L, d = tokens.shape
    assert L == (h // 2) * (w // 2), (L, h, w)
    c = d // 4
    x = tokens.reshape(*lead, h // 2, w // 2, c, 2, 2)
    # (..., h2, w2, c, ph, pw) -> (..., h2, ph, w2, pw, c)
    x = jnp.moveaxis(x, (-2, -1), (-4, -2))
    return x.reshape(*lead, h, w, c)


def pack_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a pixel-space mask into 256-channel tokens.

    Two-stage packing mirroring visualcloze.py:381-382: 8x8 pixel blocks to
    64 channels at latent resolution, then 2x2 patchify to 256-channel tokens
    aligned with the image tokens.

    Args:
      mask: (..., H, W) pixel mask, H and W multiples of 16.
    Returns:
      (..., H//16 * W//16, 256).
    """
    *lead, hpx, wpx = mask.shape
    assert hpx % 16 == 0 and wpx % 16 == 0, (hpx, wpx)
    h8, w8 = hpx // 8, wpx // 8
    x = mask.reshape(*lead, h8, 8, w8, 8)
    # (..., h8, ph, w8, pw) -> (..., h8, w8, ph, pw): channel order (ph, pw)
    x = jnp.moveaxis(x, -3, -2)
    x = x.reshape(*lead, h8, w8, 64)
    return patchify(x)


def make_img_ids(h_tok: int, w_tok: int, row_index: int) -> np.ndarray:
    """3-axis position ids for one grid row's tokens.

    axis 0 = grid-row id (row_index + 1), axis 1 = y, axis 2 = x.
    Host-side numpy: ids are static per grid layout.

    Ref: models/sampling.py:56-59.
    """
    ids = np.zeros((h_tok, w_tok, 3), dtype=np.float32)
    ids[..., 0] = row_index + 1
    ids[..., 1] += np.arange(h_tok, dtype=np.float32)[:, None]
    ids[..., 2] += np.arange(w_tok, dtype=np.float32)[None, :]
    return ids.reshape(h_tok * w_tok, 3)


def pack_sequences(
    tokens: list[np.ndarray],
    ids: list[np.ndarray],
    pad_to: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a batch of (tokens, ids) sequences to a common static length.

    Args:
      tokens: per-sample (L_i, D) arrays (rows already concatenated).
      ids: per-sample (L_i, 3) arrays.
      pad_to: fixed length (bucketing) or None for batch max.

    Returns: (img (B,L,D), img_ids (B,L,3) float32, img_mask (B,L) int32).
    """
    assert len(tokens) == len(ids)
    max_len = max(t.shape[0] for t in tokens)
    if pad_to is not None:
        assert pad_to >= max_len, (pad_to, max_len)
        max_len = pad_to
    b = len(tokens)
    d = tokens[0].shape[-1]
    img = np.zeros((b, max_len, d), dtype=tokens[0].dtype)
    img_ids = np.zeros((b, max_len, 3), dtype=np.float32)
    img_mask = np.zeros((b, max_len), dtype=np.int32)
    for i, (t, x) in enumerate(zip(tokens, ids)):
        L = t.shape[0]
        assert x.shape[0] == L, (x.shape, t.shape)
        img[i, :L] = t
        img_ids[i, :L] = x
        img_mask[i, :L] = 1
    return img, img_ids, img_mask


def bucket_length(n: int, bucket: int = 256, minimum: int | None = None) -> int:
    """Round a sequence length up to a bucket boundary (static-shape discipline
    replacing the reference's varlen unpadding; SURVEY.md §2.9 item 10).

    minimum defaults to the bucket size, so a bucket=128 caller really gets
    128-grain buckets (a fixed 256 floor used to override smaller buckets
    and silently double the padding waste for short sequences)."""
    minimum = bucket if minimum is None else minimum
    return max(minimum, ((n + bucket - 1) // bucket) * bucket)
