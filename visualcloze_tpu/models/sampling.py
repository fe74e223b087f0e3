"""Token preparation for sampling and training.

TPU-native counterpart of models/sampling.py in the reference (37-372):
prepare_modified (the packing used by the whole VisualCloze pipeline), the
original BFL prepare/prepare_fill formats, noise generation and unpacking.

Latents are NHWC; packing reproduces the reference's channel-first token
feature order via ops.packing. Sequence padding targets a static bucketed
length (ops.packing.bucket_length) so the jitted sampler compiles once per
bucket instead of once per grid shape.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packing import bucket_length, make_img_ids, patchify, unpatchify

Params = dict[str, Any]


def get_noise(
    key: jax.Array, num_samples: int, height: int, width: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Latent-shaped unit noise, NHWC (ref models/sampling.py:18-35).

    height/width are latent dims /8 of pixels; shape allows 2x2 packing.
    """
    shape = (num_samples, 2 * math.ceil(height / 2), 2 * math.ceil(width / 2), 16)
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def prepare_modified(
    t5: Callable | None,
    clip: Callable | None,
    img: Sequence[Sequence[jnp.ndarray]],
    prompt: str | Sequence[str],
    proportion_empty_prompts: float = 0.1,
    is_train: bool = True,
    text_emb: Sequence[dict] | None = None,
    rng: np.random.Generator | None = None,
    pad_to: int | None = None,
    bucket: int | None = None,
    null_emb: dict | None = None,
) -> dict[str, jnp.ndarray]:
    """Pack per-row latents into one padded token sequence + text features.

    Mirrors models/sampling.py:37-118:
      - img: batch of samples, each a list of per-row NHWC latents
        (1, h, w, c) or (h, w, c); row j gets position ids (j+1, y, x),
      - rows are token-concatenated; the batch is padded to a common length
        with img_mask (1 real / 0 pad) — optionally to a bucket boundary,
      - caption dropout with probability proportion_empty_prompts; list
        prompts pick random (train) / first (eval),
      - T5 -> txt, zero txt_ids, ones txt_mask; CLIP pooled -> vec;
        precomputed text_emb bypasses the encoders.

    Caption dropout with cached embeddings: the reference blanks the prompt
    string but then reads txt/vec straight from text_emb, so dropout is a
    silent no-op on that path (ref models/sampling.py:79-101; its drop_mask
    output has no real consumer). Here, pass null_emb={"txt": T5(""),
    "vec": CLIP("")} to substitute the cached null embedding for dropped
    rows; dropout > 0 with cached embeddings and no null_emb raises rather
    than silently training without unconditional examples.
    """
    assert isinstance(img, (list, tuple)) and all(isinstance(r, (list, tuple)) for r in img)
    bs = len(img)

    flat_tokens, flat_ids = [], []
    for rows in img:
        toks, ids = [], []
        for j, lat in enumerate(rows):
            if lat.ndim == 4:
                lat = lat[0]
            h, w, _ = lat.shape
            toks.append(patchify(lat))
            ids.append(make_img_ids(h // 2, w // 2, j))
        flat_tokens.append(jnp.concatenate(toks, axis=0))
        flat_ids.append(np.concatenate(ids, axis=0))

    max_len = max(t.shape[0] for t in flat_tokens)
    if pad_to is not None:
        max_len = max(max_len, pad_to)
    elif bucket:
        max_len = bucket_length(max_len, bucket)

    padded, padded_ids = [], []
    img_mask = np.zeros((bs, max_len), dtype=np.int32)
    for i, (t, x) in enumerate(zip(flat_tokens, flat_ids)):
        L = t.shape[0]
        padded.append(jnp.pad(t, ((0, max_len - L), (0, 0))))
        padded_ids.append(np.pad(x, ((0, max_len - L), (0, 0))))
        img_mask[i, :L] = 1
    img_tok = jnp.stack(padded, axis=0)
    img_ids = jnp.asarray(np.stack(padded_ids, axis=0))

    if isinstance(prompt, str):
        prompt = [prompt]
    prompt = list(prompt)
    if len(prompt) != bs:
        # keep image- and text-side batch dims consistent (the reference
        # repeats tensors to the prompt batch; models/sampling.py:42-70)
        if bs == 1:
            img_tok = jnp.broadcast_to(img_tok, (len(prompt),) + img_tok.shape[1:])
            img_ids = jnp.broadcast_to(img_ids, (len(prompt),) + img_ids.shape[1:])
            img_mask = jnp.broadcast_to(jnp.asarray(img_mask), (len(prompt), img_mask.shape[1]))
        else:
            raise ValueError(
                f"batch mismatch: {bs} image sample(s) vs {len(prompt)} prompt(s)"
            )
    bs = len(prompt)
    rng = rng or np.random.default_rng()
    drop_mask = []
    for idx in range(bs):
        if proportion_empty_prompts > 0 and rng.random() < proportion_empty_prompts:
            prompt[idx] = ""
        elif isinstance(prompt[idx], (list, tuple)):
            prompt[idx] = (
                prompt[idx][int(rng.integers(len(prompt[idx])))] if is_train else prompt[idx][0]
            )
        drop_mask.append(0 if prompt[idx] == "" else 1)

    if (t5 is None or clip is None) and proportion_empty_prompts > 0 and null_emb is None:
        raise ValueError(
            "caption dropout with cached text embeddings needs null_emb "
            '({"txt": T5(\'\'), "vec": CLIP(\'\')}) — without it dropped '
            "prompts would silently keep their cached conditional embedding"
        )

    def _sub_null(stacked, key_):
        if null_emb is None or all(drop_mask):
            return stacked
        null_row = jnp.asarray(null_emb[key_])
        keep = jnp.asarray(np.asarray(drop_mask, np.bool_))
        keep = keep.reshape((bs,) + (1,) * (stacked.ndim - 1))
        return jnp.where(keep, stacked, null_row[None])

    if t5 is None:
        txt = _sub_null(
            jnp.stack([jnp.asarray(item["txt"]) for item in text_emb], axis=0), "txt"
        )
    else:
        txt = t5(prompt)
    if txt.shape[0] == 1 and bs > 1:
        txt = jnp.broadcast_to(txt, (bs,) + txt.shape[1:])
    if clip is None:
        vec = _sub_null(
            jnp.stack([jnp.asarray(item["vec"]) for item in text_emb], axis=0), "vec"
        )
    else:
        vec = clip(prompt)
    if vec.shape[0] == 1 and bs > 1:
        vec = jnp.broadcast_to(vec, (bs,) + vec.shape[1:])

    return {
        "img": img_tok,
        "img_ids": img_ids,
        "txt": txt,
        "txt_ids": jnp.zeros((bs, txt.shape[1], 3), jnp.float32),
        "vec": vec,
        "img_mask": jnp.asarray(img_mask),
        "txt_mask": jnp.ones((bs, txt.shape[1]), jnp.int32),
        "drop_mask": jnp.asarray(np.asarray(drop_mask, np.int32)),
    }


def prepare(
    t5: Callable, clip: Callable, img: jnp.ndarray, prompt: str | Sequence[str]
) -> dict[str, jnp.ndarray]:
    """Original BFL single-image packer (ref models/sampling.py:123-158):
    2D position ids (row axis 0), no batch padding. img: (B, H, W, C) latent."""
    bs, h, w, _ = img.shape
    if bs == 1 and not isinstance(prompt, str):
        bs = len(prompt)
    tok = patchify(img)
    if tok.shape[0] == 1 and bs > 1:
        tok = jnp.broadcast_to(tok, (bs,) + tok.shape[1:])
    ids = make_img_ids(h // 2, w // 2, row_index=-1)  # axis0 = 0 (BFL format)
    img_ids = jnp.broadcast_to(jnp.asarray(ids)[None], (bs, ids.shape[0], 3))

    if isinstance(prompt, str):
        prompt = [prompt]
    txt = t5(prompt)
    if txt.shape[0] == 1 and bs > 1:
        txt = jnp.broadcast_to(txt, (bs,) + txt.shape[1:])
    vec = clip(prompt)
    if vec.shape[0] == 1 and bs > 1:
        vec = jnp.broadcast_to(vec, (bs,) + vec.shape[1:])
    return {
        "img": tok,
        "img_ids": img_ids,
        "txt": txt,
        "txt_ids": jnp.zeros((bs, txt.shape[1], 3), jnp.float32),
        "vec": vec,
    }


def prepare_fill(
    t5: Callable,
    clip: Callable,
    img: jnp.ndarray,
    prompt: str | Sequence[str],
    ae,
    img_cond: np.ndarray,
    mask: np.ndarray,
    key: jax.Array,
) -> dict[str, jnp.ndarray]:
    """BFL Fill-model packer (ref models/sampling.py:197-247): masked cond
    image VAE-encoded + mask 8x8/2x2-packed, concatenated on channels.

    Args:
      img: (B, h, w, 16) noise latent (NHWC).
      img_cond: (H, W, 3) pixels in [-1, 1].
      mask: (H, W) float in [0, 1].
    """
    from ..ops.packing import pack_mask

    masked = img_cond * (1.0 - mask[..., None])
    lat = ae.encode(jnp.asarray(masked)[None], key=key)
    cond_tok = patchify(lat.astype(img.dtype))
    mask_tok = pack_mask(jnp.asarray(mask)[None].astype(img.dtype))
    bs = img.shape[0]
    if cond_tok.shape[0] == 1 and bs > 1:
        cond_tok = jnp.broadcast_to(cond_tok, (bs,) + cond_tok.shape[1:])
        mask_tok = jnp.broadcast_to(mask_tok, (bs,) + mask_tok.shape[1:])
    out = prepare(t5, clip, img, prompt)
    out["img_cond"] = jnp.concatenate([cond_tok, mask_tok], axis=-1)
    return out


def prepare_control(
    t5: Callable,
    clip: Callable,
    img: jnp.ndarray,
    prompt: str | Sequence[str],
    ae,
    encoder: Callable,
    img_cond_pil,
    key: jax.Array,
) -> dict[str, jnp.ndarray]:
    """BFL Canny/Depth packer (ref models/sampling.py:160-194): conditioning
    image through the control encoder, VAE-encoded and patchified."""
    cond_px = encoder(img_cond_pil)  # (1, H, W, 3) in [-1, 1]
    lat = ae.encode(cond_px, key=key)
    cond_tok = patchify(lat.astype(img.dtype))
    bs = img.shape[0]
    if cond_tok.shape[0] == 1 and bs > 1:
        cond_tok = jnp.broadcast_to(cond_tok, (bs,) + cond_tok.shape[1:])
    out = prepare(t5, clip, img, prompt)
    out["img_cond"] = cond_tok
    return out


def prepare_redux(
    t5: Callable,
    clip: Callable,
    img: jnp.ndarray,
    prompt: str | Sequence[str],
    encoder: Callable,
    img_cond_pil,
) -> dict[str, jnp.ndarray]:
    """BFL Redux packer (ref models/sampling.py:250-297): SigLIP-projected
    image tokens appended to the T5 sequence."""
    img_cond = encoder(img_cond_pil)  # (1, L_cond, context_dim)
    out = prepare(t5, clip, img, prompt)
    txt = jnp.concatenate([out["txt"], img_cond.astype(out["txt"].dtype)], axis=-2)
    bs = out["img"].shape[0]
    if txt.shape[0] == 1 and bs > 1:
        txt = jnp.broadcast_to(txt, (bs,) + txt.shape[1:])
    out["txt"] = txt
    out["txt_ids"] = jnp.zeros((bs, txt.shape[1], 3), jnp.float32)
    return out


def unpack(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Tokens -> NHWC latent (ref models/sampling.py:364-372); height/width
    in pixels."""
    return unpatchify(x, 2 * math.ceil(height / 16), 2 * math.ceil(width / 16))
