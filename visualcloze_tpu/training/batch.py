"""Training batch preparation: grid rows -> packed token batches.

Counterpart of the reference's in-loop data prep (train.py:544-604):
query-cell mask sampling, masked-cond construction, VAE encoding of conds and
targets, token packing with batch padding, and prepare_modified text
conditioning. Pure host+device functions called by the trainer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.autoencoder import AutoEncoder
from ..models.sampling import prepare_modified
from ..ops.packing import pack_mask, patchify


def sample_random_mask(
    h: int, w: int, w_grid: int, context: bool, rng: np.random.Generator
) -> np.ndarray:
    """Pixel mask for one grid row (ref train.py:207-220): context rows are
    all-zero; the query row masks one cell of a 1 x w_grid strip — 50% a
    random cell, 50% the last cell."""
    mask = np.zeros((h, w), np.float32)
    if context:
        return mask
    w_stride = w // w_grid
    if rng.random() < 0.5:
        w_idx = int(rng.integers(0, w_grid))
        mask[:, w_idx * w_stride : (w_idx + 1) * w_stride] = 1.0
    else:
        mask[:, w - w_stride :] = 1.0
    return mask


def prepare_train_batch(
    ae: AutoEncoder,
    t5,
    clip,
    rows_batch: list[list[np.ndarray]],
    prompts: list[str],
    grid_shapes: list[tuple[int, int]],
    key: jax.Array,
    rng: np.random.Generator,
    caption_dropout: float = 0.1,
    bucket: int = 512,
    compute_dtype=jnp.bfloat16,
) -> dict[str, jnp.ndarray]:
    """Build the train-step batch dict from dataset output.

    rows_batch[i] = list of (H, W_row, 3) float rows for sample i;
    grid_shapes[i] = (cols, rows).

    Returns dict with x1, cond, img_ids, img_mask, txt, txt_ids, txt_mask,
    vec — each (B, ...) (the caller reshapes to (accum, micro_bs, ...)).
    """
    # Draw every row's query mask first (rng order unchanged), then encode
    # ALL rows of one pixel shape — masked and clean stacked together — in a
    # single batched VAE call: 1 device dispatch per distinct row shape
    # instead of 2 batch-1 dispatches per row (B=16 3-row grids: ~96 tiny
    # encodes -> typically 1-2 batched ones). patchify/pack_mask batch the
    # same way.
    entries: list[tuple[np.ndarray, np.ndarray]] = []  # (row, mask), flat
    for i, rows in enumerate(rows_batch):
        w_grid = grid_shapes[i][0]
        for j, row in enumerate(rows):
            h, w = row.shape[:2]
            mask = sample_random_mask(h, w, w_grid, context=j < len(rows) - 1, rng=rng)
            entries.append((np.asarray(row), mask))

    by_shape: dict[tuple, list[int]] = {}
    for k, (row, _) in enumerate(entries):
        by_shape.setdefault(row.shape, []).append(k)

    row_cond: dict[int, jnp.ndarray] = {}  # flat row id -> (L, 320) cond toks
    row_x: dict[int, jnp.ndarray] = {}  # flat row id -> (1, h, w, 16) latent
    for idxs in by_shape.values():
        n = len(idxs)
        stack = np.stack(
            [entries[k][0] * (1.0 - entries[k][1][..., None]) for k in idxs]
            + [entries[k][0] for k in idxs]
        )
        key, k1 = jax.random.split(key)
        z = ae.encode_jit(jnp.asarray(stack), k1)  # (2n, h/8, w/8, 16)
        cond_t = patchify(z[:n].astype(compute_dtype))  # (n, L, 64)
        masks = np.stack([entries[k][1] for k in idxs])
        mask_t = pack_mask(jnp.asarray(masks).astype(compute_dtype))  # (n, L, 256)
        toks = jnp.concatenate([cond_t, mask_t], axis=-1)
        for pos, k in enumerate(idxs):
            row_cond[k] = toks[pos]
            row_x[k] = z[n + pos][None].astype(compute_dtype)

    cond_tok_list, x_rows_list = [], []
    cursor = 0
    for rows in rows_batch:
        ids = range(cursor, cursor + len(rows))
        cursor += len(rows)
        cond_tok_list.append(jnp.concatenate([row_cond[k] for k in ids], axis=0))
        x_rows_list.append([row_x[k] for k in ids])

    # pack targets + ids + padding via prepare_modified (ref train.py:597-598)
    inp = prepare_modified(
        t5, clip, x_rows_list, prompts,
        proportion_empty_prompts=caption_dropout,
        is_train=True, rng=rng, bucket=bucket,
    )
    max_len = inp["img"].shape[1]
    cond = jnp.stack([
        jnp.pad(ct, ((0, max_len - ct.shape[0]), (0, 0)))
        for ct in cond_tok_list
    ])

    return {
        "x1": inp["img"],
        "cond": cond,
        "img_ids": inp["img_ids"],
        "img_mask": inp["img_mask"],
        "txt": inp["txt"],
        "txt_ids": inp["txt_ids"],
        "txt_mask": inp["txt_mask"],
        "vec": inp["vec"],
    }


def to_micro_batches(batch: dict, micro_bs: int) -> dict:
    """(B, ...) -> (accum, micro_bs, ...) for the scanned accumulation loop."""
    b = batch["x1"].shape[0]
    assert b % micro_bs == 0, (b, micro_bs)
    accum = b // micro_bs
    return {k: v.reshape(accum, micro_bs, *v.shape[1:]) for k, v in batch.items()}
