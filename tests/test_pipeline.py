"""End-to-end pipeline tests on a tiny random model: the full
preprocess -> encode -> pack -> denoise -> decode -> crop path."""

import jax
import numpy as np
import pytest
from PIL import Image

from visualcloze_tpu.pipeline import random_components
from visualcloze_tpu.pipeline.preprocessing import (
    center_crop,
    image_to_array,
    array_to_image,
    preprocess_grid,
    resize_with_aspect_ratio,
)


def make_img(w, h, color=(128, 64, 200)):
    return Image.new("RGB", (w, h), color)


@pytest.fixture(scope="module")
def model():
    return random_components(jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla")


# ----------------------------- preprocessing -----------------------------

def test_resize_with_aspect_ratio_area_and_divisibility():
    img = make_img(640, 480)
    out = resize_with_aspect_ratio(img, 384)
    assert out.width % 16 == 0 and out.height % 16 == 0
    area = out.width * out.height
    assert 0.8 * 384 ** 2 <= area <= 1.2 * 384 ** 2
    assert abs(out.width / out.height - 640 / 480) < 0.15


def test_center_crop():
    img = make_img(100, 60)
    out = center_crop(img, (50, 40))
    assert out.size == (50, 40)


def test_image_array_roundtrip():
    img = make_img(32, 16, (10, 128, 250))
    arr = image_to_array(img)
    assert arr.shape == (16, 32, 3)
    assert arr.min() >= -1 and arr.max() <= 1
    back = array_to_image((arr + 1) / 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1)


def test_preprocess_grid_2x2_with_masked_query():
    images = [
        [make_img(64, 64), make_img(64, 64)],
        [make_img(64, 64), None],
    ]
    processed, mask_position, target_size, upsampling_size = preprocess_grid(images, 2, 2, 64)
    assert len(processed) == 4
    assert mask_position == [0, 1]
    assert target_size is not None and upsampling_size == (64, 64)
    sizes = {img.size for img in processed}
    assert len(sizes) == 1  # every cell normalized to the same size


def test_preprocess_grid_missing_context_raises():
    images = [[None, make_img(64, 64)], [make_img(64, 64), make_img(64, 64)]]
    with pytest.raises(ValueError):
        preprocess_grid(images, 2, 2, 64)


# ----------------------------- end to end -----------------------------

def test_process_images_2x1_grid(model):
    """Depth-to-image-style task: 1 context row (2 cells), query row with the
    target masked."""
    model.set_grid_size(2, 2)
    images = [
        [make_img(64, 64, (255, 0, 0)), make_img(64, 64, (0, 255, 0))],
        [make_img(64, 64, (0, 0, 255)), None],
    ]
    prompts = ["grid layout", "task", "The content of the last image in the final row is: x"]
    out = model.process_images(
        images, prompts, seed=7, cfg=4.0, steps=3, is_upsampling=False
    )
    assert len(out) == 1
    assert isinstance(out[0], Image.Image)
    # output cell matches the query row's cell size
    assert out[0].width % 16 == 0 and out[0].height % 16 == 0
    assert np.isfinite(np.asarray(out[0], dtype=np.float32)).all()


def test_process_images_deterministic_given_seed(model):
    model.set_grid_size(1, 2)
    images = [[make_img(64, 64, (10, 20, 30)), None]]
    prompts = ["layout", "task", "content"]
    a = model.process_images(images, prompts, seed=3, steps=2, is_upsampling=False)[0]
    b = model.process_images(images, prompts, seed=3, steps=2, is_upsampling=False)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.process_images(images, prompts, seed=4, steps=2, is_upsampling=False)[0]
    assert np.asarray(c).astype(int).sum() != np.asarray(a).astype(int).sum()


def test_upsampling_path(model):
    model.set_grid_size(1, 2)
    images = [[make_img(64, 64), None]]
    prompts = ["layout", "task", "In the last row, a blue square"]
    out = model.process_images(
        images, prompts, seed=5, steps=2,
        upsampling_steps=2, upsampling_noise=0.4, is_upsampling=True,
    )
    assert len(out) == 1
    # SDEdit upsampling resizes toward the original query size (<= 1024^2, /16)
    assert out[0].width % 16 == 0


def test_upsampling_noise_1_skips_sdedit(model):
    img = make_img(64, 48)
    out = model.upsampling(
        img, (64, 48), cfg=4.0, upsampling_steps=2, upsampling_noise=1.0,
        key=jax.random.PRNGKey(0), content_prompt="x",
    )
    assert out.size == (64, 48)


def test_multi_masked_cells(model):
    """Two masked query cells -> two outputs (multi-mask width normalization)."""
    model.set_grid_size(2, 3)
    images = [
        [make_img(64, 64), make_img(64, 64), make_img(64, 64)],
        [make_img(64, 64), None, None],
    ]
    prompts = ["layout", "task", "content"]
    out = model.process_images(images, prompts, seed=9, steps=2, is_upsampling=False)
    assert len(out) == 2


@pytest.mark.slow
def test_w8a8_smooth_calibrate_and_serve():
    """calibrate_w8a8_smooth on a live pipeline: stats collected over a real
    denoise trajectory, params swapped for the equalized w8a8 tree, and
    process_images still serves (pipeline-level SmoothQuant path)."""
    from visualcloze_tpu.pipeline import random_components

    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                          attn_impl="xla")
    images = [
        [make_img(64, 64, (255, 0, 0)), make_img(64, 64, (0, 255, 0))],
        [make_img(64, 64, (0, 0, 255)), None],
    ]
    prompts = ["grid layout", "task",
               "The content of the last image in the final row is: x"]
    m.set_grid_size(2, 2)
    ref = m.process_images(images, prompts, seed=7, cfg=4.0, steps=3,
                           is_upsampling=False)

    stats = m.calibrate_w8a8_smooth(steps=3, stride=2)
    assert stats is not None and all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(stats)
    )
    # the tree now carries a8 + a_sinv markers on the block token-dim linears
    sb = m.params["single_blocks"]["linear1"]
    assert "a8" in sb and "a_sinv" in sb and "w_int8" in sb

    out = m.process_images(images, prompts, seed=7, cfg=4.0, steps=3,
                           is_upsampling=False)
    a = np.asarray(ref[0], np.float32) / 255.0
    b = np.asarray(out[0], np.float32) / 255.0
    assert b.shape == a.shape and np.isfinite(b).all()
    # same seed, quantized weights: outputs stay close on the tiny model
    assert np.abs(a - b).mean() < 0.15


@pytest.mark.slow
def test_calibration_is_rope_layout_invariant():
    """The calibration forward must run in the model's own rope layout: the
    stats a half-layout pipeline (the serving default) collects must match
    the interleaved-layout pipeline built from the same weights — a q/k
    channel permutation is invisible to every linear's input distribution.
    (The calibration forward once defaulted to interleaved RoPE on
    half-permuted params, mis-calibrating every SmoothQuant scale.)"""
    from visualcloze_tpu.pipeline import random_components

    def stats_for(layout):
        m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                              attn_impl="xla", rope_layout=layout)
        return m.calibrate_w8a8_smooth(steps=3, stride=2)

    a, b = stats_for("interleaved"), stats_for("half")
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5
        )


def test_hbm_serialize_is_output_identical():
    """hbm_serialize (single-chip co-resident mode: per-stage device mutex +
    one-element readback fences) is pure synchronization — byte-identical
    outputs to the async default on the same seed."""
    from visualcloze_tpu.pipeline import random_components

    kw = dict(seed=5, steps=2, is_upsampling=True, upsampling_steps=2,
              upsampling_noise=0.4)
    grid = [[make_img(64, 64), None]]
    prompts = ["layout", "", "content"]
    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64)
    m.set_grid_size(1, 2)
    want = m.process_images(grid, prompts, **kw)
    m2 = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64)
    m2.hbm_serialize = True
    m2.set_grid_size(1, 2)
    got = m2.process_images(grid, prompts, **kw)
    assert len(got) == len(want) == 1
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


def test_synthetic_full_components_tiny_serves_one_query():
    """The resident-serving boot seam (serve.py --synthetic_full) at tiny
    size: int8 device-init DiT + int4 T5 + unpermuted half rope layout must
    serve a query end-to-end (full-size residency is proven on hardware by
    bench.py's phase S)."""
    from visualcloze_tpu.pipeline import synthetic_full_components

    m = synthetic_full_components(
        jax.random.PRNGKey(0), resolution=64, attn_impl="xla", tiny=True
    )
    m.set_grid_size(1, 2)
    out = m.process_images(
        [[make_img(64, 64), None]], ["layout", "", ""], seed=3, steps=2,
        is_upsampling=False,
    )
    assert len(out) == 1 and out[0].size[0] >= 64
