"""Diffusers-compatible facade (pipeline/diffusers_api.py): the reference's
"Custom Sampling with Diffusers" user surface (ref README.md:140-211) over
VisualClozeModel — same call shape, near-zero code change for switchers."""

import numpy as np
import pytest
from PIL import Image

import jax

from visualcloze_tpu.pipeline import VisualClozePipeline, random_components
from visualcloze_tpu.pipeline.diffusers_api import default_layout_prompt


@pytest.fixture(scope="module")
def model():
    return random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                             attn_impl="xla")


def _img(seed, size=64):
    return Image.fromarray(
        np.random.default_rng(seed).integers(0, 256, (size, size, 3), dtype=np.uint8)
    )


def _grid():
    return [[_img(1), _img(2)], [_img(3), None]]


def test_call_matches_process_images(model):
    """pipe(upsampling_strength=s) == model.process_images(
    upsampling_noise=1-s): diffusers' strength is the inverse of the
    reference repo's latent mix weight (ref visualcloze.py:221)."""
    pipe = VisualClozePipeline(model)
    out = pipe(
        task_prompt="each row maps a photo to itself",
        content_prompt="a colorful square",
        image=_grid(),
        upsampling_strength=0.6,   # == reference upsampling_noise 0.4
        upsampling_steps=2,
        num_inference_steps=2,
        guidance_scale=30.0,
        seed=7,
    )
    assert isinstance(out.images, list) and len(out.images) == 1
    got = out.images[0]
    assert len(got) == 1 and isinstance(got[0], Image.Image)

    model.set_grid_size(2, 2)
    want = model.process_images(
        _grid(),
        [default_layout_prompt(2, 2), "each row maps a photo to itself",
         "a colorful square"],
        seed=7, cfg=30.0, steps=2, upsampling_steps=2,
        upsampling_noise=0.4, is_upsampling=True,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


def test_upsampling_size_override(model):
    """upsampling_width/height override the grid-derived SDEdit target
    (PIL (w, h) convention), like the diffusers pipeline args."""
    pipe = VisualClozePipeline(model)
    out = pipe(
        task_prompt="t", content_prompt="c", image=_grid(),
        num_inference_steps=2, upsampling_steps=2, upsampling_strength=0.4,
        upsampling_width=96, upsampling_height=64, seed=3,
    )
    img = out.images[0][0]
    assert (img.width, img.height) == (96, 64)

    with pytest.raises(ValueError, match="both upsampling_width"):
        pipe(task_prompt="t", image=_grid(), num_inference_steps=2,
             upsampling_width=96)


def test_strength_zero_is_plain_resize(model):
    """Diffusers strength=0 means zero denoise steps: the stage still runs
    and honors upsampling dims, returning the plainly-resized stage-1 cell
    (maps to the reference's upsampling_noise >= 1.0 path,
    visualcloze.py:181-182) — strength=0 must NOT skip the resize."""
    pipe = VisualClozePipeline(model)
    kw = dict(task_prompt="t", image=_grid(), num_inference_steps=2,
              upsampling_steps=2, upsampling_width=96, upsampling_height=64,
              seed=3)
    out = pipe(upsampling_strength=0.0, **kw)
    img = out.images[0][0]
    assert (img.width, img.height) == (96, 64)

    # it is exactly the resize of the no-upsampling stage-1 cell
    model.set_grid_size(2, 2)
    base = model.process_images(
        _grid(), [default_layout_prompt(2, 2), "t", ""],
        seed=3, cfg=30.0, steps=2, is_upsampling=False)[0]
    want = base.resize((96, 64))  # pipeline's plain-resize (default resample)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(want))

    # strength=1.0 (the diffusers default) is the full conditional
    # regeneration — runs the denoiser, not the resize
    full = pipe(upsampling_strength=1.0, **kw).images[0][0]
    assert (full.width, full.height) == (96, 64)
    assert np.abs(np.asarray(full, np.float32) -
                  np.asarray(img, np.float32)).max() > 0

    with pytest.raises(ValueError, match="upsampling_strength"):
        pipe(upsampling_strength=1.5, **kw)


def test_as_image_band_normalization():
    """RGBA/grayscale PIL cells and (H,W)/(H,W,4) arrays are normalized to
    RGB like diffusers' load_image."""
    from visualcloze_tpu.pipeline.diffusers_api import _as_image

    rgba = Image.new("RGBA", (8, 8), (10, 20, 30, 128))
    gray = Image.new("L", (8, 8), 77)
    arr_gray = np.full((8, 8), 9, np.uint8)
    arr_rgba = np.zeros((8, 8, 4), np.uint8)
    for cell in (rgba, gray, arr_gray, arr_rgba):
        img = _as_image(cell)
        assert img.mode == "RGB" and img.size == (8, 8)
    assert _as_image(None) is None


def test_generator_and_seed_equivalent(model):
    class FakeGen:  # torch.Generator shape
        def initial_seed(self):
            return 11

    pipe = VisualClozePipeline(model)
    kw = dict(task_prompt="t", content_prompt="c", image=_grid(),
              num_inference_steps=2, upsampling_strength=0.0)
    a = pipe(generator=FakeGen(), **kw).images[0][0]
    b = pipe(seed=11, **kw).images[0][0]
    c = pipe(generator=11, **kw).images[0][0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_runtime_adapter_via_load_lora_weights(model, tmp_path):
    """load_lora_weights(adapter_name=...) registers a runtime adapter that
    changes the output; the base pass is untouched."""
    import torch

    from visualcloze_tpu.models.lora import init_lora, randomize_lora_b
    from visualcloze_tpu.models.weights import lora_to_torch_state

    lora = randomize_lora_b(
        init_lora(jax.random.PRNGKey(5), model.params, rank=2),
        jax.random.PRNGKey(6),
    )
    state = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
             for k, v in lora_to_torch_state(lora, model.cfg).items()}
    path = tmp_path / "task_lora.pth"
    torch.save(state, path)

    pipe = VisualClozePipeline(model)
    pipe.load_lora_weights(path, adapter_name="task")
    kw = dict(task_prompt="t", content_prompt="c", image=_grid(),
              num_inference_steps=2, upsampling_strength=0.0, seed=9)
    base = np.asarray(pipe(**kw).images[0][0], np.float32)
    adapted = np.asarray(pipe(adapter="task", **kw).images[0][0], np.float32)
    assert np.abs(base - adapted).max() > 0
    model.adapters.clear()


def test_input_validation(model):
    pipe = VisualClozePipeline(model)
    with pytest.raises(ValueError, match="same length"):
        pipe(task_prompt="t", image=[[_img(0), None], [_img(1)]],
             num_inference_steps=2)
    with pytest.raises(ValueError, match="max_sequence_length"):
        pipe(task_prompt="t", image=_grid(), max_sequence_length=77,
             num_inference_steps=2)
    with pytest.raises(ValueError, match="image"):
        pipe(task_prompt="t")
    # path / array cells load like diffusers' load_image
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.png")
        _img(1).save(p)
        grid = [[p, np.asarray(_img(2))], [_img(3), None]]
        out = pipe(task_prompt="t", image=grid, num_inference_steps=2,
                   upsampling_strength=0.0, seed=1)
        assert isinstance(out.images[0][0], Image.Image)
