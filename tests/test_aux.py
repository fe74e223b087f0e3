"""Tests for auxiliary components: BFL API client validation, image
embedders, watermark, BFL prepare_* packers, likelihood ODE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from visualcloze_tpu.config import AutoEncoderConfig, CLIPTextConfig, T5Config
from visualcloze_tpu.models.api import ApiException, ImageRequest
from visualcloze_tpu.models.autoencoder import AutoEncoder, init_autoencoder
from visualcloze_tpu.models.image_embedders import (
    CannyImageEncoder,
    ReduxImageEncoder,
    convert_redux,
    init_redux_projector,
    redux_project,
)
from visualcloze_tpu.models.postprocess import (
    embed_watermark,
    extract_watermark_score,
    save_image,
)
from visualcloze_tpu.models.sampling import prepare_fill, prepare_redux
from visualcloze_tpu.transport.sampling import sample_ode_likelihood


# ----------------------------- API client -----------------------------

def test_api_request_validation():
    with pytest.raises(ValueError):
        ImageRequest("x", name="nope", launch=False)
    with pytest.raises(ValueError):
        ImageRequest("x", width=100, launch=False)  # not /32
    with pytest.raises(ValueError):
        ImageRequest("x", width=2048, launch=False)  # out of range
    with pytest.raises(ValueError):
        ImageRequest("x", num_steps=100, launch=False)
    with pytest.raises(ValueError):
        ImageRequest("x", guidance=10.0, launch=False)
    with pytest.raises(ValueError):
        ImageRequest("x", name="flux.1.1-pro", interval=2.0, launch=False)
    req = ImageRequest("a cat", width=512, height=512, num_steps=30, launch=False)
    assert req.request_json["width"] == 512
    assert "interval" not in req.request_json


def test_api_exception_repr():
    e = ApiException(404, "not found")
    assert "404" in repr(e)


# ----------------------------- embedders -----------------------------

def test_canny_encoder():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    out = CannyImageEncoder()(img)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= -1 and float(out.max()) <= 1


def test_redux_projector_and_converter():
    params = init_redux_projector(jax.random.PRNGKey(0), redux_dim=16, txt_dim=8)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal((1, 5, 16)), jnp.float32)
    out = redux_project(params, feats)
    assert out.shape == (1, 5, 8)
    # converter roundtrip via torch-style naming
    state = {
        "redux_up.weight": np.asarray(params["redux_up"]["w"]).T,
        "redux_up.bias": np.asarray(params["redux_up"]["b"]),
        "redux_down.weight": np.asarray(params["redux_down"]["w"]).T,
        "redux_down.bias": np.asarray(params["redux_down"]["b"]),
    }
    back = convert_redux(state)
    out2 = redux_project(back, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)
    enc = ReduxImageEncoder(params)
    np.testing.assert_allclose(np.asarray(enc(feats)), np.asarray(out), rtol=1e-5, atol=1e-6)
    with pytest.raises(RuntimeError):
        enc(Image.new("RGB", (8, 8)))


# ----------------------------- watermark -----------------------------

def test_watermark_embed_and_extract():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    base_score = extract_watermark_score(img)
    marked = embed_watermark(img)
    score = extract_watermark_score(marked)
    assert score > 0.9 > base_score + 0.25
    # perceptually small change
    assert np.abs(marked.astype(int) - img.astype(int)).mean() < 4


def test_save_image_nsfw_gate(tmp_path):
    img = Image.new("RGB", (64, 64), (100, 50, 20))
    path = save_image(img, str(tmp_path / "a.png"), nsfw_classifier=lambda im: 0.99)
    assert path is None
    path = save_image(img, str(tmp_path / "b.png"), nsfw_classifier=lambda im: 0.01)
    assert path and (tmp_path / "b.png").exists()


# ----------------------------- BFL packers -----------------------------

@pytest.fixture(scope="module")
def tiny_stack():
    ae_cfg = AutoEncoderConfig().tiny()
    ae = AutoEncoder(ae_cfg, init_autoencoder(jax.random.PRNGKey(0), ae_cfg))

    def t5(prompts):
        return jnp.zeros((len(prompts), 6, 32))

    def clip(prompts):
        return jnp.zeros((len(prompts), 8))

    return ae, t5, clip


def test_prepare_fill_shapes(tiny_stack):
    ae, t5, clip = tiny_stack
    H = W = 32
    img = jnp.zeros((1, H // 8, W // 8, ae.cfg.z_channels))
    cond = np.zeros((H, W, 3), np.float32)
    mask = np.ones((H, W), np.float32)
    out = prepare_fill(t5, clip, img, "p", ae, cond, mask, jax.random.PRNGKey(0))
    L = (H // 16) * (W // 16)
    assert out["img"].shape == (1, L, 4 * ae.cfg.z_channels)
    assert out["img_cond"].shape == (1, L, 4 * ae.cfg.z_channels + 256)


def test_prepare_redux_appends_tokens(tiny_stack):
    ae, t5, clip = tiny_stack
    img = jnp.zeros((1, 4, 4, ae.cfg.z_channels))

    def encoder(x):
        return jnp.ones((1, 3, 32))

    out = prepare_redux(t5, clip, img, "p", encoder, None)
    assert out["txt"].shape == (1, 6 + 3, 32)
    assert out["txt_ids"].shape == (1, 9, 3)


# ----------------------------- likelihood -----------------------------

def test_likelihood_linear_field_analytic():
    """v(x) = a*x: logp == prior(x_T) + a * N (divergence is exact for a
    linear field under Hutchinson with Rademacher probes)."""
    a = 0.3
    n_steps = 11

    def model_fn(img, timesteps):
        return a * img

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4)), jnp.float32)
    logp, xT = sample_ode_likelihood(model_fn, jax.random.PRNGKey(1), x0, n_steps, {})
    n = 12
    prior = -0.5 * n * np.log(2 * np.pi) - 0.5 * np.sum(
        np.asarray(xT) ** 2, axis=(1, 2)
    )
    want = prior + a * n  # integral of div over t in [0, 1]
    np.testing.assert_allclose(np.asarray(logp), want, rtol=1e-4)


@pytest.mark.slow
def test_prepare_control_with_native_depth_tower(tiny_stack):
    """BFL prepare_control end-to-end with the native DepthAnything tower as
    the control encoder (the towers ARE the encoder callables)."""
    import torch
    from PIL import Image

    from visualcloze_tpu.models.image_embedders import DepthImageEncoder
    from visualcloze_tpu.models.sampling import prepare_control
    from visualcloze_tpu.models.vision_towers import (
        DepthAnythingTowerConfig,
        convert_depth_anything,
    )
    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    ae, t5, clip = tiny_stack
    cfg = DepthAnythingTowerConfig().tiny()
    bb = Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        out_indices=list(cfg.out_indices),
        out_features=[f"stage{i}" for i in cfg.out_indices],
        reshape_hidden_states=False,
    )
    torch.manual_seed(0)
    hf = DepthAnythingForDepthEstimation(DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=cfg.fusion_hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        head_hidden_size=cfg.head_hidden_size,
        reassemble_hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
    ))
    params = convert_depth_anything(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg
    )
    encoder = DepthImageEncoder(params=params, cfg=cfg)

    H = W = 32
    img = jnp.zeros((1, H // 8, W // 8, ae.cfg.z_channels))
    pil = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (H, W, 3), dtype=np.uint8)
    )
    out = prepare_control(t5, clip, img, "p", ae, encoder, pil, jax.random.PRNGKey(0))
    L = (H // 16) * (W // 16)
    assert out["img_cond"].shape == (1, L, 4 * ae.cfg.z_channels)
    assert np.isfinite(np.asarray(out["img_cond"], np.float32)).all()


def test_host_fingerprint_parses_arm_features(monkeypatch, tmp_path):
    """arm64 /proc/cpuinfo spells the ISA line 'Features' — hosts with
    different feature sets must land in different AOT cache namespaces
    (x86-only 'flags' parsing collapsed them all into one)."""
    import builtins

    from visualcloze_tpu.utils import cache as vc_cache

    real_open = builtins.open

    def fake_cpuinfo(text):
        def _open(path, *a, **kw):
            if path == "/proc/cpuinfo":
                f = tmp_path / "cpuinfo"
                f.write_text(text)
                return real_open(f, *a, **kw)
            return real_open(path, *a, **kw)
        return _open

    monkeypatch.setattr(builtins, "open", fake_cpuinfo(
        "processor : 0\nFeatures : fp asimd evtstrm aes\n"))
    a = vc_cache._host_fingerprint("cpu")
    monkeypatch.setattr(builtins, "open", fake_cpuinfo(
        "processor : 0\nFeatures : fp asimd sve2\n"))
    b = vc_cache._host_fingerprint("cpu")
    assert a.startswith("cpu-") and b.startswith("cpu-") and a != b
    assert "unknown" not in a

    # no parseable cpuinfo at all: still a machine-specific namespace, not a
    # shared "cpu-unknown" bucket that would cross-load foreign-ISA code
    def _deny(path, *a, **kw):
        if path == "/proc/cpuinfo":
            raise OSError("no cpuinfo")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", _deny)
    c = vc_cache._host_fingerprint("cpu")
    assert c.startswith("cpu-") and c != "cpu-unknown"
    assert vc_cache._host_fingerprint("tpu") == "tpu"
