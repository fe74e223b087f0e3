"""Vision-tower oracles: native JAX SigLIP / DepthAnything vs transformers-
constructed tiny models (random init, no downloads)."""

import numpy as np
import pytest
import torch

from visualcloze_tpu.models.vision_towers import (
    DepthAnythingTowerConfig,
    SigLIPVisionConfig,
    convert_depth_anything,
    convert_siglip_vision,
    depth_anything_apply,
    interpolate_bilinear,
    siglip_encode,
)

import jax.numpy as jnp


def _state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(14, 10), (3, 7), (16, 16)])
def test_interpolate_bilinear_matches_torch(align_corners, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    got = np.asarray(interpolate_bilinear(jnp.asarray(x), size, align_corners))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=size,
        mode="bilinear", align_corners=align_corners,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_siglip_vision_matches_transformers():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = SigLIPVisionConfig().tiny()
    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    params = convert_siglip_vision(_state(model), cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(siglip_encode(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def _make_hf_depth_anything(cfg, seed=0, energize=True):
    """transformers tiny DepthAnything. energize=True rescales the random
    init (unit layer scales, wider convs) so activations — and the ReLU'd
    predicted depth — are non-trivial; without it the random model outputs
    ~1e-8 and an activation-diff oracle is vacuous."""
    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    bb = Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        out_indices=list(cfg.out_indices),
        out_features=[f"stage{i}" for i in cfg.out_indices],
        reshape_hidden_states=False,
    )
    hf_cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=cfg.fusion_hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        head_hidden_size=cfg.head_hidden_size,
        reassemble_hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
    )
    torch.manual_seed(seed)
    model = DepthAnythingForDepthEstimation(hf_cfg).eval()
    if energize:
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "lambda1" in name:
                    p.fill_(1.0)
                elif ("neck" in name or "head" in name) and p.dim() >= 2:
                    p.mul_(12.0)
    return model


@pytest.mark.slow
def test_depth_anything_matches_transformers():
    cfg = DepthAnythingTowerConfig().tiny()
    model = _make_hf_depth_anything(cfg)
    params = convert_depth_anything(_state(model), cfg)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    assert np.abs(want).mean() > 1e-2  # oracle must be non-vacuous
    got = np.asarray(depth_anything_apply(cfg, params, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * float(np.abs(want).max()))


def test_depth_anything_preprocess_matches_dpt_processor():
    """keep_aspect_ratio semantics: the per-axis scale closest to 1 wins
    (HF DPTImageProcessor); small images must NOT be blown up 4x."""
    from PIL import Image

    from visualcloze_tpu.models.vision_towers import depth_anything_preprocess

    small = Image.new("RGB", (200, 100))  # (w, h)
    out = depth_anything_preprocess(small, target=518, multiple=14)
    assert out.shape[1:3] == (252, 518)  # scale 2.59 (=518/200), not 5.18
    big = Image.new("RGB", (1036, 1036))
    out2 = depth_anything_preprocess(big, target=518, multiple=14)
    assert out2.shape[1:3] == (518, 518)


def test_depth_anything_pos_embed_interpolation_runs():
    """Inputs bigger than the pretraining grid trigger bicubic pos-embed
    interpolation; the forward must still produce the full-res map."""
    import jax

    cfg = DepthAnythingTowerConfig().tiny()
    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    bb = Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        out_indices=list(cfg.out_indices),
        out_features=[f"stage{i}" for i in cfg.out_indices],
        reshape_hidden_states=False,
    )
    hf_cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=cfg.fusion_hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        head_hidden_size=cfg.head_hidden_size,
        reassemble_hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(hf_cfg).eval()
    params = convert_depth_anything(_state(model), cfg)
    big = cfg.image_size * 2
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, big, big, 3)), jnp.float32)
    out = depth_anything_apply(cfg, params, x)
    assert out.shape == (1, big, big)
    assert bool(jax.numpy.isfinite(out).all())


def test_depth_image_encoder_with_native_tower():
    """End-to-end DepthImageEncoder: PIL -> [-1,1] 3-channel depth map via the
    native tiny tower (params injected, no env/checkpoint)."""
    import jax
    from PIL import Image

    from visualcloze_tpu.models.image_embedders import DepthImageEncoder
    from visualcloze_tpu.models.vision_towers import convert_depth_anything

    cfg = DepthAnythingTowerConfig().tiny()
    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    bb = Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        out_indices=list(cfg.out_indices),
        out_features=[f"stage{i}" for i in cfg.out_indices],
        reshape_hidden_states=False,
    )
    hf_cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=cfg.fusion_hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        head_hidden_size=cfg.head_hidden_size,
        reassemble_hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
    )
    torch.manual_seed(1)
    params = convert_depth_anything(
        _state(DepthAnythingForDepthEstimation(hf_cfg)), cfg
    )
    enc = DepthImageEncoder(params=params, cfg=cfg)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (60, 80, 3), dtype=np.uint8)
    )
    out = np.asarray(enc(img))
    assert out.shape == (1, 60, 80, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_redux_encoder_with_native_siglip():
    import jax
    from PIL import Image

    from visualcloze_tpu.models.image_embedders import (
        ReduxImageEncoder,
        init_redux_projector,
    )
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel

    cfg = SigLIPVisionConfig().tiny()
    torch.manual_seed(2)
    siglip_params = convert_siglip_vision(
        _state(SiglipVisionModel(HFCfg(
            hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
            image_size=cfg.image_size, patch_size=cfg.patch_size,
        ))), cfg
    )
    proj = init_redux_projector(jax.random.PRNGKey(0), redux_dim=cfg.hidden_size, txt_dim=16)
    enc = ReduxImageEncoder(proj, siglip_params=siglip_params, siglip_cfg=cfg)
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (50, 50, 3), dtype=np.uint8)
    )
    out = np.asarray(enc(img))
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    assert out.shape == (1, n_patches, 16)
    assert np.isfinite(out).all()


def test_vit_classifier_matches_transformers_and_nsfw_gate():
    from transformers import ViTConfig, ViTForImageClassification

    from visualcloze_tpu.models.postprocess import build_nsfw_classifier, save_image
    from visualcloze_tpu.models.vision_towers import (
        ViTClassifierConfig,
        convert_vit_classifier,
        vit_classify,
    )

    cfg = ViTClassifierConfig().tiny()
    torch.manual_seed(3)
    model = ViTForImageClassification(ViTConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        num_labels=cfg.num_labels,
    )).eval()
    params = convert_vit_classifier(_state(model), cfg)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(vit_classify(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    # gate behavior through save_image with the native classifier
    import tempfile, os
    from PIL import Image

    clf = build_nsfw_classifier(params=params, cfg=cfg)
    img = Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    p = clf(img)
    assert 0.0 <= p <= 1.0
    with tempfile.TemporaryDirectory() as d:
        out = save_image(img, os.path.join(d, "x.png"),
                         nsfw_classifier=clf, nsfw_threshold=1.1)
        assert out is not None and os.path.exists(out)
        blocked = save_image(img, os.path.join(d, "y.png"),
                             nsfw_classifier=clf, nsfw_threshold=-0.1)
        assert blocked is None


def test_build_nsfw_classifier_none_without_weights(monkeypatch):
    from visualcloze_tpu.models.postprocess import build_nsfw_classifier

    monkeypatch.delenv("NSFW_MODEL_PATH", raising=False)
    assert build_nsfw_classifier() is None
