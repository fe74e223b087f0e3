"""Tests for the functional Flux DiT: shapes, masking semantics, LoRA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, flux_apply_cfg, init_flux, param_count
from visualcloze_tpu.models.lora import fold_lora, init_lora

CFG = FluxConfig().tiny()


def make_inputs(b=2, l_img=16, l_txt=8, seed=0, cfg=CFG):
    rng = np.random.default_rng(seed)
    return dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, cfg.in_channels)), jnp.float32),
        img_ids=jnp.asarray(rng.integers(0, 6, (b, l_img, 3)), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, cfg.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        timesteps=jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32),
        guidance=jnp.full((b,), 4.0, jnp.float32),
    )


@pytest.fixture(scope="module")
def params():
    return init_flux(jax.random.PRNGKey(0), CFG)


def test_forward_shape_and_finite(params):
    inp = make_inputs()
    out = flux_apply(CFG, params, **inp, attn_impl="xla")
    assert out.shape == (2, 16, CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_param_count_matches_topology(params):
    h, mh, d = CFG.hidden_size, CFG.mlp_hidden_dim, CFG.head_dim
    dbl = 2 * (h * 6 * h + 6 * h) + 2 * (h * 3 * h + 3 * h + h * h + h + 2 * d) + 2 * (
        h * mh + mh + mh * h + h
    )
    sgl = h * (3 * h + mh) + 3 * h + mh + (h + mh) * h + h + 2 * d + h * 3 * h + 3 * h
    expected = (
        CFG.in_channels * h + h
        + CFG.context_in_dim * h + h
        + 2 * (256 * h + h + h * h + h)  # time_in + guidance_in
        + CFG.vec_in_dim * h + h + h * h + h  # vector_in
        + CFG.depth * dbl
        + CFG.depth_single_blocks * sgl
        + h * CFG.out_channels + CFG.out_channels + h * 2 * h + 2 * h
    )
    assert param_count(params) == expected


def test_padding_tokens_do_not_affect_valid_outputs(params):
    """Masked (padded) img tokens must not influence valid positions — the
    contract the reference gets from varlen unpadding (models/math.py:63-99)."""
    inp = make_inputs(b=1, l_img=12)
    img_mask = jnp.asarray(np.array([[1] * 8 + [0] * 4]), jnp.int32)
    out1 = flux_apply(CFG, params, **inp, img_mask=img_mask, attn_impl="xla")

    # scramble padded tokens
    inp2 = dict(inp)
    img2 = np.asarray(inp["img"]).copy()
    img2[:, 8:] = 99.0
    inp2["img"] = jnp.asarray(img2)
    out2 = flux_apply(CFG, params, **inp2, img_mask=img_mask, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out1[:, :8]), np.asarray(out2[:, :8]), atol=1e-5)


def test_batch_padding_matches_unpadded(params):
    """A sample padded out to a longer sequence gives the same valid outputs
    as the unpadded run (static-shape bucketing correctness)."""
    inp = make_inputs(b=1, l_img=8)
    out_short = flux_apply(CFG, params, **inp, attn_impl="xla")

    pad = 6
    inp_l = dict(inp)
    inp_l["img"] = jnp.pad(inp["img"], ((0, 0), (0, pad), (0, 0)))
    inp_l["img_ids"] = jnp.pad(inp["img_ids"], ((0, 0), (0, pad), (0, 0)))
    mask = jnp.asarray(np.array([[1] * 8 + [0] * pad]), jnp.int32)
    out_long = flux_apply(CFG, params, **inp_l, img_mask=mask, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_short), np.asarray(out_long[:, :8]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_zero_init_lora_is_identity(params):
    inp = make_inputs()
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    base = flux_apply(CFG, params, **inp, attn_impl="xla")
    with_lora = flux_apply(CFG, params, **inp, lora=lora, lora_scale=1.0, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


@pytest.mark.slow
def test_lora_fold_matches_runtime_application(params):
    inp = make_inputs()
    lora = init_lora(jax.random.PRNGKey(2), params, rank=4)
    # make B nonzero so LoRA actually does something
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype), lora
    )
    runtime = flux_apply(CFG, params, **inp, lora=lora, lora_scale=0.7, attn_impl="xla")
    folded = fold_lora(params, lora, scale=0.7)
    merged = flux_apply(CFG, folded, **inp, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(runtime), np.asarray(merged), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_lora_rank_clamped(params):
    lora = init_lora(jax.random.PRNGKey(1), params, rank=1024)
    # final layer linear is (hidden, out_channels): rank clamps to out_channels
    assert lora["final_layer"]["linear"]["a"].shape[-1] == CFG.out_channels


def test_cfg_forward(params):
    inp = make_inputs(b=2)
    out = flux_apply_cfg(CFG, params, cfg_scale=2.0, **inp, attn_impl="xla")
    assert out.shape == (2, 16, CFG.out_channels)
    # guided = uncond + s*(cond - uncond); both halves of output equal guided/uncond
    plain = flux_apply(CFG, params, **inp, attn_impl="xla")
    cond, uncond = np.split(np.asarray(plain), 2, axis=0)
    want = uncond + 2.0 * (cond - uncond)
    np.testing.assert_allclose(np.asarray(out)[0], want[0], rtol=1e-4, atol=1e-5)


def test_remat_matches(params):
    inp = make_inputs(b=1)
    out = flux_apply(CFG, params, **inp, attn_impl="xla")
    out_r = flux_apply(CFG, params, **inp, attn_impl="xla", remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)


def test_guidance_required_when_embedded(params):
    inp = make_inputs()
    inp.pop("guidance")
    with pytest.raises(ValueError):
        flux_apply(CFG, params, **inp, attn_impl="xla")


def test_capture_activations_matches_plain_forward():
    """capture_activations returns per-block residual streams without
    perturbing the output (the activation-diff harness seam, SURVEY §7)."""
    import jax
    import jax.numpy as jnp

    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import flux_apply, init_flux

    cfg = FluxConfig().tiny()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    b, l_img, l_txt = 1, 16, 8
    kwargs = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, cfg.in_channels)), jnp.float32),
        img_ids=jnp.zeros((b, l_img, 3), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, cfg.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        timesteps=jnp.full((b,), 0.5, jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32),
        guidance=jnp.full((b,), 4.0, jnp.float32),
    )
    want = flux_apply(cfg, params, attn_impl="xla", **kwargs)
    out, acts = flux_apply(cfg, params, attn_impl="xla", capture_activations=True, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6, atol=1e-6)
    assert acts["double_img"].shape == (cfg.depth, b, l_img, cfg.hidden_size)
    assert acts["double_txt"].shape == (cfg.depth, b, l_txt, cfg.hidden_size)
    assert acts["single"].shape == (
        cfg.depth_single_blocks, b, l_txt + l_img, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(acts["out"]), np.asarray(out))
