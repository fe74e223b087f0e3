"""VAE tests: shapes, conv/groupnorm semantics vs torch (independent oracle),
and encode/decode plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from visualcloze_tpu.config import AutoEncoderConfig
from visualcloze_tpu.models.autoencoder import (
    AutoEncoder,
    attn_block,
    conv2d,
    diagonal_gaussian,
    downsample,
    group_norm,
    init_autoencoder,
    upsample,
)

CFG = AutoEncoderConfig().tiny()


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    got = conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    want = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),  # HWIO -> OIHW
        torch.from_numpy(b),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_downsample_matches_torch_asymmetric_pad():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 9, 7, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    b = np.zeros((4,), np.float32)
    got = downsample({"conv": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}, jnp.asarray(x))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (0, 1, 0, 1))
    want = F.conv2d(
        xt, torch.from_numpy(w.transpose(3, 2, 0, 1)), torch.from_numpy(b), stride=2
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    c, groups = 8, 4
    x = rng.standard_normal((2, 5, 6, c)).astype(np.float32)
    scale = rng.standard_normal((c,)).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)
    got = group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x), groups=groups
    )
    want = F.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), groups,
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_upsample_nearest():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0  # identity conv
    out = upsample({"conv": {"w": jnp.asarray(w), "b": jnp.zeros((1,))}}, x)
    want = np.repeat(np.repeat(np.asarray(x), 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(out), want)


def test_autoencoder_shapes_and_determinism():
    params = init_autoencoder(jax.random.PRNGKey(0), CFG)
    ae = AutoEncoder(CFG, params)
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (1, 32, 48, 3)).astype(np.float32))
    f = CFG.downsample_factor
    z = ae.encode(x, sample=False)
    assert z.shape == (1, 32 // f, 48 // f, CFG.z_channels)
    y = ae.decode(z)
    assert y.shape == x.shape
    # mode (sample=False) is deterministic; sampling differs per key
    z2 = ae.encode(x, sample=False)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    zs1 = ae.encode(x, key=jax.random.PRNGKey(1))
    zs2 = ae.encode(x, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(zs1) - np.asarray(zs2)).max() > 0


def test_diagonal_gaussian_moments():
    mean = np.full((1, 2, 2, 3), 5.0, np.float32)
    logvar = np.full((1, 2, 2, 3), -100.0, np.float32)  # ~zero std
    z = np.concatenate([mean, logvar], axis=-1)
    out = diagonal_gaussian(jnp.asarray(z), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), mean, atol=1e-4)


def test_latent_scaling_roundtrip():
    params = init_autoencoder(jax.random.PRNGKey(0), CFG)
    ae = AutoEncoder(CFG, params)
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    z_scaled = ae.encode(x, sample=False)
    # invert the pipeline normalization and re-apply by hand
    from visualcloze_tpu.models.autoencoder import encoder_apply

    moments = encoder_apply(CFG, params["encoder"], x)
    mean = np.split(np.asarray(moments), 2, axis=-1)[0]
    want = (mean - CFG.shift_factor) * CFG.scale_factor
    np.testing.assert_allclose(np.asarray(z_scaled), want, rtol=1e-5, atol=1e-6)


def test_attn_block_residual_identity_when_proj_zero():
    c = 8
    rng = np.random.default_rng(5)
    p = {
        "norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "q": {"w": jnp.asarray(rng.standard_normal((1, 1, c, c)).astype(np.float32)), "b": jnp.zeros((c,))},
        "k": {"w": jnp.asarray(rng.standard_normal((1, 1, c, c)).astype(np.float32)), "b": jnp.zeros((c,))},
        "v": {"w": jnp.asarray(rng.standard_normal((1, 1, c, c)).astype(np.float32)), "b": jnp.zeros((c,))},
        "proj_out": {"w": jnp.zeros((1, 1, c, c)), "b": jnp.zeros((c,))},
    }
    x = jnp.asarray(rng.standard_normal((1, 4, 4, c)).astype(np.float32))
    out = attn_block(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
