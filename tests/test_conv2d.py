"""conv3x3_fused Pallas kernel vs the XLA conv oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.models.autoencoder import (
    conv2d,
    group_norm,
    group_norm_affine,
    swish,
)
from visualcloze_tpu.ops.conv2d import conv3x3_fused, fusable


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 20, 128, 128), (1, 8, 7, 128, 256), (2, 12, 10, 256, 128)],
)
def test_conv3x3_fused_matches_xla(shape):
    B, H, W, C, Co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)

    ref = conv2d({"w": w, "b": b}, x)
    got = conv3x3_fused(x, w, b, act="none", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv3x3_fused_gn_swish_residual():
    """Fused pre-affine path == groupnorm -> swish -> conv -> +residual,
    including the conv-side zero padding (activation must NOT leak into the
    pad border: swish(b0) != 0)."""
    B, H, W, C, Co = 2, 16, 20, 128, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)
    gn = {
        "scale": jnp.asarray(rng.standard_normal((C,)) * 0.3 + 1, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((C,)) * 0.2, jnp.float32),
    }
    resid = jnp.asarray(rng.standard_normal((B, H, W, Co)), jnp.float32)

    ref = conv2d({"w": w, "b": b}, swish(group_norm(gn, x))) + resid
    a, bb = group_norm_affine(gn, x)
    got = conv3x3_fused(
        x, w, b, pre_affine=(a, bb), residual=resid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv3x3_fused_column_tiled():
    """Wide shapes take the 4-spec column-tiled path (right/bottom/corner
    halos); exact vs the XLA conv including the activation-side pad mask."""
    from visualcloze_tpu.ops.conv2d import _pick_bw

    B, H, W, C, Co = 1, 8, 1152, 256, 256
    assert _pick_bw(W, C, Co, 4) is not None  # actually tiles columns
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)
    gn = {
        "scale": jnp.asarray(rng.standard_normal((C,)) * 0.3 + 1, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((C,)) * 0.2, jnp.float32),
    }
    ref = conv2d({"w": w, "b": b}, swish(group_norm(gn, x)))
    a, bb = group_norm_affine(gn, x)
    got = conv3x3_fused(x, w, b, pre_affine=(a, bb), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    B, H, W, C = 2, 6, 5, 64
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    gn = torch.nn.GroupNorm(32, C, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_fusable_gate():
    x = jnp.zeros((1, 16, 20, 128))
    w = jnp.zeros((3, 3, 128, 128))
    assert fusable(x, w)
    assert not fusable(jnp.zeros((1, 16, 20, 96)), jnp.zeros((3, 3, 96, 128)))
    assert not fusable(jnp.zeros((1, 15, 20, 128)), w)  # odd H
    # W*C beyond the full-width scoped-vmem budget takes the column-tiled path
    assert fusable(jnp.zeros((1, 384, 1152, 256)), jnp.zeros((3, 3, 256, 256)))
    # prime W with no 8-multiple divisor >= 128 cannot tile columns
    assert not fusable(jnp.zeros((1, 8, 1154, 512)), jnp.zeros((3, 3, 512, 512)))
