"""Half-RoPE layout equivalence: permuted weights + apply_rope_half must give
the same model outputs as the reference interleaved layout."""

import jax
import jax.numpy as jnp
import numpy as np

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.weights import permute_rope_layout
from visualcloze_tpu.ops.rope import apply_rope, apply_rope_half, rope_table

CFG = FluxConfig().tiny()


def test_apply_rope_half_matches_on_permuted_channels():
    rng = np.random.default_rng(0)
    b, h, L, d = 1, 2, 8, 16
    x = rng.standard_normal((b, h, L, d)).astype(np.float32)
    pos = rng.integers(0, 20, (b, L)).astype(np.float32)
    cos, sin = rope_table(jnp.asarray(pos), d, 10_000)
    cos, sin = cos[:, None], sin[:, None]

    ref = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    x_half = x[..., perm]
    got = np.asarray(apply_rope_half(jnp.asarray(x_half), cos, sin))
    np.testing.assert_allclose(got, ref[..., perm], rtol=1e-6, atol=1e-6)


def test_flux_half_layout_equivalence():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    permuted = permute_rope_layout(params, CFG)
    rng = np.random.default_rng(1)
    b, l_img, l_txt = 1, 12, 6
    inp = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, CFG.in_channels)), jnp.float32),
        img_ids=jnp.asarray(rng.integers(0, 5, (b, l_img, 3)), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        timesteps=jnp.asarray([0.4], jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0], jnp.float32),
    )
    ref = flux_apply(CFG, params, **inp, attn_impl="xla", rope_layout="interleaved")
    got = flux_apply(CFG, permuted, **inp, attn_impl="xla", rope_layout="half")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flux_half_layout_equivalence_with_mask():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    permuted = permute_rope_layout(params, CFG)
    rng = np.random.default_rng(2)
    b, l_img, l_txt = 1, 10, 4
    mask = jnp.asarray(np.array([[1] * 7 + [0] * 3]), jnp.int32)
    inp = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((b, l_img, 3), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        timesteps=jnp.asarray([0.7], jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0], jnp.float32),
        img_mask=mask,
    )
    ref = flux_apply(CFG, params, **inp, attn_impl="xla", rope_layout="interleaved")
    got = flux_apply(CFG, permuted, **inp, attn_impl="xla", rope_layout="half")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
