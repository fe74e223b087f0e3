"""Weight converter tests: roundtrips, zero-expansion, diffusers naming."""

import jax
import jax.numpy as jnp
import numpy as np

from visualcloze_tpu.config import AutoEncoderConfig, FluxConfig
from visualcloze_tpu.models.autoencoder import AutoEncoder, init_autoencoder
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.lora import init_lora
from visualcloze_tpu.models.weights import (
    convert_flux,
    convert_lora,
    convert_vae,
    flux_to_torch_state,
    lora_to_torch_state,
    normalize_diffusers_vae_keys,
    vae_to_torch_state,
)

CFG = FluxConfig().tiny()
AE_CFG = AutoEncoderConfig().tiny()


def trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_flux_state_roundtrip():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    state = flux_to_torch_state(params, CFG)
    back = convert_flux(state, CFG)
    trees_equal(params, back)


def test_flux_roundtrip_preserves_forward():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    back = convert_flux(flux_to_torch_state(params, CFG), CFG)
    rng = np.random.default_rng(0)
    inp = dict(
        img=jnp.asarray(rng.standard_normal((1, 8, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, 8, 3)),
        txt=jnp.asarray(rng.standard_normal((1, 4, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, 4, 3)),
        timesteps=jnp.asarray([0.5]),
        y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0]),
    )
    np.testing.assert_allclose(
        np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla")),
        np.asarray(flux_apply(CFG, back, **inp, attn_impl="xla")),
        rtol=1e-6,
    )


def test_img_in_zero_expansion():
    """Fill model (384ch) loads a dev checkpoint (64ch img_in):
    ref models/util.py:456-472."""
    import dataclasses

    narrow_cfg = dataclasses.replace(CFG, in_channels=8)
    params = init_flux(jax.random.PRNGKey(0), narrow_cfg)
    state = flux_to_torch_state(params, narrow_cfg)
    wide = convert_flux(state, CFG)  # CFG.in_channels = 24
    w = np.asarray(wide["img_in"]["w"])
    assert w.shape[0] == CFG.in_channels
    np.testing.assert_allclose(w[:8], np.asarray(params["img_in"]["w"]))
    np.testing.assert_array_equal(w[8:], 0)


def test_lora_state_roundtrip():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    lora = jax.tree.map(
        lambda x: x + jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype) * 0.1, lora
    )
    state = lora_to_torch_state(lora, CFG)
    assert all(".lora_A." in k or ".lora_B." in k for k in state)
    back = convert_lora(state, CFG)
    trees_equal(lora, back)


def test_vae_state_roundtrip():
    params = init_autoencoder(jax.random.PRNGKey(0), AE_CFG)
    state = vae_to_torch_state(params, AE_CFG)
    back = convert_vae(state, AE_CFG)
    trees_equal(params, back)
    # and the converted params actually run
    ae = AutoEncoder(AE_CFG, back)
    x = jnp.zeros((1, 16, 16, 3))
    z = ae.encode(x, sample=False)
    assert z.shape[-1] == AE_CFG.z_channels


def test_diffusers_vae_key_normalization():
    keys = {
        "encoder.down_blocks.0.resnets.0.norm1.weight": np.zeros(1),
        "encoder.down_blocks.0.downsamplers.0.conv.weight": np.zeros(1),
        "encoder.mid_block.resnets.0.conv1.weight": np.zeros(1),
        "encoder.mid_block.attentions.0.to_q.weight": np.zeros((4, 4)),
        "encoder.conv_norm_out.weight": np.zeros(1),
        "decoder.up_blocks.0.resnets.1.conv_shortcut.weight": np.zeros(1),
        "decoder.up_blocks.1.upsamplers.0.conv.weight": np.zeros(1),
    }
    out = normalize_diffusers_vae_keys(keys)
    assert "encoder.down.0.block.0.norm1.weight" in out
    assert "encoder.down.0.downsample.conv.weight" in out
    assert "encoder.mid.block_1.conv1.weight" in out
    assert "encoder.mid.attn_1.q.weight" in out
    assert "encoder.norm_out.weight" in out
    # diffusers decoder up_blocks run high->low res; BFL indexes up[0]=lowest?
    # two up levels here: diffusers index 0 -> bfl index 1, 1 -> 0
    assert "decoder.up.1.block.1.nin_shortcut.weight" in out
    assert "decoder.up.0.upsample.conv.weight" in out
