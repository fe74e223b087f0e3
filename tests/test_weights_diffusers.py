"""Diffusers-format FLUX transformer / LoRA converter tests.

The released VisualCloze checkpoints are diffusers-first
(ref README.md:140-198): VisualClozePipeline-384/-512 full transformers and
VisualClozePipeline-LoRA-384/-512 peft-style safetensors. These tests prove
the diffusers-naming path loads bit-for-bit what the BFL-naming path loads,
against an independent torch re-statement of diffusers' own published
conversion semantics (chunk/cat of the fused projections, scale/shift swap
on the final modulation).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.lora import fold_lora, init_lora
from visualcloze_tpu.models.weights import (
    convert_flux,
    convert_flux_diffusers,
    convert_lora_diffusers,
    flux_to_diffusers_state,
    flux_to_torch_state,
    is_diffusers_flux_state,
    is_diffusers_lora_state,
    lora_to_diffusers_state,
    lora_to_torch_state,
    normalize_diffusers_flux_keys,
)

CFG = FluxConfig().tiny()


def trees_equal(a, b, rtol=1e-6):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol)


def bfl_to_diffusers_torch_oracle(bfl: dict, cfg: FluxConfig) -> dict:
    """Independent torch re-statement of diffusers' BFL->diffusers conversion
    (scripts/convert_flux_to_diffusers.py semantics): torch chunk/cat on the
    fused projections, [shift,scale]->[scale,shift] swap on the final
    modulation. Deliberately NOT built on the library's key tables."""
    import torch

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in bfl.items()}
    out = {}

    def put(dst, src):
        out[dst + ".weight"] = t[src + ".weight"]
        if src + ".bias" in t:
            out[dst + ".bias"] = t[src + ".bias"]

    put("x_embedder", "img_in")
    put("context_embedder", "txt_in")
    put("time_text_embed.timestep_embedder.linear_1", "time_in.in_layer")
    put("time_text_embed.timestep_embedder.linear_2", "time_in.out_layer")
    put("time_text_embed.text_embedder.linear_1", "vector_in.in_layer")
    put("time_text_embed.text_embedder.linear_2", "vector_in.out_layer")
    if cfg.guidance_embed:
        put("time_text_embed.guidance_embedder.linear_1", "guidance_in.in_layer")
        put("time_text_embed.guidance_embedder.linear_2", "guidance_in.out_layer")
    put("proj_out", "final_layer.linear")
    for suffix in ("weight", "bias"):
        shift, scale = t[f"final_layer.adaLN_modulation.1.{suffix}"].chunk(2, dim=0)
        out[f"norm_out.linear.{suffix}"] = torch.cat([scale, shift], dim=0)

    for i in range(cfg.depth):
        b, d = f"double_blocks.{i}", f"transformer_blocks.{i}"
        put(f"{d}.norm1.linear", f"{b}.img_mod.lin")
        put(f"{d}.norm1_context.linear", f"{b}.txt_mod.lin")
        for stream, names in (
            ("img_attn", ("attn.to_q", "attn.to_k", "attn.to_v")),
            ("txt_attn", ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj")),
        ):
            for suffix in ("weight", "bias"):
                qs = t[f"{b}.{stream}.qkv.{suffix}"].chunk(3, dim=0)
                for name, q in zip(names, qs):
                    out[f"{d}.{name}.{suffix}"] = q
        put(f"{d}.attn.to_out.0", f"{b}.img_attn.proj")
        put(f"{d}.attn.to_add_out", f"{b}.txt_attn.proj")
        put(f"{d}.ff.net.0.proj", f"{b}.img_mlp.0")
        put(f"{d}.ff.net.2", f"{b}.img_mlp.2")
        put(f"{d}.ff_context.net.0.proj", f"{b}.txt_mlp.0")
        put(f"{d}.ff_context.net.2", f"{b}.txt_mlp.2")
        out[f"{d}.attn.norm_q.weight"] = t[f"{b}.img_attn.norm.query_norm.scale"]
        out[f"{d}.attn.norm_k.weight"] = t[f"{b}.img_attn.norm.key_norm.scale"]
        out[f"{d}.attn.norm_added_q.weight"] = t[f"{b}.txt_attn.norm.query_norm.scale"]
        out[f"{d}.attn.norm_added_k.weight"] = t[f"{b}.txt_attn.norm.key_norm.scale"]

    h = cfg.hidden_size
    for i in range(cfg.depth_single_blocks):
        b, d = f"single_blocks.{i}", f"single_transformer_blocks.{i}"
        put(f"{d}.norm.linear", f"{b}.modulation.lin")
        put(f"{d}.proj_out", f"{b}.linear2")
        for suffix in ("weight", "bias"):
            fused = t[f"{b}.linear1.{suffix}"]
            q, k, v, mlp = torch.split(fused, [h, h, h, 4 * h], dim=0)
            out[f"{d}.attn.to_q.{suffix}"] = q
            out[f"{d}.attn.to_k.{suffix}"] = k
            out[f"{d}.attn.to_v.{suffix}"] = v
            out[f"{d}.proj_mlp.{suffix}"] = mlp
        out[f"{d}.attn.norm_q.weight"] = t[f"{b}.norm.query_norm.scale"]
        out[f"{d}.attn.norm_k.weight"] = t[f"{b}.norm.key_norm.scale"]
    return {k: v.numpy() for k, v in out.items()}


def test_export_matches_torch_oracle():
    """flux_to_diffusers_state == the independent torch re-statement,
    key-for-key and bit-for-bit."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    bfl = flux_to_torch_state(params, CFG)
    oracle = bfl_to_diffusers_torch_oracle(bfl, CFG)
    ours = flux_to_diffusers_state(params, CFG)
    assert sorted(oracle) == sorted(ours)
    for k in oracle:
        np.testing.assert_array_equal(oracle[k], ours[k], err_msg=k)


def test_diffusers_flux_loads_bit_for_bit():
    """convert_flux_diffusers(oracle diffusers state) == convert_flux(BFL)."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    bfl = flux_to_torch_state(params, CFG)
    dif = bfl_to_diffusers_torch_oracle(bfl, CFG)
    assert is_diffusers_flux_state(dif) and not is_diffusers_flux_state(bfl)
    via_dif = convert_flux_diffusers(dif, CFG)
    via_bfl = convert_flux(bfl, CFG)
    trees_equal(via_bfl, via_dif)
    # normalize alone also reproduces the BFL dict exactly
    norm = normalize_diffusers_flux_keys(dif)
    assert sorted(norm) == sorted(bfl)
    for k in bfl:
        np.testing.assert_array_equal(np.asarray(bfl[k]), norm[k], err_msg=k)


def _random_lora(key, params, rank=4):
    lora = init_lora(key, params, rank=rank)
    return jax.tree.map(
        lambda x: x + jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype) * 0.1,
        lora,
    )


def test_diffusers_lora_roundtrip_folds_identically():
    """Export a LoRA to diffusers naming, re-import, fold both into the same
    base weights: deltas must agree (the re-import block-fuses split q/k/v
    adapters, so factor shapes differ but the product is exact)."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _random_lora(jax.random.PRNGKey(1), params)
    dif_state = lora_to_diffusers_state(lora, CFG)
    assert is_diffusers_lora_state(dif_state)
    assert not is_diffusers_lora_state(lora_to_torch_state(lora, CFG))
    assert all(k.startswith("transformer.") for k in dif_state)
    assert any(".attn.to_q.lora_A.weight" in k for k in dif_state)
    back = convert_lora_diffusers(dif_state, CFG)
    folded_ref = fold_lora(params, lora, scale=1.0)
    folded_dif = fold_lora(params, back, scale=1.0)
    trees_equal(folded_ref, folded_dif, rtol=1e-5)


def test_diffusers_lora_forward_parity():
    """Model output with the re-imported diffusers LoRA folded in matches the
    original LoRA fold."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _random_lora(jax.random.PRNGKey(1), params)
    back = convert_lora_diffusers(lora_to_diffusers_state(lora, CFG), CFG)
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
    a = flux_apply(CFG, fold_lora(params, lora), **inp, attn_impl="xla")
    b = flux_apply(CFG, fold_lora(params, back), **inp, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_diffusers_lora_alpha_scaling():
    """kohya-style {key}.alpha scales the delta by alpha/rank."""
    r, din, dout = 4, 6, 8
    rng = np.random.default_rng(3)
    a = rng.standard_normal((r, din)).astype(np.float32)
    b = rng.standard_normal((dout, r)).astype(np.float32)
    base = {
        "transformer.x_embedder.lora_A.weight": a,
        "transformer.x_embedder.lora_B.weight": b,
    }
    with_alpha = dict(base, **{"transformer.x_embedder.alpha": np.asarray(2.0)})
    plain = convert_lora_diffusers(base, CFG)
    scaled = convert_lora_diffusers(with_alpha, CFG)
    np.testing.assert_allclose(
        np.asarray(scaled["img_in"]["b"]),
        np.asarray(plain["img_in"]["b"]) * (2.0 / r),
        rtol=1e-6,
    )


def test_final_modulation_lora_swap():
    """A LoRA on diffusers norm_out.linear lands on final_layer.adaLN with its
    output halves swapped back to BFL [shift, scale] order."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _random_lora(jax.random.PRNGKey(1), params)
    dif_state = lora_to_diffusers_state(lora, CFG)
    assert any(k.startswith("transformer.norm_out.linear.") for k in dif_state)
    back = convert_lora_diffusers(dif_state, CFG)
    orig = lora["final_layer"]["adaLN"]
    got = back["final_layer"]["adaLN"]
    np.testing.assert_allclose(np.asarray(got["a"]), np.asarray(orig["a"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["b"]), np.asarray(orig["b"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["b_bias"]), np.asarray(orig["b_bias"]), rtol=1e-6
    )


def test_partial_qkv_lora_fuses():
    """A diffusers LoRA touching only to_q still imports: the fused entry's B
    places the q delta in its slice, k/v slices stay zero."""
    h = CFG.hidden_size
    r = 2
    rng = np.random.default_rng(5)
    state = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight":
            rng.standard_normal((r, h)).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight":
            rng.standard_normal((h, r)).astype(np.float32),
        "transformer.transformer_blocks.1.attn.to_q.lora_A.weight":
            rng.standard_normal((r, h)).astype(np.float32),
        "transformer.transformer_blocks.1.attn.to_q.lora_B.weight":
            rng.standard_normal((h, r)).astype(np.float32),
    }
    lora = convert_lora_diffusers(state, CFG)
    entry = lora["double_blocks"]["img_attn"]["qkv"]
    assert np.asarray(entry["a"]).shape == (CFG.depth, h, r)
    b = np.asarray(entry["b"])
    assert b.shape == (CFG.depth, r, 3 * h)
    assert np.abs(b[:, :, h:]).max() == 0  # k/v slices untouched
    assert np.abs(b[:, :, :h]).max() > 0


def test_loader_snapshot_dispatch(tmp_path):
    """load_flux_state + convert_flux_any accept a diffusers pipeline snapshot
    directory (transformer/ shards) and produce the BFL-path pytree."""
    from safetensors.numpy import save_file

    from visualcloze_tpu.pipeline.loader import (
        convert_flux_any,
        is_diffusers_snapshot,
        load_flux_state,
    )

    params = init_flux(jax.random.PRNGKey(0), CFG)
    dif = flux_to_diffusers_state(params, CFG)
    snap = tmp_path / "VisualClozePipeline-384"
    (snap / "transformer").mkdir(parents=True)
    (snap / "model_index.json").write_text("{}")
    items = sorted(dif.items())
    half = len(items) // 2
    save_file(dict(items[:half]),
              str(snap / "transformer" / "diffusion_pytorch_model-00001-of-00002.safetensors"))
    save_file(dict(items[half:]),
              str(snap / "transformer" / "diffusion_pytorch_model-00002-of-00002.safetensors"))

    assert is_diffusers_snapshot(str(snap))
    assert not is_diffusers_snapshot(str(tmp_path / "nope"))
    state = load_flux_state(str(snap))
    assert sorted(state) == sorted(dif)
    loaded = convert_flux_any(state, CFG)
    trees_equal(init_flux(jax.random.PRNGKey(0), CFG), loaded)
