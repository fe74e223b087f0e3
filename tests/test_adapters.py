"""Runtime (unfolded) multi-LoRA adapter serving.

The reference serves ONE LoRA folded into the weights per process; here
named adapters are registered on the pipeline and selected per query — one
base tree, one compiled denoise program (the lora pytree is a jit argument),
N tasks. Correctness anchor: runtime application must match folding the same
adapter into the weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.lora import fold_lora, init_lora, randomize_lora_b
from visualcloze_tpu.models.weights import (
    permute_rope_layout,
    permute_rope_layout_lora,
)
from visualcloze_tpu.pipeline import random_components

CFG = FluxConfig().tiny()


def _lora_for(params, seed=3, rank=2):
    return randomize_lora_b(
        init_lora(jax.random.PRNGKey(seed), params, rank=rank),
        jax.random.PRNGKey(seed + 50),
    )


def _inp(rng, l_img=8, l_txt=4):
    return dict(
        img=jnp.asarray(rng.standard_normal((1, l_img, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, l_img, 3)),
        txt=jnp.asarray(rng.standard_normal((1, l_txt, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, l_txt, 3)),
        timesteps=jnp.full((1,), 0.5),
        y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.full((1,), 4.0),
    )


@pytest.mark.slow
def test_permute_rope_layout_lora_matches_interleaved():
    """half-layout base + half-permuted adapter == interleaved base + raw
    adapter (attention is invariant to the consistent q/k channel perm)."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _lora_for(params)
    rng = np.random.default_rng(1)
    inp = _inp(rng)

    want = np.asarray(
        flux_apply(CFG, params, **inp, attn_impl="xla",
                   rope_layout="interleaved", lora=lora, lora_scale=1.0),
        np.float32,
    )
    got = np.asarray(
        flux_apply(
            CFG, permute_rope_layout(params, CFG), **inp, attn_impl="xla",
            rope_layout="half", lora=permute_rope_layout_lora(lora, CFG),
            lora_scale=1.0,
        ),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_runtime_adapter_matches_folded_and_differs_from_base():
    mA = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                           attn_impl="xla")
    mB = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                           attn_impl="xla")
    lora = _lora_for(mA.params, seed=7)
    mA.add_adapter("task", lora)  # permutes into mA's half layout
    # fold the SAME (already-permuted) adapter into B's identical weights
    mB.params = fold_lora(mB.params, mA.adapters["task"], scale=1.0)

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    grid = [[img, img], [img, None]]
    prompts = ["layout", "task", "content"]
    for m in (mA, mB):
        m.set_grid_size(2, 2)

    out_adapter = mA.process_images(grid, prompts, seed=5, steps=2,
                                    is_upsampling=False, adapter="task")
    out_folded = mB.process_images(grid, prompts, seed=5, steps=2,
                                   is_upsampling=False)
    out_base = mA.process_images(grid, prompts, seed=5, steps=2,
                                 is_upsampling=False)

    a = np.asarray(out_adapter[0], np.float32)
    f = np.asarray(out_folded[0], np.float32)
    b = np.asarray(out_base[0], np.float32)
    # runtime-vs-folded differ only by float association; base must differ
    assert np.mean(np.abs(a - f)) < 1.0, np.mean(np.abs(a - f))
    assert np.mean(np.abs(a - b)) > 2.0 * max(np.mean(np.abs(a - f)), 0.1)


@pytest.mark.slow
def test_adapter_through_upsampling_stage():
    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                          attn_impl="xla")
    m.add_adapter("task", _lora_for(m.params, seed=9))
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    m.set_grid_size(1, 2)
    out = m.process_images(
        [[img, None]], ["layout", "task", "content"], seed=4, steps=2,
        upsampling_steps=2, is_upsampling=True, adapter="task",
    )
    assert len(out) == 1 and out[0].size[0] >= 64


def test_unknown_adapter_raises_before_any_work():
    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                          attn_impl="xla")
    m.set_grid_size(1, 2)
    img = Image.new("RGB", (64, 64))
    with pytest.raises(ValueError, match="unknown adapter"):
        m.process_images([[img, None]], ["l", "t", "c"], adapter="nope")
    with pytest.raises(ValueError, match="unknown adapter"):
        m.prepare_upsampling(img, (64, 64), 30.0, upsampling_steps=2,
                             upsampling_noise=0.4, key=jax.random.PRNGKey(0),
                             content_prompt="", adapter="nope")


@pytest.mark.slow
def test_orchestrator_carries_adapter():
    """PipelinedServer with adapter == sequential path with adapter."""
    from visualcloze_tpu.pipeline.orchestrator import PipelinedServer

    seq = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                            attn_impl="xla")
    srv_model = random_components(jax.random.PRNGKey(0), tiny=True,
                                  resolution=64, attn_impl="xla")
    lora = _lora_for(seq.params, seed=11)
    seq.add_adapter("task", lora)
    srv_model.add_adapter("task", lora)

    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    grid = [[img, None]]
    prompts = ["layout", "task", "content"]
    seq.set_grid_size(1, 2)
    want = seq.process_images(grid, prompts, seed=6, steps=2,
                              upsampling_steps=2, is_upsampling=True,
                              adapter="task")
    with PipelinedServer(srv_model, max_inflight=1) as srv:
        got = srv.submit(grid, prompts, grid_size=(1, 2), seed=6, steps=2,
                         upsampling_steps=2, is_upsampling=True,
                         adapter="task").result(timeout=600)
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))


@pytest.mark.slow
def test_adapter_on_int8_quantized_base():
    """The production combo: int8 weight-only base + runtime bf16 adapter.
    layers.linear applies the LoRA delta on the original activations after
    the quantized matmul; output must track the fp32-base + adapter model
    within the usual int8 envelope, and the adapter must actually act."""
    from visualcloze_tpu.models.quant import quantize_flux_int8

    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _lora_for(params, seed=13)
    qparams = quantize_flux_int8(params)
    rng = np.random.default_rng(4)
    inp = _inp(rng)

    ref = np.asarray(
        flux_apply(CFG, params, **inp, attn_impl="xla", lora=lora, lora_scale=1.0),
        np.float32,
    )
    got = np.asarray(
        flux_apply(CFG, qparams, **inp, attn_impl="xla", lora=lora, lora_scale=1.0),
        np.float32,
    )
    base = np.asarray(flux_apply(CFG, qparams, **inp, attn_impl="xla"), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).mean() / denom < 0.15
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.98
    # the adapter contributes beyond quantization noise
    assert np.abs(got - base).mean() > 2.0 * np.abs(got - ref).mean()


@pytest.mark.slow
def test_trained_lora_pth_serves_as_runtime_adapter(tmp_path):
    """Full trainer -> serving interop loop: train a tiny LoRA with the real
    CLI, export the reference-format consolidated .pth, load it back as a
    runtime adapter, and serve a query with it. The trainer now trains in
    the reference's interleaved channel order (unpermuted), so the exported
    checkpoint drops into add_adapter exactly like a reference-trained one."""
    import random as _random

    from test_trainer import make_dataset_files

    from visualcloze_tpu.training import checkpoint as ckpt
    from visualcloze_tpu.training.train import main

    _random.seed(0)
    config = make_dataset_files(tmp_path)
    main([
        "--data_path", config, "--results_dir", str(tmp_path / "r"),
        "--tiny", "--init_random", "--max_steps", "2", "--global_bsz", "2",
        "--micro_bsz", "1", "--fsdp", "2", "--grid_resolution", "64",
        "--lora_rank", "4", "--ckpt_every", "2", "--log_every", "1",
        "--num_workers", "1", "--max_seq_bucket", "128", "--precision", "fp32",
        "--lr", "0.5",
    ])
    pth = tmp_path / "r" / "checkpoints" / "0000002" / "consolidated.00-of-01.pth"
    assert pth.exists()

    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                          attn_impl="xla")
    m.add_adapter("trained", ckpt.load_torch_lora(str(pth), m.cfg))

    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    )
    m.set_grid_size(1, 2)
    grid = [[img, None]]
    prompts = ["layout", "task", "content"]
    with_a = m.process_images(grid, prompts, seed=8, steps=2,
                              is_upsampling=False, adapter="trained")
    without = m.process_images(grid, prompts, seed=8, steps=2,
                               is_upsampling=False)
    d = np.abs(np.asarray(with_a[0], np.float32) - np.asarray(without[0], np.float32))
    assert d.mean() > 0.5, d.mean()  # lr 0.5 x 2 steps: visible delta


def test_partial_coverage_adapter_each_section_independent():
    """Converters omit sections absent from a checkpoint ('Entries are
    optional', weights.permute_rope_layout_lora) — a double-only tree must
    run, and a single-only tree must actually act (it used to be silently
    ignored because both scans were gated on 'double_blocks')."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = _lora_for(params, seed=21)
    rng = np.random.default_rng(7)
    inp = _inp(rng)
    base = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"), np.float32)

    for only in ("double_blocks", "single_blocks"):
        partial = {only: lora[only]}
        got = np.asarray(
            flux_apply(CFG, params, **inp, attn_impl="xla",
                       lora=partial, lora_scale=1.0),
            np.float32,
        )
        assert np.abs(got - base).max() > 1e-4, f"{only}-only adapter was a no-op"


def test_init_lora_attaches_to_quantized_linears():
    """--quantize int8 + --lora x=random: init_lora must recognize w_int8
    nodes (quantization runs before adapter registration in the CLIs)."""
    from visualcloze_tpu.models.quant import quantize_flux_int8

    params = init_flux(jax.random.PRNGKey(0), CFG)
    qparams = quantize_flux_int8(params)
    lora_q = init_lora(jax.random.PRNGKey(5), qparams, rank=2)
    lora_f = init_lora(jax.random.PRNGKey(5), params, rank=2)
    assert jax.tree_util.tree_structure(lora_q) == jax.tree_util.tree_structure(lora_f)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(lora_q),
                        jax.tree_util.tree_leaves(lora_f))
    )

    rng = np.random.default_rng(9)
    inp = _inp(rng)
    adapter = randomize_lora_b(lora_q, jax.random.PRNGKey(55))
    base = np.asarray(flux_apply(CFG, qparams, **inp, attn_impl="xla"), np.float32)
    got = np.asarray(
        flux_apply(CFG, qparams, **inp, attn_impl="xla", lora=adapter, lora_scale=1.0),
        np.float32,
    )
    assert np.abs(got - base).max() > 1e-4


def test_fold_into_quantized_raises():
    from visualcloze_tpu.models.quant import quantize_flux_int8

    params = init_flux(jax.random.PRNGKey(0), CFG)
    qparams = quantize_flux_int8(params)
    lora = _lora_for(params, seed=2)
    with pytest.raises(ValueError, match="quantized"):
        fold_lora(qparams, lora)


def test_warmup_compiles_one_program_per_adapter_signature(monkeypatch):
    """rank-64 and rank-256 adapters are DIFFERENT jit programs (different
    leaf shapes); warmup must compile one representative per signature —
    not just the first adapter — and cover the upsampling buckets too."""
    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=32,
                          attn_impl="xla")
    m.add_adapter("a_r2", init_lora(jax.random.PRNGKey(1), m.params, rank=2))
    m.add_adapter("b_r2", init_lora(jax.random.PRNGKey(2), m.params, rank=2))
    m.add_adapter("c_r4", init_lora(jax.random.PRNGKey(3), m.params, rank=4))

    grid_calls, ups_calls = [], []
    monkeypatch.setattr(
        m, "process_images",
        lambda *a, **k: grid_calls.append(k.get("adapter")) or [],
    )
    monkeypatch.setattr(
        m, "upsampling",
        lambda *a, **k: ups_calls.append(k.get("adapter")),
    )
    m.warmup([(1, 2)], steps=1, upsampling_steps=1,
             upsampling_sizes=[(64, 64)])
    # one None pass + one per distinct signature (r2 dedup'd, r4 separate)
    assert grid_calls.count(None) == 1
    assert grid_calls.count("a_r2") == 1 and grid_calls.count("c_r4") == 1
    assert "b_r2" not in grid_calls  # same signature as a_r2 — shared program
    assert set(ups_calls) == set(grid_calls)


def test_serve_cli_rejects_duplicate_adapter_names():
    import serve

    with pytest.raises(SystemExit, match="duplicate"):
        serve._parse_adapters(["foo=a.pth", "foo=b.pth"])


@pytest.mark.slow
def test_permute_rope_layout_moe_lora_matches_interleaved():
    """MoE-LoRA counterpart of the plain-LoRA layout test: half base +
    half-permuted MoE adapter == interleaved base + raw MoE adapter. Also
    pins randomize_lora_b actually perturbing MoE trees (shared_b/expert_b
    were skipped once, making the adapter a silent no-op)."""
    from visualcloze_tpu.models.lora import init_moe_lora

    params = init_flux(jax.random.PRNGKey(0), CFG)
    moe = randomize_lora_b(
        init_moe_lora(jax.random.PRNGKey(5), params, rank=2, num_experts=2),
        jax.random.PRNGKey(55),
    )
    rng = np.random.default_rng(2)
    inp = _inp(rng)
    base = np.asarray(
        flux_apply(CFG, params, **inp, attn_impl="xla",
                   rope_layout="interleaved"), np.float32)
    want = np.asarray(
        flux_apply(CFG, params, **inp, attn_impl="xla",
                   rope_layout="interleaved", lora=moe, lora_scale=1.0),
        np.float32)
    assert np.abs(want - base).max() > 1e-6  # adapter must not be a no-op
    got = np.asarray(
        flux_apply(
            CFG, permute_rope_layout(params, CFG), **inp, attn_impl="xla",
            rope_layout="half", lora=permute_rope_layout_lora(moe, CFG),
            lora_scale=1.0,
        ),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_add_moe_adapter_on_half_layout_model():
    """add_adapter must accept MoE-LoRA trees under the default half rope
    layout (permute_rope_layout_lora once KeyError'd on the missing 'b')."""
    from visualcloze_tpu.models.lora import init_moe_lora

    m = random_components(jax.random.PRNGKey(0), tiny=True, resolution=64,
                          attn_impl="xla")
    moe = randomize_lora_b(
        init_moe_lora(jax.random.PRNGKey(7), m.params, rank=2, num_experts=2),
        jax.random.PRNGKey(70),
    )
    m.add_adapter("moe", moe)
    assert "moe" in m.adapters
