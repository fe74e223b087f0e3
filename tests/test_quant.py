"""int8 weight-only quantization tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.quant import (
    dequantize_linear,
    init_flux_int8,
    quantize_flux_int8,
    quantize_linear_int8,
)

CFG = FluxConfig().tiny()


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
    p = {"w": jnp.asarray(w), "b": jnp.zeros((32,))}
    q = quantize_linear_int8(p)
    assert q["w_int8"].dtype == jnp.int8
    back = dequantize_linear(q)
    rel = np.abs(np.asarray(back["w"]) - w).max() / np.abs(w).max()
    assert rel < 1.0 / 127  # within one quantization step


def test_quantized_flux_forward_close():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    qparams = quantize_flux_int8(params)
    rng = np.random.default_rng(1)
    inp = dict(
        img=jnp.asarray(rng.standard_normal((1, 8, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, 8, 3)),
        txt=jnp.asarray(rng.standard_normal((1, 4, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, 4, 3)),
        timesteps=jnp.asarray([0.5]),
        y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0]),
    )
    ref = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"), np.float32)
    got = np.asarray(flux_apply(CFG, qparams, **inp, attn_impl="xla"), np.float32)
    # int8 weights + bf16 activations: outputs correlate strongly with bf16 ref
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).mean() / denom < 0.15
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.98


def test_act_quant_int8_roundtrip():
    from visualcloze_tpu.models.quant import act_quant_int8

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 7, 64)) * 3.0, jnp.float32)
    codes, scale = act_quant_int8(x)
    assert codes.dtype == jnp.int8 and scale.shape == (4, 7, 1)
    back = codes.astype(jnp.float32) * scale
    rel = np.abs(np.asarray(back) - np.asarray(x)).max(axis=-1) / (
        np.abs(np.asarray(x)).max(axis=-1) + 1e-8
    )
    assert rel.max() < 1.0 / 127  # within one step per token


def test_w8a8_linear_matches_quantized_math():
    """layers.linear's w8a8 branch == explicit int32 accumulation + rescale."""
    from visualcloze_tpu.models.layers import linear
    from visualcloze_tpu.models.quant import act_quant_int8, quantize_linear_int8

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 48)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((48, 32)) * 0.05, jnp.float32),
         "b": jnp.asarray(rng.standard_normal((32,)) * 0.01, jnp.float32)}
    q = quantize_linear_int8(p)
    q8 = dict(q, a8=jnp.zeros((), jnp.int8))
    got = np.asarray(linear(q8, x), np.float32)

    codes, scale = act_quant_int8(x)
    acc = np.einsum(
        "bli,io->blo",
        np.asarray(codes, np.int32),
        np.asarray(q["w_int8"], np.int32),
    )
    want = acc.astype(np.float32) * np.asarray(scale) * np.asarray(q["w_scale"])
    want = want.astype(ml_bf16()).astype(np.float32) + np.asarray(
        p["b"], np.float32
    ).astype(ml_bf16()).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_w8a8_flux_forward_close():
    from visualcloze_tpu.models.quant import quantize_flux_w8a8

    params = init_flux(jax.random.PRNGKey(0), CFG)
    qparams = quantize_flux_w8a8(params)
    rng = np.random.default_rng(4)
    inp = dict(
        img=jnp.asarray(rng.standard_normal((1, 8, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, 8, 3)),
        txt=jnp.asarray(rng.standard_normal((1, 4, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, 4, 3)),
        timesteps=jnp.asarray([0.5]),
        y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0]),
    )
    ref = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"), np.float32)
    got = np.asarray(flux_apply(CFG, qparams, **inp, attn_impl="xla"), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).mean() / denom < 0.2  # w8a8 adds act-quant noise
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.97


def test_mark_w8a8_marks_exactly_the_token_dim_block_linears():
    """mark_w8a8 on an already-int8 tree == quantize_flux_w8a8 structurally:
    host-numpy 'a8' markers on exactly the double/single-block token-dim
    linears, with block-stack lead dims (the bench's BENCH_W8A8 path)."""
    from visualcloze_tpu.models.quant import (
        mark_w8a8,
        quantize_flux_int8,
        quantize_flux_w8a8,
    )

    params = init_flux(jax.random.PRNGKey(0), CFG)
    via_mark = mark_w8a8(quantize_flux_int8(params))
    direct = quantize_flux_w8a8(params)
    assert jax.tree.structure(via_mark) == jax.tree.structure(direct)

    def collect(node, path=()):
        if isinstance(node, dict):
            if "a8" in node:
                yield path, node["a8"], node["w_int8"]
            for k, v in node.items():
                yield from collect(v, path + (k,))

    marks = list(collect(via_mark))
    assert marks, "no a8 markers placed"
    for path, a8, w in marks:
        assert isinstance(a8, np.ndarray) and a8.dtype == np.int8
        assert a8.shape == w.shape[:-2]  # block-stack lead dims
        assert path[0] in ("double_blocks", "single_blocks")
        assert path[-1] in {"qkv", "proj", "0", "2", "linear1", "linear2"}
    # none outside the block stacks (embedders, final layer, modulations)
    flat = {"/".join(p) for p, _, _ in marks}
    assert not any(p.startswith(("img_in", "txt_in", "time_in", "vector_in",
                                 "guidance_in", "final_layer")) for p in flat)


def ml_bf16():
    import ml_dtypes

    return ml_dtypes.bfloat16


@pytest.mark.slow
def test_init_flux_int8_structure_and_memory():
    params = init_flux_int8(jax.random.PRNGKey(0), CFG)
    leaf = params["double_blocks"]["img_attn"]["qkv"]
    assert leaf["w_int8"].dtype == jnp.int8
    assert leaf["w_int8"].shape == (CFG.depth, CFG.hidden_size, 3 * CFG.hidden_size)
    # int8 tree runs through the model
    rng = np.random.default_rng(2)
    out = flux_apply(
        CFG, params,
        img=jnp.asarray(rng.standard_normal((1, 8, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, 8, 3)),
        txt=jnp.asarray(rng.standard_normal((1, 4, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, 4, 3)),
        timesteps=jnp.asarray([0.5]),
        y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.asarray([4.0]),
        attn_impl="xla",
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_permute_rope_layout_on_quantized_tree():
    """The loader quantizes then the pipeline applies the half-rope
    permutation — the permuted int8 tree must match permute-then-quantize."""
    from visualcloze_tpu.models.weights import permute_rope_layout

    params = init_flux(jax.random.PRNGKey(0), CFG)
    a = quantize_flux_int8(permute_rope_layout(params, CFG))
    b = permute_rope_layout(quantize_flux_int8(params), CFG)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_int8_matmul_kernel_interpret():
    """Pallas int8 matmul (interpret mode) vs the einsum reference."""
    import unittest.mock as um

    from visualcloze_tpu.ops import int8_matmul as im

    rng = np.random.default_rng(3)
    m, k, n = 200, 128, 256  # m non-aligned on purpose
    x = jnp.asarray(rng.standard_normal((2, m // 2, k)), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)

    orig = im.pl.pallas_call

    def interp(*a, **kw):
        kw.setdefault("interpret", True)
        kw.pop("compiler_params", None)
        return orig(*a, **kw)

    with um.patch.object(im.pl, "pallas_call", interp):
        got = im.int8_matmul(x, w8, scale, out_dtype=jnp.float32)
    want = jnp.einsum(
        "...i,io->...o", x.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
    ).astype(jnp.float32) * scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_quantized_tree_shards_over_mesh():
    """shard_params on an int8-quantized tree must SPLIT w_int8 leaves
    (previously they fell through to replicated, silently losing tp/fsdp)."""
    from visualcloze_tpu.parallel import create_mesh, shard_params

    params = quantize_flux_int8(init_flux(jax.random.PRNGKey(0), CFG))
    mesh = create_mesh(fsdp=2, tp=2)
    sharded = shard_params(params, mesh)
    qkv = sharded["double_blocks"]["img_attn"]["qkv"]
    shard = qkv["w_int8"].sharding.shard_shape(qkv["w_int8"].shape)
    assert shard != qkv["w_int8"].shape  # actually split, not replicated
    scale_shard = qkv["w_scale"].sharding.shard_shape(qkv["w_scale"].shape)
    assert scale_shard[-1] == qkv["w_scale"].shape[-1] // 2  # tp on out-dim


def test_int4_roundtrip_error_bound():
    """Group-wise int4: per-element error <= scale/2 = group absmax / 14."""
    from visualcloze_tpu.models.quant import dequant_weight_int4, quantize_weight_int4

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)  # stacked
    entry = quantize_weight_int4(w, group=128)
    assert entry["w_int4"].shape == (2, 128, 64)
    assert entry["w_scale"].shape == (2, 2, 64)
    back = dequant_weight_int4(entry, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    gmax = np.abs(np.asarray(w)).reshape(2, 2, 128, 64).max(axis=2)
    bound = (gmax / 13.9 + 1e-6)[:, :, None, :].repeat(128, axis=2).reshape(2, 256, 64)
    assert (err <= bound).all()


def test_t5_encode_int4():
    """t5_encode runs with int4 block weights and stays close to the fp
    baseline (frozen encoder; capacity-motivated quantization)."""
    from visualcloze_tpu.config import T5Config
    from visualcloze_tpu.models.quant import quantize_t5_int4
    from visualcloze_tpu.models.t5 import init_t5, t5_encode

    cfg = T5Config().tiny()
    params = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)))
    ref = np.asarray(t5_encode(cfg, params, ids))
    got = np.asarray(t5_encode(cfg, quantize_t5_int4(params), ids))
    assert got.shape == ref.shape and np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # random gaussian weights are the quantization worst case (no structure;
    # ~4% noise per matmul compounds across layers) — real-weight quality is
    # a round-3 gate alongside the PSNR check (docs/ROADMAP.md)
    assert rel < 0.3, rel


def test_linear_int4_dispatch():
    """layers.linear consumes int4 entries; output matches the dequantized
    bf16 weight path."""
    from visualcloze_tpu.models.layers import linear
    from visualcloze_tpu.models.quant import dequant_weight_int4, quantize_weight_int4

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal((256, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)
    entry = quantize_weight_int4(w, group=128)
    got = linear({**entry, "b": b}, x)
    want = linear({"w": dequant_weight_int4(entry, jnp.bfloat16), "b": b},
                  x.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_flux_int4_forward():
    """quantize_flux_int4 tree runs through flux_apply (capacity mode)."""
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import flux_apply, init_flux
    from visualcloze_tpu.models.quant import quantize_flux_int4

    cfg = FluxConfig().tiny()
    params = init_flux(jax.random.PRNGKey(0), cfg, jnp.float32)
    q = quantize_flux_int4(params)
    rng = np.random.default_rng(0)
    kw = dict(
        img=jnp.asarray(rng.standard_normal((1, 16, cfg.in_channels)), jnp.float32),
        img_ids=jnp.zeros((1, 16, 3)),
        txt=jnp.asarray(rng.standard_normal((1, 8, cfg.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((1, 8, 3)),
        timesteps=jnp.asarray([0.5]),
        y=jnp.asarray(rng.standard_normal((1, cfg.vec_in_dim)), jnp.float32),
    )
    if cfg.guidance_embed:
        kw["guidance"] = jnp.asarray([4.0])
    ref = np.asarray(flux_apply(cfg, params, **kw), np.float32)
    got = np.asarray(flux_apply(cfg, q, **kw), np.float32)
    assert got.shape == ref.shape and np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.35, rel  # random weights = quantization worst case


# ------------------- SmoothQuant equalization (w8a8) -------------------


def _flux_inp(rng, b=1, l_img=8, l_txt=4):
    inp = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, CFG.in_channels)), jnp.float32),
        img_ids=jnp.zeros((b, l_img, 3)),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3)),
        timesteps=jnp.full((b,), 0.5),
        y=jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)), jnp.float32),
    )
    if CFG.guidance_embed:
        inp["guidance"] = jnp.full((b,), 4.0)
    return inp


def test_collect_a8_stats_structure_and_values():
    """flux_apply(collect_a8_stats=True) returns per-entry (depth, in) absmax
    stats covering exactly the six token-dim linear classes, and the stats
    are true absmaxes (non-negative, finite)."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(5)
    inp = _flux_inp(rng)
    out, stats = flux_apply(CFG, params, **inp, attn_impl="xla", collect_a8_stats=True)
    assert out.shape == (1, 8, CFG.out_channels)

    d, s = stats["double_blocks"], stats["single_blocks"]
    h, mh = CFG.hidden_size, CFG.mlp_hidden_dim
    D, S = CFG.depth, CFG.depth_single_blocks
    assert set(d) == {"img_attn", "txt_attn", "img_mlp", "txt_mlp"}
    assert set(d["img_attn"]) == {"qkv", "proj"} and set(d["img_mlp"]) == {"0", "2"}
    assert d["img_attn"]["qkv"].shape == (D, h)
    assert d["img_mlp"]["2"].shape == (D, mh)
    assert set(s) == {"linear1", "linear2"}
    assert s["linear1"].shape == (S, h) and s["linear2"].shape == (S, h + mh)
    for leaf in jax.tree.leaves(stats):
        a = np.asarray(leaf)
        assert np.isfinite(a).all() and (a >= 0).all() and a.max() > 0


def test_smooth_scales_exactness_in_fp():
    """The equalization is exact in floating point:
    (x * 1/s) @ (s * w) == x @ w."""
    from visualcloze_tpu.models.quant import smooth_scales

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 24)) * 0.05, jnp.float32)
    s = smooth_scales(jnp.max(jnp.abs(x), axis=0), w)
    assert s.shape == (48,) and np.asarray(s).min() > 0
    got = ((x / s) @ (w * s[:, None])).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w), rtol=2e-5, atol=2e-5)


def test_smooth_reduces_outlier_quant_error():
    """The point of SmoothQuant: per-token int8 is dominated by per-channel
    outliers; migrating them into the weights must cut the matmul error by
    a large factor on an outlier-heavy distribution."""
    from visualcloze_tpu.models.layers import linear
    from visualcloze_tpu.models.quant import (
        quantize_linear_int8,
        smooth_scales,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 96)).astype(np.float32)
    x[:, :4] *= 60.0  # a few systematically huge channels (LLM/DiT outliers)
    w = (rng.standard_normal((96, 64)) * 0.05).astype(np.float32)
    xj, p = jnp.asarray(x), {"w": jnp.asarray(w)}
    want = x @ w

    q_plain = dict(quantize_linear_int8(p), a8=jnp.zeros((), jnp.int8))
    err_plain = np.abs(np.asarray(linear(q_plain, xj), np.float32) - want).mean()

    s = smooth_scales(jnp.max(jnp.abs(xj), axis=0), p["w"])
    q_s = dict(
        quantize_linear_int8({"w": p["w"] * s[:, None]}),
        a8=jnp.zeros((), jnp.int8),
        a_sinv=(1.0 / s).astype(jnp.float32),
    )
    err_smooth = np.abs(np.asarray(linear(q_s, xj), np.float32) - want).mean()
    assert err_smooth < 0.5 * err_plain, (err_smooth, err_plain)


@pytest.mark.slow
def test_flux_w8a8_smooth_forward_close():
    """Calibrate -> smooth-quantize -> forward: structure matches plain w8a8
    plus a_sinv leaves, and output error stays within the plain-w8a8 bound
    (random weights have no outliers, so parity — the win case is covered by
    test_smooth_reduces_outlier_quant_error)."""
    from visualcloze_tpu.models.quant import (
        calibrate_flux_a8,
        quantize_flux_w8a8,
        quantize_flux_w8a8_smooth,
    )

    params = init_flux(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(8)
    inp = _flux_inp(rng)
    stats = calibrate_flux_a8(CFG, params, [inp], attn_impl="xla")
    q = quantize_flux_w8a8_smooth(params, stats)

    # every a8-marked entry carries a matching a_sinv
    def walk(node, path=()):
        if isinstance(node, dict):
            if "a8" in node:
                yield path, node
            for k, v in node.items():
                yield from walk(v, path + (k,))

    marked = list(walk(q))
    assert marked
    for path, node in marked:
        assert "a_sinv" in node, path
        assert node["a_sinv"].shape == node["w_int8"].shape[:-1], path

    ref = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"), np.float32)
    got = np.asarray(flux_apply(CFG, q, **inp, attn_impl="xla"), np.float32)
    qp = quantize_flux_w8a8(params)
    got_plain = np.asarray(flux_apply(CFG, qp, **inp, attn_impl="xla"), np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    err_s = np.abs(got - ref).mean() / denom
    err_p = np.abs(got_plain - ref).mean() / denom
    assert err_s < max(1.2 * err_p, 0.2), (err_s, err_p)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.97


@pytest.mark.slow
def test_w8a8_smooth_tree_roundtrips_serving_leaf_store(tmp_path):
    """The production single-chip path: a smooth-quantized tree persists
    through pipeline/serving's leaf store (a8/a_sinv leaves included) and
    the reloaded tree computes the identical forward."""
    from visualcloze_tpu.models.quant import (
        calibrate_flux_a8,
        quantize_flux_w8a8_smooth,
    )
    from visualcloze_tpu.pipeline.serving import load_params_dir, save_params_dir

    params = init_flux(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(9)
    inp = _flux_inp(rng)
    stats = calibrate_flux_a8(CFG, params, [inp], attn_impl="xla")
    q = quantize_flux_w8a8_smooth(params, stats)
    want = np.asarray(flux_apply(CFG, q, **inp, attn_impl="xla"), np.float32)

    save_params_dir(q, str(tmp_path / "tree"))
    q2 = load_params_dir(str(tmp_path / "tree"))
    assert jax.tree.structure(jax.tree.map(np.asarray, q)) == jax.tree.structure(q2)
    got = np.asarray(flux_apply(CFG, q2, **inp, attn_impl="xla"), np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_quant_error_does_not_compound_over_denoise_trajectory():
    """Trajectory-level serving-quality evidence: quantization noise must NOT
    compound over the rectified-flow euler loop. Each denoise step adds an
    independent O(dt) perturbation, so the end-of-trajectory error should sit
    at the single-forward error scale — not steps-x it. Measured while
    building this test (hidden 512 variant): one-call rel err ~1.5-1.8%,
    15-step trajectory rel err ~1.6% for int8 / w8a8 / w8a8_smooth alike,
    on a model with injected per-channel activation outliers (the
    SmoothQuant regime: hot residual channels whose readers' weights are
    proportionally small). This bounds the quantized-serving quality gate to
    SINGLE-FORWARD fidelity — the ODE does not amplify it.
    """
    import dataclasses

    from visualcloze_tpu.models.quant import (
        calibrate_flux_a8,
        quantize_flux_w8a8,
        quantize_flux_w8a8_smooth,
    )
    from visualcloze_tpu.ops.schedule import ode_timesteps
    from visualcloze_tpu.transport.sampling import denoise_ode

    cfg = dataclasses.replace(
        CFG, hidden_size=256, num_heads=4, axes_dim=(16, 24, 24),
        depth=1, depth_single_blocks=2,
    )
    rng = np.random.default_rng(0)
    l_img, l_txt = 64, 8
    c_x = cfg.out_channels
    x0 = jnp.asarray(rng.standard_normal((1, l_img, c_x)), jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((1, l_img, cfg.in_channels - c_x)), jnp.float32
    )
    img_ids = jnp.zeros((1, l_img, 3))
    txt = jnp.asarray(rng.standard_normal((1, l_txt, cfg.context_in_dim)), jnp.float32)
    txt_ids = jnp.zeros((1, l_txt, 3))
    y = jnp.asarray(rng.standard_normal((1, cfg.vec_in_dim)), jnp.float32)
    guidance = jnp.full((1,), 4.0)
    ts = jnp.asarray(ode_timesteps(13, l_img))

    # outlier injection: a few hidden channels run at gain-x magnitude while
    # the linears reading the residual stream carry gain-x-smaller rows for
    # them — outliers set the per-token int8 grid without carrying signal
    gain, hot = 50.0, np.arange(8)
    params = init_flux(jax.random.PRNGKey(0), cfg)
    for k in ("img_in", "txt_in"):
        w = np.array(params[k]["w"], np.float32)
        w[:, hot] *= gain
        params[k] = dict(params[k], w=jnp.asarray(w))

    def shrink_rows(entry):
        w = np.array(entry["w"], np.float32)
        w[..., hot, :] /= gain
        return dict(entry, w=jnp.asarray(w))

    d = params["double_blocks"]
    for stream in ("img_attn", "txt_attn"):
        d[stream] = dict(d[stream], qkv=shrink_rows(d[stream]["qkv"]))
    for stream in ("img_mlp", "txt_mlp"):
        d[stream] = dict(d[stream], **{"0": shrink_rows(d[stream]["0"])})
    s = params["single_blocks"]
    s["linear1"] = shrink_rows(s["linear1"])

    def one_call(p, b):
        return np.asarray(flux_apply(cfg, p, **b, attn_impl="xla"), np.float32)

    def trajectory(p):
        def model_fn(inp, timesteps, **_):
            return flux_apply(
                cfg, p, img=inp, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
                timesteps=timesteps, y=y, guidance=guidance, attn_impl="xla",
            )

        return np.asarray(
            denoise_ode(model_fn, x0, ts, {}, cond=cond, method="euler"),
            np.float32,
        )

    ref_traj = trajectory(params)
    traj_scale = np.abs(ref_traj - np.asarray(x0)).std()  # what the ODE added

    b1 = dict(
        img=jnp.concatenate([x0, cond], axis=-1), img_ids=img_ids, txt=txt,
        txt_ids=txt_ids, timesteps=jnp.full((1,), 1.0), y=y, guidance=guidance,
    )
    bmid = dict(
        b1, img=jnp.concatenate([jnp.asarray(ref_traj), cond], axis=-1),
        timesteps=jnp.full((1,), float(ts[-2])),
    )
    stats = calibrate_flux_a8(cfg, params, [b1, bmid], attn_impl="xla")
    ref_call = one_call(params, b1)
    call_scale = np.abs(ref_call).std()

    for name, qp in (
        ("int8", quantize_flux_int8(params)),
        ("w8a8", quantize_flux_w8a8(params)),
        ("w8a8_smooth", quantize_flux_w8a8_smooth(params, stats)),
    ):
        call_rel = np.abs(one_call(qp, b1) - ref_call).mean() / call_scale
        traj_rel = np.abs(trajectory(qp) - ref_traj).mean() / traj_scale
        # no compounding: trajectory error stays at the one-call error scale
        # (3x covers run-to-run spread; compounding would be ~steps-x = 12x)
        assert traj_rel < max(3.0 * call_rel, 0.01), (name, call_rel, traj_rel)
        assert traj_rel < 0.05, (name, traj_rel)


def test_init_flux_int8_chunked_path_matches_structure(monkeypatch):
    """Above _INIT_CHUNK_LIMIT, stacked leaves are generated one lead index
    at a time into a donated buffer (one eager bits() call for a 2.5 GB leaf
    transiently needs ~8 bytes/element — measured OOM on 16 GB); forcing the
    limit to 0 must exercise that path and produce the same structure,
    shapes, and dtypes, with per-index slices actually random."""
    import visualcloze_tpu.models.quant as quant

    base = init_flux_int8(jax.random.PRNGKey(0), CFG)
    monkeypatch.setattr(quant, "_INIT_CHUNK_LIMIT", 0)
    chunked = init_flux_int8(jax.random.PRNGKey(0), CFG)
    assert jax.tree.structure(base) == jax.tree.structure(chunked)
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(chunked)):
        assert a.shape == b.shape and a.dtype == b.dtype
    lin1 = np.asarray(chunked["single_blocks"]["linear1"]["w_int8"])
    assert lin1.std() > 0 and not np.array_equal(lin1[0], lin1[1])


def test_quantize_embedding_int8_near_lossless():
    """Per-row int8 lookup tables: gather+dequant matches the fp table to
    <0.5% per row (each row keeps its own dynamic range)."""
    from visualcloze_tpu.models.quant import (
        embedding_lookup,
        quantize_embedding_int8,
    )

    emb = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 48)) *
        np.logspace(-2, 1, 64)[:, None],  # rows spanning 3 orders of magnitude
        jnp.float32,
    )
    q = quantize_embedding_int8(emb)
    assert q["w_int8"].dtype == jnp.int8 and q["w_scale"].shape == (64, 1)
    ids = jnp.asarray([[0, 3, 63, 17], [5, 5, 62, 1]])
    got = np.asarray(embedding_lookup(q, ids, dtype=jnp.float32))
    want = np.asarray(emb)[np.asarray(ids)]
    rel = np.abs(got - want).max(axis=-1) / np.abs(want).max(axis=-1)
    assert rel.max() < 0.005, rel.max()
    # plain arrays pass through untouched
    np.testing.assert_array_equal(
        np.asarray(embedding_lookup(emb, ids)), want
    )


def test_t5_encode_int4_with_int8_embed():
    """quantize_embed=True (co-resident topology) adds only the per-row
    table noise on top of the int4 block error."""
    from visualcloze_tpu.config import T5Config
    from visualcloze_tpu.models.quant import quantize_t5_int4
    from visualcloze_tpu.models.t5 import init_t5, t5_encode

    cfg = T5Config().tiny()
    params = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)))
    base = np.asarray(t5_encode(cfg, quantize_t5_int4(params), ids))
    got = np.asarray(
        t5_encode(cfg, quantize_t5_int4(params, quantize_embed=True), ids)
    )
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - base) / np.linalg.norm(base)
    assert rel < 0.05, rel  # embed int8 noise ~0.4%/row, amplified by blocks


def test_clip_encode_int8():
    """quantize_clip_int8 halves the tree and stays close to the bf16
    baseline on the pooled output (the only tensor FLUX consumes)."""
    from visualcloze_tpu.config import CLIPTextConfig
    from visualcloze_tpu.models.clip import clip_encode, init_clip
    from visualcloze_tpu.models.quant import quantize_clip_int8

    cfg = CLIPTextConfig().tiny()
    params = init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = np.random.default_rng(2).integers(1, cfg.vocab_size - 1, (2, cfg.max_length))
    ids[:, -1] = cfg.vocab_size - 1  # EOT
    ids = jnp.asarray(ids)
    _, ref = clip_encode(cfg, params, ids)
    q = quantize_clip_int8(params)
    nbytes = lambda t: sum(x.nbytes for x in jax.tree.leaves(t))
    assert nbytes(q) < 0.62 * nbytes(params)
    _, got = clip_encode(cfg, q, ids)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.isfinite(got).all()
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99, cos


def test_init_t5_int4_matches_quantized_structure():
    """The direct quantized init (single-chip boot seam: peak HBM == resident
    HBM) must mirror quantize_t5_int4(init_t5(...), quantize_embed=True)
    leaf for leaf, and run through t5_encode."""
    from visualcloze_tpu.config import T5Config
    from visualcloze_tpu.models.quant import init_t5_int4, quantize_t5_int4
    from visualcloze_tpu.models.t5 import init_t5, t5_encode

    cfg = T5Config().tiny()
    direct = init_t5_int4(jax.random.PRNGKey(0), cfg)
    ref = quantize_t5_int4(
        init_t5(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16),
        quantize_embed=True,
    )
    ld, lr = jax.tree.leaves_with_path(direct), jax.tree.leaves_with_path(ref)
    assert [p for p, _ in ld] == [p for p, _ in lr]
    for (p, a), (_, b) in zip(ld, lr):
        assert a.shape == b.shape and a.dtype == b.dtype, (p, a.shape, b.shape)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
    out = np.asarray(t5_encode(cfg, direct, ids), np.float32)
    assert np.isfinite(out).all() and out.std() > 0


def test_init_clip_int8_matches_quantized_structure():
    from visualcloze_tpu.config import CLIPTextConfig
    from visualcloze_tpu.models.clip import clip_encode, init_clip
    from visualcloze_tpu.models.quant import init_clip_int8, quantize_clip_int8

    cfg = CLIPTextConfig().tiny()
    direct = init_clip_int8(jax.random.PRNGKey(0), cfg)
    ref = quantize_clip_int8(init_clip(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16))
    ld, lr = jax.tree.leaves_with_path(direct), jax.tree.leaves_with_path(ref)
    assert [p for p, _ in ld] == [p for p, _ in lr]
    for (p, a), (_, b) in zip(ld, lr):
        assert a.shape == b.shape and a.dtype == b.dtype, (p, a.shape, b.shape)
    ids = np.random.default_rng(1).integers(1, cfg.vocab_size - 1, (2, cfg.max_length))
    ids[:, -1] = cfg.vocab_size - 1
    h, pooled = clip_encode(cfg, direct, jnp.asarray(ids))
    assert np.isfinite(np.asarray(pooled, np.float32)).all()
