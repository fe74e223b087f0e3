"""Serving-path tests: on-disk parameter store roundtrip and format-matched
compile-then-place loading (the single-chip 12B int8 pattern, tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.quant import quantize_flux_int8
from visualcloze_tpu.pipeline.serving import (
    build_synthetic_int8_checkpoint,
    compile_with_formats,
    device_put_with_formats,
    load_compiled_params,
    load_params_dir,
    save_params_dir,
)

CFG = FluxConfig().tiny()


def test_params_dir_roundtrip(tmp_path):
    params = init_flux(jax.random.PRNGKey(0), CFG)
    save_params_dir(params, str(tmp_path / "ckpt"))
    loaded = load_params_dir(str(tmp_path / "ckpt"))
    assert jax.tree.structure(params) == jax.tree.structure(loaded)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert isinstance(b, np.ndarray)  # memmap view


def test_roundtrip_with_lists(tmp_path):
    tree = {"up": [{"w": np.ones((2, 3))}, {"w": np.zeros((4,))}], "s": np.arange(5)}
    save_params_dir(tree, str(tmp_path / "t"))
    loaded = load_params_dir(str(tmp_path / "t"), mmap=False)
    assert jax.tree.structure(tree) == jax.tree.structure(loaded)
    np.testing.assert_array_equal(loaded["up"][0]["w"], tree["up"][0]["w"])


def test_format_matched_load_runs_and_matches_direct(tmp_path):
    """compile-from-shapes + per-leaf format device_put produces the same
    output as a plain jit call on device-resident params."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    save_params_dir(params, str(tmp_path / "ckpt"))
    host = load_params_dir(str(tmp_path / "ckpt"))

    rng = np.random.default_rng(1)
    b, l_img, l_txt = 1, 16, 8
    img_ids = np.zeros((b, l_img, 3), np.float32)
    kwargs_np = dict(
        img=rng.standard_normal((b, l_img, CFG.in_channels)).astype(np.float32),
        img_ids=img_ids,
        txt=rng.standard_normal((b, l_txt, CFG.context_in_dim)).astype(np.float32),
        txt_ids=np.zeros((b, l_txt, 3), np.float32),
        timesteps=np.full((b,), 0.5, np.float32),
        y=rng.standard_normal((b, CFG.vec_in_dim)).astype(np.float32),
        guidance=np.full((b,), 4.0, np.float32),
    )

    def fn(p, img, timesteps):
        return flux_apply(
            CFG, p, img=img, timesteps=timesteps, attn_impl="xla",
            **{k: jnp.asarray(v) for k, v in kwargs_np.items() if k not in ("img", "timesteps")},
        )

    compiled, dev_params, (dev_img, dev_t) = load_compiled_params(
        fn, host, kwargs_np["img"], kwargs_np["timesteps"]
    )
    got = np.asarray(compiled(dev_params, dev_img, dev_t))
    want = np.asarray(
        jax.jit(fn)(params, jnp.asarray(kwargs_np["img"]), jnp.asarray(kwargs_np["timesteps"]))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_synthetic_int8_checkpoint_matches_quantized_structure(tmp_path):
    build_synthetic_int8_checkpoint(CFG, str(tmp_path / "q"), seed=0)
    host = load_params_dir(str(tmp_path / "q"))
    ref = quantize_flux_int8(init_flux(jax.random.PRNGKey(0), CFG, jnp.bfloat16))
    # same tree structure and leaf shapes as a real quantized conversion
    assert jax.tree.structure(host) == jax.tree.structure(ref)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(host)[0],
        jax.tree_util.tree_flatten_with_path(ref)[0],
    ):
        assert a.shape == b.shape, jax.tree_util.keystr(kp)

    # the int8 tree compiles + runs via the format-matched path
    def fn(p, img, timesteps):
        rng = np.random.default_rng(2)
        return flux_apply(
            CFG, p, img=img, timesteps=timesteps,
            img_ids=jnp.zeros((1, 8, 3)),
            txt=jnp.asarray(rng.standard_normal((1, 4, CFG.context_in_dim)), jnp.bfloat16),
            txt_ids=jnp.zeros((1, 4, 3)),
            y=jnp.asarray(rng.standard_normal((1, CFG.vec_in_dim)), jnp.bfloat16),
            guidance=jnp.full((1,), 4.0, jnp.bfloat16),
            attn_impl="xla",
        )

    img = np.zeros((1, 8, CFG.in_channels), ml_dtype_bf16())
    t = np.full((1,), 0.5, ml_dtype_bf16())
    compiled, dev_params, (di, dt) = load_compiled_params(fn, host, img, t)
    out = np.asarray(compiled(dev_params, di, dt), np.float32)
    assert np.isfinite(out).all()


def ml_dtype_bf16():
    import ml_dtypes

    return ml_dtypes.bfloat16
