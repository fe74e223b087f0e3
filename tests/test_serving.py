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
    device_put_retile,
    device_put_with_formats,
    load_compiled_params,
    load_params_dir,
    save_params_dir,
    stream_params_dir,
)

CFG = FluxConfig().tiny()


def test_device_put_retile_matches_direct_put():
    """The two-hop flat-DMA + on-device-retile path must land the exact same
    values in the exact same Format as a direct device_put(leaf, format),
    for leaves above and below the size threshold."""
    big = np.arange(4 * 1024 * 1024, dtype=np.int8).reshape(4, 1024, 1024)
    small = np.arange(64, dtype=np.float32).reshape(8, 8)
    compiled = jax.jit(
        lambda a, b: (a.astype(jnp.float32).sum(), b.sum())
    ).lower(
        jax.ShapeDtypeStruct(big.shape, big.dtype),
        jax.ShapeDtypeStruct(small.shape, small.dtype),
    ).compile()
    fmt_big, fmt_small = compiled.input_formats[0]
    for arr, fmt in ((big, fmt_big), (small, fmt_small)):
        got = device_put_retile(arr, fmt)
        want = jax.device_put(arr, fmt)
        assert got.format == want.format
        np.testing.assert_array_equal(np.asarray(got), arr)


def test_stream_params_dir_matches_blocking_load(tmp_path):
    """stream_params_dir (pipelined disk->DMA->retile) rebuilds the identical
    tree device_put_with_formats does, and reports a sane decomposition."""
    params = quantize_flux_int8(init_flux(jax.random.PRNGKey(0), CFG))
    save_params_dir(params, str(tmp_path / "q"))

    def fn(p, x):
        return flux_apply(
            CFG, p,
            img=x,
            img_ids=jnp.zeros((1, 16, 3), jnp.float32),
            txt=jnp.zeros((1, 8, CFG.context_in_dim), jnp.float32),
            txt_ids=jnp.zeros((1, 8, 3), jnp.float32),
            timesteps=jnp.full((1,), 0.5, jnp.float32),
            y=jnp.zeros((1, CFG.vec_in_dim), jnp.float32),
            guidance=jnp.full((1,), 4.0, jnp.float32),
            attn_impl="xla",
        )

    x = np.random.default_rng(1).standard_normal((1, 16, CFG.in_channels)).astype(np.float32)
    host = load_params_dir(str(tmp_path / "q"))
    compiled, fmts = compile_with_formats(fn, host, x)
    streamed, stats = stream_params_dir(str(tmp_path / "q"), fmts[0])
    blocking = device_put_with_formats(host, fmts[0])
    assert jax.tree.structure(streamed) == jax.tree.structure(blocking)
    for a, b in zip(jax.tree.leaves(streamed), jax.tree.leaves(blocking)):
        assert a.format == b.format
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert stats["bytes"] == sum(l.nbytes for l in jax.tree.leaves(streamed))
    assert 0.0 <= stats["disk_s"] and stats["total_s"] > 0.0
    dev_x = jax.device_put(x, fmts[1])
    np.testing.assert_allclose(
        np.asarray(compiled(streamed, dev_x)),
        np.asarray(compiled(blocking, dev_x)),
        rtol=0, atol=0,
    )


def test_stream_params_dir_broadcast_device(tmp_path):
    """With no formats tree (serve-boot case: nothing compiled yet), the
    streamer places every leaf on the given device in default layout and
    rebuilds the manifest's tree structure."""
    params = init_flux(jax.random.PRNGKey(2), CFG)
    save_params_dir(params, str(tmp_path / "p"))
    tree, stats = stream_params_dir(str(tmp_path / "p"), jax.devices()[0])
    assert jax.tree.structure(tree) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.devices() == {jax.devices()[0]}
    assert stats["bytes"] > 0


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


def test_two_bucket_compile_shares_one_device_tree(tmp_path):
    """The bench's default-query pattern: compile TWO sequence buckets
    (stage-1 + SDEdit stage-2) against ONE resident parameter tree, pinning
    the second executable's parameter layouts to the first's via jit
    in_shardings=Format — both must run off the same device arrays with no
    relayout, and match direct jit results."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    save_params_dir(params, str(tmp_path / "ckpt"))
    host = load_params_dir(str(tmp_path / "ckpt"))

    rng = np.random.default_rng(3)
    l_txt = 8
    fixed = dict(
        txt=rng.standard_normal((1, l_txt, CFG.context_in_dim)).astype(np.float32),
        txt_ids=np.zeros((1, l_txt, 3), np.float32),
        y=rng.standard_normal((1, CFG.vec_in_dim)).astype(np.float32),
        guidance=np.full((1,), 4.0, np.float32),
    )

    def make_fn(l_img):
        def fn(p, img, timesteps):
            return flux_apply(
                CFG, p, img=img, img_ids=jnp.zeros((1, l_img, 3)),
                timesteps=timesteps, attn_impl="xla",
                **{k: jnp.asarray(v) for k, v in fixed.items()},
            )
        return fn

    def inputs(l_img):
        return (
            rng.standard_normal((1, l_img, CFG.in_channels)).astype(np.float32),
            np.full((1,), 0.5, np.float32),
        )

    x1, t1 = inputs(16)
    x2, t2 = inputs(32)
    fn1, fn2 = make_fn(16), make_fn(32)
    compiled1, fmts = compile_with_formats(fn1, host, x1, t1)
    abstract2 = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (host, x2, t2)
    )
    compiled2 = (
        jax.jit(fn2, in_shardings=(fmts[0], None, None)).lower(*abstract2).compile()
    )
    # pinning worked: parameter formats agree leaf-for-leaf
    assert jax.tree.map(lambda a, b: a == b, fmts[0], compiled2.input_formats[0][0])

    dev_params = device_put_with_formats(host, fmts[0])
    d1 = [device_put_with_formats(a, f) for a, f in zip((x1, t1), fmts[1:])]
    d2 = [
        device_put_with_formats(a, f)
        for a, f in zip((x2, t2), compiled2.input_formats[0][1:])
    ]
    got1 = np.asarray(compiled1(dev_params, *d1))
    got2 = np.asarray(compiled2(dev_params, *d2))
    want1 = np.asarray(jax.jit(fn1)(params, jnp.asarray(x1), jnp.asarray(t1)))
    want2 = np.asarray(jax.jit(fn2)(params, jnp.asarray(x2), jnp.asarray(t2)))
    np.testing.assert_allclose(got1, want1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_bounded_inflight_stream_matches_unbounded(tmp_path):
    """A tiny max_inflight_bytes forces the windowed-put path through every
    block/dispatch interleaving; values, formats, and structure must match
    the unbounded stream (the bound exists so a 12 GB tree never stages
    2x in HBM — see device_put_with_formats docstring)."""
    params = quantize_flux_int8(init_flux(jax.random.PRNGKey(5), CFG))
    save_params_dir(params, str(tmp_path / "q"))
    host = load_params_dir(str(tmp_path / "q"))
    tree_a, _ = stream_params_dir(str(tmp_path / "q"), max_inflight_bytes=1)
    tree_b = device_put_with_formats(host, jax.devices()[0], max_inflight_bytes=1)
    tree_c, _ = stream_params_dir(str(tmp_path / "q"))
    for a, b, c in zip(*(jax.tree.leaves(t) for t in (tree_a, tree_b, tree_c))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_synthetic_int8_device_matches_checkpoint_structure(tmp_path):
    """models/quant.init_flux_int8 (resident-serving boot seam: zero
    host->device bytes) builds the same tree structure + leaf shapes/dtypes
    as the on-disk synthetic checkpoint."""
    from visualcloze_tpu.models.quant import init_flux_int8

    build_synthetic_int8_checkpoint(CFG, str(tmp_path / "q"), seed=0)
    host = load_params_dir(str(tmp_path / "q"))
    dev = init_flux_int8(jax.random.PRNGKey(0), CFG)
    assert jax.tree.structure(host) == jax.tree.structure(dev)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(host)[0],
        jax.tree_util.tree_flatten_with_path(dev)[0],
    ):
        assert a.shape == b.shape, jax.tree_util.keystr(kp)
        assert jnp.asarray(a).dtype == b.dtype, jax.tree_util.keystr(kp)


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
