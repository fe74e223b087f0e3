"""AOT-serialized serving executables (pipeline/aot.py): a daemon restart
loads compiled programs from disk instead of re-paying XLA compilation
(VERDICT r3 item #3 — the 10-minute serving cold start)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.pipeline.aot import AotJit, call_signature


@pytest.fixture(autouse=True)
def _force_aot_on_cpu(monkeypatch):
    """The cpu backend disables AOT disk persistence by default (XLA:CPU
    loader unreliability — pipeline/aot.py docstring); these tests exercise
    the disk machinery itself, so opt back in. The persistent HLO cache
    (tests/conftest.py) must be OFF here: an XLA:CPU executable compiled
    through the HLO cache serializes to a blob whose reload dispatch-fails
    ("Function <fusion> not found") — same loader bug, different trigger.
    Production never hits the combination (forced CPU AOT is a test seam;
    TPU blobs reload cleanly alongside the HLO cache)."""
    monkeypatch.setenv("VISUALCLOZE_AOT_FORCE", "1")
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def f(p, x, scale):
    return {"y": p["w"] @ x * scale + p["b"]}


def make_args():
    p = {"w": np.full((16, 16), 2.0, np.float32), "b": np.ones((16,), np.float32)}
    x = np.arange(16, dtype=np.float32)
    return p, x


def test_disabled_is_plain_jit():
    j = AotJit(f, tag="t")
    p, x = make_args()
    out = j(p, x, 0.5)
    np.testing.assert_allclose(out["y"], (p["w"] @ x) * 0.5 + p["b"])
    assert j.stats == {"compiles": 0, "disk_loads": 0, "hits": 0}


def test_compile_persist_then_restart_loads(tmp_path):
    p, x = make_args()

    j1 = AotJit(f, tag="t").enable(str(tmp_path))
    out1 = j1(p, x, 0.5)
    assert j1.stats["compiles"] == 1 and j1.stats["disk_loads"] == 0
    files = [n for n in os.listdir(tmp_path) if n.endswith(".jaxexec")]
    assert len(files) == 1 and files[0].startswith("t-")

    # same process, same signature: in-memory hit, no second compile
    out1b = j1(p, x, 0.5)
    assert j1.stats["hits"] == 1 and j1.stats["compiles"] == 1
    np.testing.assert_allclose(out1b["y"], out1["y"])

    # "restart": a fresh AotJit loads the executable, compiles nothing
    j2 = AotJit(f, tag="t").enable(str(tmp_path))
    out2 = j2(p, x, 0.5)
    assert j2.stats == {"compiles": 0, "disk_loads": 1, "hits": 0}
    np.testing.assert_allclose(np.asarray(out2["y"]), np.asarray(out1["y"]))

    # a different shape is a different signature -> separate executable
    j2(p, np.ones((16,), np.float32) * 3, 0.5)
    assert j2.stats["disk_loads"] == 1 and j2.stats["hits"] == 1  # same sig reused


def test_different_shape_gets_own_entry(tmp_path):
    j = AotJit(lambda a: a * 2, tag="s").enable(str(tmp_path))
    j(np.zeros((4,), np.float32))
    j(np.zeros((8,), np.float32))
    assert j.stats["compiles"] == 2
    assert len(list(tmp_path.glob("s-*.jaxexec"))) == 2


def test_static_kwargs_in_key(tmp_path):
    def g(x, method):
        return x * (2.0 if method == "a" else 3.0)

    j = AotJit(g, static_argnames=("method",), tag="g").enable(str(tmp_path))
    x = np.ones((4,), np.float32)
    np.testing.assert_allclose(np.asarray(j(x, method="a")), 2.0)
    np.testing.assert_allclose(np.asarray(j(x, method="b")), 3.0)
    assert j.stats["compiles"] == 2
    with pytest.raises(TypeError, match="must be static"):
        j(x, method="a", bogus=1)


def test_corrupt_blob_falls_back_to_compile(tmp_path):
    p, x = make_args()
    j1 = AotJit(f, tag="t").enable(str(tmp_path))
    j1(p, x, 1.0)
    (path,) = tmp_path.glob("t-*.jaxexec")
    path.write_bytes(b"not a pickle")
    j2 = AotJit(f, tag="t").enable(str(tmp_path))
    out = j2(p, x, 1.0)
    assert j2.stats["compiles"] == 1 and j2.stats["disk_loads"] == 0
    np.testing.assert_allclose(out["y"], (p["w"] @ x) * 1.0 + p["b"])


def test_signature_stability():
    p, x = make_args()
    a = call_signature("t", (p, x), {"m": "euler"})
    b = call_signature("t", (p, x), {"m": "euler"})
    assert a == b
    assert call_signature("t", (p, x), {"m": "heun"}) != a
    assert call_signature("u", (p, x), {"m": "euler"}) != a
    p2 = {**p, "w": p["w"].astype(np.float64)}
    assert call_signature("t", (p2, x), {"m": "euler"}) != a


def test_signature_keyed_on_code_version(monkeypatch):
    """A repo update must invalidate cached executables: same shapes + same
    backend but different package source would otherwise keep serving the
    program compiled from the OLD code after a daemon restart."""
    import visualcloze_tpu.pipeline.aot as aot

    p, x = make_args()
    a = call_signature("t", (p, x), {})
    assert aot.code_fingerprint() in aot.backend_fingerprint()
    monkeypatch.setattr(aot, "code_fingerprint", lambda: "deadbeefdeadbeef")
    assert call_signature("t", (p, x), {}) != a


def test_pipeline_restart_skips_denoise_compile(tmp_path, caplog):
    """End-to-end: two fresh tiny pipelines, same AOT dir — the second one's
    denoise/VAE programs come from disk and the images are identical.

    On some CPU hosts the XLA:CPU AOT loader dispatch-fails on reload even
    for same-process blobs ("Buffer Definition Event: Function <fusion> not
    found" — the exact unreliability that makes aot.py disable CPU disk
    persistence by default). When that environment bug fires, the graceful
    recompile fallback is the correct behavior; assert it produced identical
    images and skip the skip-compile assertion (TPU blobs reload cleanly)."""
    import logging

    from PIL import Image

    from visualcloze_tpu.pipeline import random_components

    def run(model):
        model.enable_aot(str(tmp_path))
        blank = Image.new("RGB", (64, 64), (90, 140, 200))
        model.set_grid_size(1, 2)
        out = model.process_images(
            [[blank, None]], ["layout", "", ""], seed=3, steps=2,
            is_upsampling=False,
        )
        return np.asarray(out[0], np.float32), model

    img1, m1 = run(random_components(jax.random.PRNGKey(0), tiny=True, resolution=64))
    assert m1._denoise_jit.stats["compiles"] >= 1

    with caplog.at_level(logging.WARNING, logger="visualcloze_tpu.pipeline.aot"):
        img2, m2 = run(random_components(jax.random.PRNGKey(0), tiny=True, resolution=64))
    loader_broken = jax.default_backend() == "cpu" and any(
        "reload of" in r.message and "recompiling" in r.message
        for r in caplog.records
    )
    np.testing.assert_allclose(img2, img1)
    if loader_broken:
        pytest.skip("XLA:CPU AOT loader dispatch-fails on this host; "
                    "recompile fallback verified (identical images)")
    assert m2._denoise_jit.stats["compiles"] == 0
    assert m2._denoise_jit.stats["disk_loads"] >= 1
    assert m2._encode_jit.stats["compiles"] == 0


@pytest.mark.slow
def test_bench_phase_b_aot_path_tiny(tmp_path):
    """The exact phase-B wiring of bench.py on a tiny config: synthetic int8
    leaf store -> jit/lower/compile with closure-captured conditioning ->
    serialize -> fresh deserialize -> format-matched device_put -> execute,
    outputs identical to the original executable (closure constants must
    survive serialization)."""
    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.models.flux import flux_apply
    from visualcloze_tpu.pipeline.aot import load_executable, save_executable
    from visualcloze_tpu.pipeline.serving import (
        build_synthetic_int8_checkpoint,
        device_put_with_formats,
        load_params_dir,
    )
    from visualcloze_tpu.transport.sampling import denoise_ode
    from visualcloze_tpu.ops.schedule import ode_timesteps

    cfg = FluxConfig().tiny()
    ckpt = tmp_path / "ckpt"
    build_synthetic_int8_checkpoint(cfg, str(ckpt))
    host = load_params_dir(str(ckpt))

    rng = np.random.default_rng(0)
    b, l_img, l_txt = 1, 32, 8
    ids = np.zeros((b, l_img, 3), np.float32)
    ids[..., 1] = (np.arange(l_img) // 8)[None]
    ids[..., 2] = (np.arange(l_img) % 8)[None]
    closure = dict(  # closure-captured conditioning, like bench.make_run
        ids=jnp.asarray(ids),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, cfg.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        vec=jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32),
        guidance=jnp.full((b,), 30.0, jnp.float32),
        cond=jnp.asarray(
            rng.standard_normal((b, l_img, cfg.in_channels - cfg.out_channels)),
            jnp.float32,
        ),
    )

    def run(params, x, ts):
        def model_fn(img, timesteps, **_):
            return flux_apply(
                cfg, params, img=img, img_ids=closure["ids"], txt=closure["txt"],
                txt_ids=closure["txt_ids"], timesteps=timesteps, y=closure["vec"],
                guidance=closure["guidance"], rope_layout="interleaved",
            )
        return denoise_ode(model_fn, x, ts, {}, cond=closure["cond"], method="euler")

    x = np.asarray(rng.standard_normal((b, l_img, cfg.out_channels)), np.float32)
    ts = np.asarray(ode_timesteps(3, l_img, do_shift=True), np.float32)
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (host, x, ts)
    )
    compiled = jax.jit(run).lower(*abstract).compile()
    fmts = compiled.input_formats[0]
    dev = device_put_with_formats(host, fmts[0])
    want = np.asarray(compiled(dev, x, ts), np.float32)

    path = tmp_path / "stage1.jaxexec"
    save_executable(compiled, str(path))
    del compiled, dev

    ex = load_executable(str(path))
    dev2 = device_put_with_formats(host, ex.input_formats[0][0])
    try:
        got = np.asarray(ex(dev2, x, ts), np.float32)
    except jax.errors.JaxRuntimeError as e:
        # XLA:CPU's AOT loader dispatch-fails nondeterministically (order-
        # dependent "Function <fusion> not found" — pipeline/aot.py
        # docstring). bench.py handles this by wiping the entry and
        # recompiling; the reload-equality contract is only shippable on
        # the accelerator backends.
        pytest.skip(f"XLA:CPU AOT loader dispatch-failed (known-broken): {e}")
    np.testing.assert_array_equal(got, want)
