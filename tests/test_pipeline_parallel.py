"""Pipeline parallelism (pp mesh axis) on the 8-device virtual CPU mesh:
the GPipe-pipelined single trunk must match the sequential scan exactly,
forward and backward, alone and composed with dp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.config import FluxConfig
from visualcloze_tpu.models.flux import flux_apply, init_flux
from visualcloze_tpu.models.lora import init_lora
from visualcloze_tpu.parallel import create_mesh
from visualcloze_tpu.parallel.pipeline import flux_apply_pp

CFG = FluxConfig().tiny()  # depth=2, depth_single_blocks=2


def make_inputs(b=4, l_img=16, l_txt=8, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    inp = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, CFG.in_channels)), jnp.float32),
        img_ids=jnp.asarray(rng.integers(0, 6, (b, l_img, 3)), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, l_txt, CFG.context_in_dim)), jnp.float32),
        txt_ids=jnp.zeros((b, l_txt, 3), jnp.float32),
        timesteps=jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.full((b,), 4.0, jnp.float32),
    )
    if masked:
        mask = np.ones((b, l_img), np.int32)
        mask[:, -3:] = 0  # padded tail
        inp["img_mask"] = jnp.asarray(mask)
    return inp


@pytest.mark.slow
@pytest.mark.parametrize(
    "pp,axes,microbatches",
    [
        (2, {"dp": 1}, 2),
        (2, {"dp": 1}, 4),
        (2, {"dp": 2}, 4),
        # fsdp within a stage: shard_map in_specs carry the real fsdp dims,
        # blocks all-gather their weight shards just-in-time
        (2, {"fsdp": 2}, 2),
        (2, {"dp": 2, "fsdp": 2}, 2),
        # tp within the trunk: parameter-memory sharding only (compute
        # replicated across tp ranks)
        (2, {"tp": 2}, 2),
    ],
)
def test_pp_forward_matches_sequential(pp, axes, microbatches):
    params = init_flux(jax.random.PRNGKey(0), CFG)
    dp = axes.get("dp", 1) * axes.get("fsdp", 1)
    inp = make_inputs(b=8 if dp > 1 else 4)
    want = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"))

    mesh = create_mesh(pp=pp, **axes)
    got = np.asarray(
        jax.jit(
            lambda p, i: flux_apply_pp(
                CFG, p, mesh, microbatches=microbatches, **i, attn_impl="xla"
            )
        )(params, inp)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pp_forward_no_mask_fast_path():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    inp = make_inputs(masked=False)
    want = np.asarray(flux_apply(CFG, params, **inp, attn_impl="xla"))
    mesh = create_mesh(pp=2)
    got = np.asarray(
        jax.jit(
            lambda p, i: flux_apply_pp(
                CFG, p, mesh, microbatches=2, **i, attn_impl="xla"
            )
        )(params, inp)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pp_gradients_match_sequential():
    """jax.grad through the tick scan is the reverse pipeline — LoRA grads
    (incl. the pp+fsdp-sharded single-trunk factors, whose reduce-scatter
    is the all_gather transpose) must match the sequential model's."""
    params = init_flux(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    inp = make_inputs(b=8)
    mesh = create_mesh(pp=2, fsdp=2)

    def loss_seq(lo):
        out = flux_apply(CFG, params, **inp, lora=lo, attn_impl="xla")
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_pp(lo):
        out = flux_apply_pp(
            CFG, params, mesh, microbatches=4, **inp, lora=lo, attn_impl="xla"
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(lora)
    g_pp = jax.jit(jax.grad(loss_pp))(lora)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pp = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for k, v in flat_seq:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_pp[ks]), np.asarray(v), rtol=5e-4, atol=1e-6,
            err_msg=ks,
        )


@pytest.mark.slow
def test_pp_remat_matches():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    inp = make_inputs()
    mesh = create_mesh(pp=2)
    base = np.asarray(
        jax.jit(
            lambda p, i: flux_apply_pp(
                CFG, p, mesh, microbatches=2, **i, attn_impl="xla"
            )
        )(params, inp)
    )
    remat = np.asarray(
        jax.jit(
            lambda p, i: flux_apply_pp(
                CFG, p, mesh, microbatches=2, **i, attn_impl="xla",
                remat=True, remat_policy="dots",
            )
        )(params, inp)
    )
    np.testing.assert_allclose(remat, base, rtol=1e-6, atol=1e-6)


def test_pp_validation_errors():
    params = init_flux(jax.random.PRNGKey(0), CFG)
    inp = make_inputs()
    mesh = create_mesh(pp=2)
    with pytest.raises(ValueError, match="microbatch|M"):
        flux_apply_pp(CFG, params, mesh, microbatches=3, **inp)
    cfg_odd = FluxConfig().tiny()
    import dataclasses

    cfg_odd = dataclasses.replace(cfg_odd, depth_single_blocks=3)
    params_odd = init_flux(jax.random.PRNGKey(0), cfg_odd)
    with pytest.raises(ValueError, match="divisible"):
        flux_apply_pp(cfg_odd, params_odd, mesh, microbatches=2, **inp)
