"""Ring attention (sequence parallelism) vs full attention on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.ops.attention import mask_to_bias, mha_xla
from visualcloze_tpu.ops.ring_attention import ring_attention
from visualcloze_tpu.parallel import create_mesh


@pytest.mark.parametrize("cp", [2, 4, 8])
def test_ring_attention_matches_full(cp):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:cp]).reshape(cp), ("cp",))
    rng = np.random.default_rng(0)
    b, h, L, d = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    want = mha_xla(q, k, v, None)
    got = ring_attention(q, k, v, None, mesh, axis="cp", impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_ring_attention_with_padding_bias():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]).reshape(4), ("cp",))
    rng = np.random.default_rng(1)
    b, h, L, d = 2, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 20:] = 0
    mask[1, 29:] = 0
    bias = mask_to_bias(jnp.asarray(mask))
    want = mha_xla(q, k, v, bias)
    got = ring_attention(q, k, v, bias, mesh, axis="cp", impl="xla")
    valid = mask[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid, rtol=2e-4, atol=2e-5
    )


def test_ring_attention_jit_under_mesh():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]).reshape(4), ("cp",))
    rng = np.random.default_rng(2)
    b, h, L, d = 1, 1, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)

    @jax.jit
    def f(q):
        return ring_attention(q, q, q, None, mesh, impl="xla")

    got = f(q)
    want = mha_xla(q, q, q, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
