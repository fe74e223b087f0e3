"""Unit tests for core ops against independent (numpy/einops) references that
re-derive the reference repo's formulas."""

import math

import einops
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcloze_tpu.ops import (
    apply_rope,
    attention,
    bucket_length,
    embed_nd,
    get_lin_function,
    get_schedule,
    make_img_ids,
    mha,
    ode_timesteps,
    pack_mask,
    pack_sequences,
    patchify,
    rope_table,
    shift_training_time,
    time_shift,
    timestep_embedding,
    unpatchify,
)
from visualcloze_tpu.ops.attention import mask_to_bias, mha_xla


# ---------- independent references (numpy, mirroring /root/reference math) ----------

def ref_rope_matrix(pos, dim, theta):
    """models/math.py:102-109 in numpy float64: (..., n, dim/2, 2, 2)."""
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta ** scale)
    out = np.einsum("...n,d->...nd", pos.astype(np.float64), omega)
    mats = np.stack([np.cos(out), -np.sin(out), np.sin(out), np.cos(out)], axis=-1)
    return mats.reshape(*mats.shape[:-1], 2, 2).astype(np.float32)


def ref_apply_rope(x, freqs):
    """models/math.py:112-117 in numpy."""
    x_ = x.astype(np.float32).reshape(*x.shape[:-1], -1, 1, 2)
    out = freqs[..., 0] * x_[..., 0] + freqs[..., 1] * x_[..., 1]
    return out.reshape(x.shape)


def ref_timestep_embedding(t, dim, max_period=10000):
    t = 1000.0 * np.asarray(t, dtype=np.float32)
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None]
    return np.concatenate([np.cos(args), np.sin(args)], axis=-1)


def ref_transport_time_shift(mu, sigma, t):
    """transport/utils.py:33-39 (double-reversed convention)."""
    t = 1 - t
    t = math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)
    return 1 - t


# ------------------------------- rope -------------------------------

def test_rope_table_matches_reference_matrices():
    pos = np.array([[0.0, 1.0, 2.0, 7.0, 63.0, 144.0]])
    dim, theta = 16, 10_000
    mats = ref_rope_matrix(pos, dim, theta)
    cos, sin = rope_table(jnp.asarray(pos), dim, theta)
    # fp32 on-device product vs the fp64 reference table: error must stay far
    # below bf16 resolution (~4e-3 at |x|<=1)
    np.testing.assert_allclose(np.asarray(cos), mats[..., 0, 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(sin), mats[..., 1, 0], atol=2e-5)


def test_apply_rope_matches_reference():
    rng = np.random.default_rng(0)
    b, h, L, d = 2, 3, 8, 16
    x = rng.standard_normal((b, h, L, d)).astype(np.float32)
    pos = rng.integers(0, 50, size=(b, L)).astype(np.float32)
    mats = ref_rope_matrix(pos, d, 10_000)  # (b, L, d/2, 2, 2)
    want = ref_apply_rope(x, mats[:, None])  # broadcast over heads
    cos, sin = rope_table(jnp.asarray(pos), d, 10_000)
    got = apply_rope(jnp.asarray(x), cos[:, None], sin[:, None])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_embed_nd_concatenates_axes():
    ids = np.stack(
        [np.full((1, 5), 2.0), np.arange(5.0)[None], np.arange(5.0)[None] * 2], axis=-1
    )
    axes_dim = (4, 6, 6)
    cos, sin = embed_nd(jnp.asarray(ids), axes_dim, 10_000)
    assert cos.shape == (1, 5, sum(axes_dim) // 2)
    c0, _ = rope_table(jnp.asarray(ids[..., 0]), 4, 10_000)
    np.testing.assert_allclose(np.asarray(cos[..., :2]), np.asarray(c0), rtol=1e-6)


# ------------------------------- schedule -------------------------------

def test_timestep_embedding_matches_reference():
    t = np.array([0.0, 0.25, 0.5, 1.0], dtype=np.float32)
    want = ref_timestep_embedding(t, 256)
    got = timestep_embedding(jnp.asarray(t), 256)
    # args reach t*1000: fp32 exp/cos library differences are ~1e-4; anything
    # below bf16 resolution (~4e-3) is equivalent for the bf16 model inputs
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_get_schedule_endpoints_and_shift():
    s = get_schedule(30, 3456, shift=True)
    assert s.shape == (31,)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] == pytest.approx(0.0)
    assert np.all(np.diff(s) < 0)
    # shifted schedule is above the unshifted one for mu > 0 (favors noise)
    s_unshifted = get_schedule(30, 3456, shift=False)
    assert np.all(s[1:-1] > s_unshifted[1:-1])


def test_ode_timesteps_equals_reference_double_flip():
    """ode_timesteps in flux time == 1 - (reference t-grid after its shift)."""
    num_points, seq_len = 30, 3456
    mu = get_lin_function(y1=0.5, y2=1.15)(seq_len)
    t_ode = np.linspace(0.0, 1.0, num_points)
    want = np.array(
        [1.0 - ref_transport_time_shift(mu, 1.0, t) if 0 < t < 1 else 1.0 - t for t in t_ode]
    )
    got = ode_timesteps(num_points, seq_len, do_shift=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[0] == pytest.approx(1.0) and got[-1] == pytest.approx(0.0)


def test_ode_timesteps_strength_sdedit():
    # strength 0.4 (SDEdit): flux time starts at 1 - 0.4 = 0.6 when unshifted
    got = ode_timesteps(10, 1024, do_shift=False, strength=0.4)
    assert got[0] == pytest.approx(0.6)
    assert got[-1] == pytest.approx(0.0)
    assert len(got) == 10


def test_shift_training_time_matches_transport_sample_shift():
    """Transport.sample's shift (transport.py:123-127) in flux time."""
    mu = get_lin_function(y1=0.5, y2=1.15)(2048)
    t_ref = np.array([0.1, 0.4, 0.9])  # reference convention (1 = data)
    want_ref = np.array([ref_transport_time_shift(mu, 1.0, t) for t in t_ref])
    got = shift_training_time(jnp.asarray(1.0 - t_ref), 2048)  # flux time in
    np.testing.assert_allclose(np.asarray(got), 1.0 - want_ref, rtol=1e-5)


def test_time_shift_identity_points():
    assert time_shift(0.7, 1.0, 1.0) == pytest.approx(1.0)
    mu = 0.8
    assert time_shift(mu, 1.0, 0.5) == pytest.approx(math.exp(mu) / (math.exp(mu) + 1))


# ------------------------------- packing -------------------------------

def test_patchify_matches_einops_channel_first():
    rng = np.random.default_rng(1)
    h, w, c = 6, 8, 5
    lat_chw = rng.standard_normal((c, h, w)).astype(np.float32)
    want = einops.rearrange(lat_chw, "c (h ph) (w pw) -> (h w) (c ph pw)", ph=2, pw=2)
    got = patchify(jnp.asarray(lat_chw.transpose(1, 2, 0)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_unpatchify_roundtrip():
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((2, 12, 16, 16)).astype(np.float32)
    toks = patchify(jnp.asarray(lat))
    back = unpatchify(toks, 12, 16)
    np.testing.assert_allclose(np.asarray(back), lat, rtol=1e-6)


def test_pack_mask_matches_einops_two_stage():
    rng = np.random.default_rng(3)
    hpx, wpx = 32, 48
    mask = (rng.random((1, 1, hpx, wpx)) > 0.5).astype(np.float32)
    m1 = einops.rearrange(mask, "b c (h ph) (w pw) -> b (c ph pw) h w", ph=8, pw=8)
    want = einops.rearrange(m1, "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2)
    got = pack_mask(jnp.asarray(mask[:, 0]))
    np.testing.assert_allclose(np.asarray(got), want[0][None], rtol=1e-6)


def test_make_img_ids_matches_reference_loop():
    h_tok, w_tok, j = 3, 4, 2
    ids = make_img_ids(h_tok, w_tok, j)
    want = np.zeros((h_tok, w_tok, 3), dtype=np.float32)
    want[..., 0] = j + 1
    want[..., 1] += np.arange(h_tok)[:, None]
    want[..., 2] += np.arange(w_tok)[None, :]
    np.testing.assert_array_equal(ids, want.reshape(-1, 3))


def test_pack_sequences_pads_and_masks():
    t1 = np.ones((5, 4), np.float32)
    t2 = np.full((3, 4), 2.0, np.float32)
    ids1 = np.zeros((5, 3), np.float32)
    ids2 = np.zeros((3, 3), np.float32)
    img, img_ids, img_mask = pack_sequences([t1, t2], [ids1, ids2], pad_to=8)
    assert img.shape == (2, 8, 4)
    assert img_mask.tolist() == [[1] * 5 + [0] * 3, [1] * 3 + [0] * 5]
    np.testing.assert_array_equal(img[1, 3:], 0)


def test_bucket_length():
    assert bucket_length(1, 256) == 256
    assert bucket_length(256, 256) == 256
    assert bucket_length(257, 256) == 512


# ------------------------------- attention -------------------------------

def ref_attention_unpad(q, k, v, mask):
    """Simulate the reference's unpad -> exact attention -> re-pad-with-zeros."""
    b, h, L, d = q.shape
    out = np.zeros((b, h, L, d), dtype=np.float32)
    for i in range(b):
        valid = mask[i].astype(bool)
        qi, ki, vi = q[i][:, valid], k[i][:, valid], v[i][:, valid]
        logits = np.einsum("hqd,hkd->hqk", qi, ki) / math.sqrt(d)
        logits -= logits.max(axis=-1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=-1, keepdims=True)
        out[i][:, valid] = np.einsum("hqk,hkd->hqd", p, vi)
    return out


def test_mha_xla_matches_unpad_reference():
    rng = np.random.default_rng(4)
    b, h, L, d = 2, 3, 16, 8
    q = rng.standard_normal((b, h, L, d)).astype(np.float32)
    k = rng.standard_normal((b, h, L, d)).astype(np.float32)
    v = rng.standard_normal((b, h, L, d)).astype(np.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 10:] = 0
    mask[1, 13:] = 0
    want = ref_attention_unpad(q, k, v, mask)
    got = mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_to_bias(jnp.asarray(mask)))
    got = np.asarray(got) * mask[:, None, :, None]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attention_full_wrapper_shapes_and_padding_zeroed():
    rng = np.random.default_rng(5)
    b, h, L, d = 1, 4, 12, 16
    q = rng.standard_normal((b, h, L, d)).astype(np.float32)
    ids = np.zeros((b, L, 3), np.float32)
    ids[..., 1] = np.arange(L)
    cos, sin = embed_nd(jnp.asarray(ids), (4, 6, 6), 10_000)
    mask = np.ones((b, L), np.int32)
    mask[0, 9:] = 0
    out = attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), (cos, sin),
        mask=jnp.asarray(mask), impl="xla",
    )
    assert out.shape == (b, L, h * d)
    np.testing.assert_array_equal(np.asarray(out[0, 9:]), 0)


def test_flash_attention_interpret_matches_xla():
    """Pallas kernel in interpreter mode vs the XLA oracle."""
    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(6)
    b, h, L, d = 2, 2, 256, 32
    q = rng.standard_normal((b, h, L, d)).astype(np.float32)
    k = rng.standard_normal((b, h, L, d)).astype(np.float32)
    v = rng.standard_normal((b, h, L, d)).astype(np.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 200:] = 0
    bias = mask_to_bias(jnp.asarray(mask))

    import unittest.mock as um

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    with um.patch.object(fa.pl, "pallas_call", interp_call):
        got = fa._flash_fwd(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias,
            block_q=128, block_k=128,
        )
    want = mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_attention_fastmax_interpret():
    """fastmax (Cauchy-Schwarz stabilizer instead of the exact row max) is
    exact up to fp32 underflow headroom — including multi-k-block online
    rescaling and the padding bias."""
    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(11)
    b, h, L, d = 1, 2, 256, 32
    q = rng.standard_normal((b, h, L, d)).astype(np.float32)
    k = rng.standard_normal((b, h, L, d)).astype(np.float32)
    v = rng.standard_normal((b, h, L, d)).astype(np.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 230:] = 0
    bias = mask_to_bias(jnp.asarray(mask))

    import unittest.mock as um

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    with um.patch.object(fa.pl, "pallas_call", interp_call):
        got = fa._flash_fwd(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias,
            block_q=128, block_k=64, fastmax=True,
        )
    want = mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_flash_backward_interpret_matches_xla_grads():
    """Fused Pallas backward (interpret mode) vs XLA attention gradients."""
    import unittest.mock as um

    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    b, h, L, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 200:] = 0
    bias = mask_to_bias(jnp.asarray(mask))
    g = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    gm = g * jnp.asarray(mask)[:, None, :, None]  # masked-query do (wrapper contract)

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    with um.patch.object(fa.pl, "pallas_call", interp_call):
        for bias_case in (bias, None):
            do = gm if bias_case is not None else g
            out, vjp = jax.vjp(lambda q_, k_, v_: fa.flash_mha(q_, k_, v_, bias_case), q, k, v)
            dq, dk, dv = vjp(do)
            want_out, want_vjp = jax.vjp(
                lambda q_, k_, v_: mha_xla(q_, k_, v_, bias_case), q, k, v
            )
            wq, wk, wv = want_vjp(do)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), rtol=2e-4, atol=2e-4)
            valid_q = mask[:, None, :, None] if bias_case is not None else np.ones((b, 1, L, 1))
            np.testing.assert_allclose(
                np.asarray(dq) * valid_q, np.asarray(wq) * valid_q, rtol=2e-3, atol=2e-3
            )
            np.testing.assert_allclose(np.asarray(dk), np.asarray(wk), rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(dv), np.asarray(wv), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flash_backward_nonaligned_length():
    """Backward with internal padding (L not a lane multiple)."""
    import unittest.mock as um

    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(8)
    b, h, L, d = 1, 1, 200, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    with um.patch.object(fa.pl, "pallas_call", interp_call):
        out, vjp = jax.vjp(lambda q_: fa.flash_mha(q_, q_, q_, None), q)
        (dq,) = vjp(g)
    want_out, want_vjp = jax.vjp(lambda q_: mha_xla(q_, q_, q_, None), q)
    (wq,) = want_vjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq), rtol=2e-3, atol=2e-3)


def test_prepare_modified_broadcasts_single_image_to_prompts():
    import jax.numpy as jnp

    from visualcloze_tpu.models.sampling import prepare_modified

    def t5(prompts):
        return jnp.zeros((len(prompts), 4, 8))

    def clip(prompts):
        return jnp.zeros((len(prompts), 6))

    rows = [[jnp.zeros((4, 4, 2))]]
    out = prepare_modified(t5, clip, rows, ["a", "b"], proportion_empty_prompts=0.0)
    assert out["img"].shape[0] == 2 and out["img_mask"].shape[0] == 2

    import pytest

    with pytest.raises(ValueError, match="batch mismatch"):
        prepare_modified(t5, clip, [rows[0], rows[0], rows[0]], ["a", "b"],
                         proportion_empty_prompts=0.0)


def test_choose_block_bounded_waste_policy():
    """Block sizes decouple from sequence length: biggest power-of-two block
    whose internal padding waste stays under 12.5%."""
    from visualcloze_tpu.ops.flash_attention import _choose_block

    assert _choose_block(4096, 4096) == 4096   # exact
    assert _choose_block(3968, 4096) == 4096   # 3.2% waste, keep big block
    assert _choose_block(4608, 4096) == 1024   # 4096 would pad to 8192 (78%)
    assert _choose_block(512, 4096) == 512
    assert _choose_block(200, 512) == 128      # lane-width floor
    assert _choose_block(2176, 2048) == 256    # 2048->4096 (88%), 256->2304 (5.9%)


def test_flash_attention_nondividing_length_big_blocks_interpret():
    """L that no large block divides (e.g. 31*128) still runs with big blocks
    via internal block-multiple padding, matching the XLA oracle."""
    import unittest.mock as um

    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(11)
    b, h, L, d = 1, 2, 384, 32  # 3*128: block 256 pads to 512 -> falls to 128? 384*1.125=432 <512 -> 128
    q = rng.standard_normal((b, h, L, d)).astype(np.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 300:] = 0
    bias = mask_to_bias(jnp.asarray(mask))

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    with um.patch.object(fa.pl, "pallas_call", interp_call):
        got = fa._flash_fwd(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), bias,
            block_q=256, block_k=256,
        )
    want = mha_xla(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), bias)
    valid = mask[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid, rtol=2e-5, atol=2e-5
    )


def test_bucket_length_honors_small_buckets():
    # a bucket=128 caller gets 128-grain buckets (no hidden 256 floor)
    assert bucket_length(120, 128) == 128
    assert bucket_length(196, 128) == 256
    assert bucket_length(1, 128, minimum=256) == 256


def test_int8_matmul_rejects_non_lane_multiple_n():
    import pytest as _pytest

    from visualcloze_tpu.ops.int8_matmul import int8_matmul

    x = jnp.zeros((8, 128), jnp.bfloat16)
    w = jnp.zeros((128, 1000), jnp.int8)
    s = jnp.ones((1000,), jnp.float32)
    with _pytest.raises(ValueError, match="multiples of 128"):
        int8_matmul(x, w, s)


def test_caption_dropout_with_cached_embeddings():
    """Cached-embedding training: dropout must not silently keep the cached
    conditional embedding (reference behavior, models/sampling.py:79-101).
    With null_emb, dropped rows get the null embedding; without it, raise."""
    from visualcloze_tpu.models.sampling import prepare_modified

    rows = [[jnp.zeros((4, 4, 2))], [jnp.zeros((4, 4, 2))]]
    text_emb = [
        {"txt": np.full((4, 8), 2.0, np.float32), "vec": np.full((6,), 3.0, np.float32)}
        for _ in range(2)
    ]
    null_emb = {"txt": np.zeros((4, 8), np.float32), "vec": np.zeros((6,), np.float32)}

    with pytest.raises(ValueError, match="null_emb"):
        prepare_modified(None, None, rows, ["a", "b"],
                         proportion_empty_prompts=0.5, text_emb=text_emb)

    out = prepare_modified(
        None, None, rows, ["a", "b"], proportion_empty_prompts=1.0,
        text_emb=text_emb, null_emb=null_emb,
        rng=np.random.default_rng(0),
    )
    assert np.asarray(out["drop_mask"]).tolist() == [0, 0]
    np.testing.assert_array_equal(np.asarray(out["txt"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["vec"]), 0.0)

    out2 = prepare_modified(
        None, None, rows, ["a", "b"], proportion_empty_prompts=0.0,
        text_emb=text_emb, null_emb=null_emb,
    )
    np.testing.assert_array_equal(np.asarray(out2["txt"]), 2.0)
    np.testing.assert_array_equal(np.asarray(out2["vec"]), 3.0)


def _interp_patch(fa):
    import unittest.mock as um

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    return um.patch.object(fa.pl, "pallas_call", interp_call)


def test_flash_rope_fused_interpret_matches_xla():
    """RoPE-fused forward (rotation inside the kernel, half layout) vs
    XLA rotate-then-attend, with padding bias and a non-block length."""
    from visualcloze_tpu.ops import flash_attention as fa
    from visualcloze_tpu.ops.rope import apply_rope_half, embed_nd

    rng = np.random.default_rng(7)
    for L, with_mask in ((256, True), (192, True), (256, False)):
        b, h, d = 2, 2, 32
        q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        ids = np.stack(
            [np.zeros(L), np.arange(L) // 16, np.arange(L) % 16], -1
        )[None].repeat(b, 0)
        cos, sin = embed_nd(jnp.asarray(ids, jnp.float32), (8, 12, 12), 10_000)
        bias = None
        if with_mask:
            mask = np.ones((b, L), np.int32)
            mask[0, L - 40 :] = 0
            bias = mask_to_bias(jnp.asarray(mask))

        with _interp_patch(fa):
            got = fa._flash_fwd_rope(q, k, v, bias, cos, sin,
                                     block_q=128, block_k=128)
        qr = apply_rope_half(q, cos[:, None], sin[:, None])
        kr = apply_rope_half(k, cos[:, None], sin[:, None])
        want = mha_xla(qr, kr, v, bias)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
        )


def test_flash_rope_fused_vjp_matches_xla_grads():
    """flash_mha_rope gradients (w.r.t. UNROTATED q/k and v) vs autodiff
    through the XLA rotate-then-attend path."""
    from visualcloze_tpu.ops import flash_attention as fa
    from visualcloze_tpu.ops.rope import apply_rope_half, embed_nd

    rng = np.random.default_rng(8)
    b, h, L, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    ids = np.stack([np.zeros(L), np.arange(L) // 16, np.arange(L) % 16], -1)[None]
    cos, sin = embed_nd(jnp.asarray(ids, jnp.float32), (8, 12, 12), 10_000)
    mask = np.ones((b, L), np.int32)
    mask[0, 230:] = 0
    bias = mask_to_bias(jnp.asarray(mask))
    g = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)

    def ref_fn(q_, k_, v_):
        qr = apply_rope_half(q_, cos[:, None], sin[:, None])
        kr = apply_rope_half(k_, cos[:, None], sin[:, None])
        return mha_xla(qr, kr, v_, bias)

    want_out, ref_vjp = jax.vjp(ref_fn, q, k, v)
    want_grads = ref_vjp(g)

    with _interp_patch(fa):
        got_out, fused_vjp = jax.vjp(
            lambda q_, k_, v_: fa.flash_mha_rope(q_, k_, v_, bias, cos, sin), q, k, v
        )
        got_grads = fused_vjp(g)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=2e-5, atol=2e-5)
    for got_g, want_g, name in zip(got_grads, want_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_attention_dispatch_fuses_rope_on_pallas_half():
    """attention() with pe + half layout + pallas routes through the fused
    kernel and matches the xla path bit-for-bit-ish."""
    from visualcloze_tpu.ops import flash_attention as fa
    from visualcloze_tpu.ops.rope import embed_nd

    rng = np.random.default_rng(9)
    b, h, L, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    ids = np.stack([np.zeros(L), np.arange(L) // 16, np.arange(L) % 16], -1)[None]
    pe = embed_nd(jnp.asarray(ids, jnp.float32), (8, 12, 12), 10_000)
    mask = jnp.asarray(np.ones((b, L), np.int32))

    want = attention(q, k, v, pe, mask=mask, impl="xla", rope_layout="half")
    with _interp_patch(fa):
        got = attention(q, k, v, pe, mask=mask, impl="pallas", rope_layout="half")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_pipelined_interpret_matches_xla():
    """Software-pipelined serving forward (s-tile ping-pong, output lagging
    one q block) vs the XLA oracle — including both-side padding, a
    fully-masked batch row, and the no-bias route."""
    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(12)
    for L, with_mask in ((256, True), (200, True), (384, False)):
        b, h, d = 2, 2, 32
        q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        bias = None
        valid = np.ones((b, 1, L, 1), np.float32)
        if with_mask:
            mask = np.ones((b, L), np.int32)
            mask[0, L - 40:] = 0
            mask[1, :] = 0  # fully masked row: zeros out, no NaN
            bias = mask_to_bias(jnp.asarray(mask))
            valid[1] = 0.0
        lq_p = L + (-L) % fa.PIPELINE_BLOCK_Q
        assert fa._pipeline_fits(lq_p, L + (-L) % 128, d, rope=False)

        with _interp_patch(fa):
            got = fa.flash_mha(q, k, v, bias)
        want = mha_xla(q, k, v, bias)
        assert got.shape == q.shape
        np.testing.assert_allclose(
            np.asarray(got) * valid, np.asarray(want) * valid, rtol=2e-5, atol=2e-5
        )
        if with_mask:
            np.testing.assert_array_equal(np.asarray(got[1]), 0.0)


def test_flash_pipelined_matches_blocked_kernel():
    """Pipeline on/off produce identical outputs (same math, reordered)."""
    import unittest.mock as um

    from visualcloze_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(13)
    b, h, L, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, 220:] = 0
    bias = mask_to_bias(jnp.asarray(mask))

    with _interp_patch(fa):
        piped = fa.flash_mha(q, q, q, bias)
        with um.patch.object(fa, "_PIPELINE_ENABLED", False):
            blocked = fa.flash_mha(q, q, q, bias)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(blocked),
                               rtol=1e-6, atol=1e-6)


def test_flash_pipelined_rope_interpret_matches_xla():
    """RoPE-fused pipelined route (flash_mha_rope default when shapes fit):
    K rotated once into a resident scratch, q per block."""
    from visualcloze_tpu.ops import flash_attention as fa
    from visualcloze_tpu.ops.rope import apply_rope_half, embed_nd

    rng = np.random.default_rng(14)
    for L, with_mask in ((256, True), (192, False)):
        b, h, d = 2, 2, 32
        q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
        ids = np.stack(
            [np.zeros(L), np.arange(L) // 16, np.arange(L) % 16], -1
        )[None].repeat(b, 0)
        cos, sin = embed_nd(jnp.asarray(ids, jnp.float32), (8, 12, 12), 10_000)
        bias = None
        if with_mask:
            mask = np.ones((b, L), np.int32)
            mask[0, L - 40:] = 0
            bias = mask_to_bias(jnp.asarray(mask))
        assert fa._pipeline_fits(L + (-L) % 128, L + (-L) % 128, d, rope=True)

        with _interp_patch(fa):
            got = fa.flash_mha_rope(q, k, v, bias, cos, sin)
        qr = apply_rope_half(q, cos[:, None], sin[:, None])
        kr = apply_rope_half(k, cos[:, None], sin[:, None])
        want = mha_xla(qr, kr, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_pipeline_fits_guard():
    from visualcloze_tpu.ops.flash_attention import (
        PIPELINE_BLOCK_Q, _pipeline_fits)

    assert _pipeline_fits(3968, 4096, 128, rope=True)    # serving stage-1
    assert _pipeline_fits(4608, 4608, 128, rope=True)    # stage-2 SDEdit
    assert not _pipeline_fits(3968 + 64, 4096, 128, rope=False)  # not bq-divisible
    assert not _pipeline_fits(8192, 16384, 128, rope=False)      # s tiles too big
    assert PIPELINE_BLOCK_Q % 128 == 0

    # rope residents (fp32 ck/sk table rows + rotated-k scratch) count: just
    # above the serving sizes the rope path must fall back to the blocked
    # kernel rather than fail Mosaic VMEM allocation (s tiles 5.5 MB + kv
    # 2.75 MB + krot 1.4 MB + tables 5.5 MB > budget at 5376)
    for lk_p in (5376, 5632, 6144, 6528):
        assert not _pipeline_fits(lk_p - lk_p % 128, lk_p, 128, rope=True)
    # ... while the same shapes WITHOUT rope (no resident tables) still fit
    assert _pipeline_fits(5376, 5376, 128, rope=False)
    assert _pipeline_fits(6400, 6400, 128, rope=False)
