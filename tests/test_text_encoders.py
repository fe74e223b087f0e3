"""T5/CLIP JAX encoders vs HF transformers (torch) on tiny random configs —
this validates both the model math and the weight converters end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from visualcloze_tpu.config import CLIPTextConfig, T5Config
from visualcloze_tpu.models.clip import clip_encode, init_clip
from visualcloze_tpu.models.conditioner import FallbackTokenizer, TextEncoder
from visualcloze_tpu.models.t5 import init_t5, t5_encode
from visualcloze_tpu.models.weights import convert_clip, convert_t5

T5_TINY = T5Config().tiny()
CLIP_TINY = CLIPTextConfig().tiny()


@pytest.fixture(scope="module")
def hf_t5():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=T5_TINY.vocab_size,
        d_model=T5_TINY.d_model,
        d_kv=T5_TINY.d_kv,
        d_ff=T5_TINY.d_ff,
        num_layers=T5_TINY.num_layers,
        num_heads=T5_TINY.num_heads,
        relative_attention_num_buckets=T5_TINY.relative_attention_num_buckets,
        relative_attention_max_distance=T5_TINY.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPTextConfig as HFCLIPTextConfig, CLIPTextModel

    hf_cfg = HFCLIPTextConfig(
        vocab_size=CLIP_TINY.vocab_size,
        hidden_size=CLIP_TINY.hidden_size,
        intermediate_size=CLIP_TINY.intermediate_size,
        num_hidden_layers=CLIP_TINY.num_layers,
        num_attention_heads=CLIP_TINY.num_heads,
        max_position_embeddings=CLIP_TINY.max_length,
        hidden_act="quick_gelu",
        eos_token_id=2,  # forces the argmax pooling path (CLIP-L behavior)
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = CLIPTextModel(hf_cfg).eval()
    return model


def test_t5_matches_transformers(hf_t5):
    params = convert_t5({k: v for k, v in hf_t5.state_dict().items()}, T5_TINY)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, T5_TINY.vocab_size, size=(2, T5_TINY.max_length)).astype(np.int32)
    with torch.no_grad():
        want = hf_t5(input_ids=torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    got = t5_encode(T5_TINY, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_t5_bucket_function_matches_transformers():
    from transformers.models.t5.modeling_t5 import T5Attention

    from visualcloze_tpu.models.t5 import relative_position_bucket

    rel = np.arange(-300, 300).reshape(1, -1)
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    got = relative_position_bucket(rel, num_buckets=32, max_distance=128)
    np.testing.assert_array_equal(got, want)


def test_clip_matches_transformers(hf_clip):
    params = convert_clip({k: v for k, v in hf_clip.state_dict().items()}, CLIP_TINY)
    rng = np.random.default_rng(1)
    L = CLIP_TINY.max_length
    ids = rng.integers(3, CLIP_TINY.vocab_size - 2, size=(2, L)).astype(np.int32)
    # plant an EOT (highest id) mid-sequence, pad after
    ids[:, 6] = CLIP_TINY.vocab_size - 1
    ids[:, 7:] = 0
    with torch.no_grad():
        out = hf_clip(input_ids=torch.from_numpy(ids.astype(np.int64)))
        want_h = out.last_hidden_state.numpy()
        want_p = out.pooler_output.numpy()
    got_h, got_p = clip_encode(CLIP_TINY, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=2e-4, atol=2e-4)


def test_text_encoder_facade_shapes():
    t5p = init_t5(jax.random.PRNGKey(0), T5_TINY)
    clipp = init_clip(jax.random.PRNGKey(1), CLIP_TINY)
    t5 = TextEncoder("t5", T5_TINY, t5p, FallbackTokenizer(T5_TINY.vocab_size))
    clip = TextEncoder(
        "clip", CLIP_TINY, clipp,
        FallbackTokenizer(CLIP_TINY.vocab_size, pad_id=0, eos_id=CLIP_TINY.vocab_size - 1, bos_id=3),
    )
    txt = t5(["a photo of a cat", "hello"])
    assert txt.shape == (2, T5_TINY.max_length, T5_TINY.d_model)
    vec = clip("a photo of a cat")
    assert vec.shape == (1, CLIP_TINY.hidden_size)


def test_fallback_tokenizer_deterministic():
    tok = FallbackTokenizer(1000)
    a = tok(["hello world"], 16)
    b = tok(["hello world"], 16)
    np.testing.assert_array_equal(a, b)
    assert a[0, 2] == 1  # eos after two tokens
