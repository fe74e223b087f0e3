"""Text conditioning: tokenizer + encoder facade.

TPU-native counterpart of the reference HFEmbedder
(models/modules/conditioner.py:5-37): pad-to-max tokenization, no attention
mask passed to either encoder, T5 returns last_hidden_state and CLIP returns
pooler_output.

Tokenizers load from a local HF snapshot when available (offline-friendly);
tests inject a deterministic FallbackTokenizer. Tokenization runs on host;
encoding is a jitted scan over layers.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig, T5Config
from .clip import clip_encode
from .t5 import t5_encode

Params = dict[str, Any]


class FallbackTokenizer:
    """Deterministic hash tokenizer for offline/test use — NOT a parity
    tokenizer; real deployments point at a local HF tokenizer snapshot."""

    def __init__(self, vocab_size: int, pad_id: int = 0, eos_id: int = 1, bos_id: int | None = None):
        self.vocab_size = vocab_size
        self.pad_id = pad_id
        self.eos_id = eos_id
        self.bos_id = bos_id

    def __call__(self, texts: Sequence[str], max_length: int) -> np.ndarray:
        out = np.full((len(texts), max_length), self.pad_id, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = []
            if self.bos_id is not None:
                ids.append(self.bos_id)
            for w in text.split():
                h = 0
                for ch in w:
                    h = (h * 131 + ord(ch)) % (self.vocab_size - 16)
                ids.append(h + 8)
            ids.append(self.eos_id)
            if len(ids) > max_length:
                # truncate CONTENT, keep EOS last — HF tokenizers keep the
                # final </s> under truncation, and downstream encoders treat
                # the EOS position specially
                ids = ids[: max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


def load_hf_tokenizer(path: str):
    """Load a transformers tokenizer from a local directory (no network)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, local_files_only=True)


class HFTokenizerAdapter:
    def __init__(self, tok):
        self.tok = tok

    def __call__(self, texts: Sequence[str], max_length: int) -> np.ndarray:
        enc = self.tok(
            list(texts),
            truncation=True,
            max_length=max_length,
            return_length=False,
            return_overflowing_tokens=False,
            padding="max_length",
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


class TextEncoder:
    """Uniform wrapper over T5 (sequence features) and CLIP (pooled vector),
    mirroring HFEmbedder's call signature: encoder(prompts) -> array."""

    def __init__(
        self,
        kind: str,
        cfg: T5Config | CLIPTextConfig,
        params: Params,
        tokenizer,
        max_length: int | None = None,
    ):
        assert kind in ("t5", "clip")
        self.kind = kind
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length or cfg.max_length
        if kind == "t5":
            self._encode = jax.jit(functools.partial(t5_encode, cfg))
        else:
            self._encode = jax.jit(functools.partial(clip_encode, cfg))

    def __call__(self, prompts: str | Sequence[str]) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = jnp.asarray(self.tokenizer(prompts, self.max_length))
        if self.kind == "t5":
            return self._encode(self.params, ids)
        _, pooled = self._encode(self.params, ids)
        return pooled


def default_tokenizer(kind: str, local_path: str | None = None):
    """Local HF tokenizer if a snapshot path is given/found, else fallback."""
    env = {"t5": "T5_TOKENIZER_PATH", "clip": "CLIP_TOKENIZER_PATH"}[kind]
    path = local_path or os.environ.get(env)
    if path and os.path.isdir(path):
        return HFTokenizerAdapter(load_hf_tokenizer(path))
    if kind == "t5":
        return FallbackTokenizer(vocab_size=32100, pad_id=0, eos_id=1)
    return FallbackTokenizer(vocab_size=49408, pad_id=49407, eos_id=49407, bos_id=49406)
