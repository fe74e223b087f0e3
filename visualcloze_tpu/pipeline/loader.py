"""Component loading: checkpoints -> a ready VisualClozeModel.

TPU-native counterpart of the reference's model loading
(models/util.py:384-431 load_flow_model/load_t5/load_clip +
visualcloze.py:79-139): base FLUX safetensors with img_in zero-expansion,
LoRA overlay (folded into the weights here — models/lora.fold_lora), VAE and
text encoders, optional mesh sharding.

Offline-friendly: every path can come from env vars (FLUX_DEV_FILL, AE,
T5_PATH, CLIP_PATH — the reference's env override convention), and
`random_components` builds a randomly-initialized stack for tests/benchmarks.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    AutoEncoderConfig,
    CLIPTextConfig,
    FluxConfig,
    T5Config,
    checkpoint_path_env,
    configs,
)
from ..models import weights as W
from ..models.autoencoder import AutoEncoder, init_autoencoder
from ..models.clip import init_clip
from ..models.conditioner import TextEncoder, default_tokenizer
from ..models.flux import init_flux
from ..models.lora import fold_lora, init_lora
from ..models.t5 import init_t5
from ..parallel import shard_params
from .visualcloze import VisualClozeModel


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pth (torch) or .safetensors state dict as numpy arrays."""
    if path.endswith(".safetensors"):
        return W.load_safetensors(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: W._np(v) for k, v in state.items()}


def load_sharded_safetensors(directory: str) -> dict[str, np.ndarray]:
    """Merge all *.safetensors shards in a directory (HF snapshot layout)."""
    state: dict[str, np.ndarray] = {}
    for path in sorted(glob.glob(os.path.join(directory, "*.safetensors"))):
        state.update(W.load_safetensors(path))
    if not state:
        raise FileNotFoundError(f"no safetensors found under {directory}")
    return state


def load_flux_state(path: str) -> dict[str, np.ndarray]:
    """Load a FLUX transformer state dict from a safetensors file, a directory
    of shards, or a diffusers pipeline snapshot (its transformer/ subdir)."""
    if os.path.isdir(path):
        sub = os.path.join(path, "transformer")
        return load_sharded_safetensors(sub if os.path.isdir(sub) else path)
    return W.load_safetensors(path)


def convert_flux_any(state: dict[str, np.ndarray], flux_cfg, dtype=None) -> dict:
    """Dispatch on the checkpoint's wire format: BFL naming or diffusers
    FluxTransformer2DModel naming (the released VisualClozePipeline-384/-512,
    ref README.md:140-198)."""
    if W.is_diffusers_flux_state(state):
        return W.convert_flux_diffusers(state, flux_cfg, dtype)
    return W.convert_flux(state, flux_cfg, dtype)


def convert_lora_any(state: dict[str, np.ndarray], flux_cfg, dtype=None) -> dict:
    """Dispatch: reference-trainer LoRA naming (lora_A/lora_B on BFL modules)
    or diffusers/peft naming (VisualClozePipeline-LoRA-384/-512)."""
    if W.is_diffusers_lora_state(state):
        return W.convert_lora_diffusers(state, flux_cfg, dtype)
    return W.convert_lora(state, flux_cfg, dtype)


def load_flux_params(
    model_name: str,
    lora_path: str | None = None,
    lora_scale: float = 1.0,
    dtype=jnp.bfloat16,
    base_path: str | None = None,
) -> tuple[FluxConfig, dict]:
    """Base weights + optional LoRA overlay, folded (ref visualcloze.py:105-112).

    Base may be BFL safetensors or a diffusers snapshot dir; the LoRA may be a
    reference-trainer .pth or a diffusers-format safetensors."""
    spec = configs[model_name]
    base_path = base_path or checkpoint_path_env(model_name)
    if base_path is None or not os.path.exists(base_path):
        raise FileNotFoundError(
            f"set {model_name}'s checkpoint env var (e.g. FLUX_DEV_FILL) to a "
            "local safetensors file or diffusers snapshot directory"
        )
    state = load_flux_state(base_path)
    params = convert_flux_any(state, spec.flux, dtype=np.float32)
    if lora_path:
        lora_state = load_torch_checkpoint(lora_path)
        lora = convert_lora_any(lora_state, spec.flux, dtype=np.float32)
        params = fold_lora(params, lora, scale=lora_scale)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return spec.flux, params


def load_ae(dtype=jnp.bfloat16, path: str | None = None) -> AutoEncoder:
    cfg = AutoEncoderConfig()
    path = path or os.environ.get("AE")
    if path is None or not os.path.exists(path):
        raise FileNotFoundError("set AE env var to a local VAE safetensors file")
    state = load_sharded_safetensors(path) if os.path.isdir(path) else W.load_safetensors(path)
    params = W.convert_vae(state, cfg, dtype=None)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return AutoEncoder(cfg, params)


def load_t5(
    max_length: int = 512, dtype=jnp.bfloat16, directory: str | None = None,
    tokenizer_dir: str | None = None,
) -> TextEncoder:
    cfg = T5Config(max_length=max_length)
    directory = directory or os.environ.get("T5_PATH")
    if directory is None or not os.path.isdir(directory):
        raise FileNotFoundError("set T5_PATH env var to a local T5-XXL snapshot dir")
    state = load_sharded_safetensors(directory)
    params = W.convert_t5(state, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return TextEncoder(
        "t5", cfg, params, default_tokenizer("t5", tokenizer_dir or directory), max_length
    )


def load_clip(
    dtype=jnp.bfloat16, directory: str | None = None, tokenizer_dir: str | None = None
) -> TextEncoder:
    cfg = CLIPTextConfig()
    directory = directory or os.environ.get("CLIP_PATH")
    if directory is None or not os.path.isdir(directory):
        raise FileNotFoundError("set CLIP_PATH env var to a local CLIP-L snapshot dir")
    state = load_sharded_safetensors(directory)
    params = W.convert_clip(state, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return TextEncoder(
        "clip", cfg, params, default_tokenizer("clip", tokenizer_dir or directory),
        cfg.max_length,
    )


def is_diffusers_snapshot(path: str | None) -> bool:
    """True for a diffusers pipeline snapshot directory (the layout the
    released VisualClozePipeline-384/-512 ship in: model_index.json +
    transformer/ vae/ text_encoder*/ tokenizer*/ subfolders)."""
    return bool(path) and os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "model_index.json"))
        or os.path.isdir(os.path.join(path, "transformer"))
    )


def build_visualcloze(
    model_path: str | None = None,
    model_name: str = "flux-dev-fill-lora",
    max_length: int = 512,
    lora_rank: int = 256,
    solver: str = "euler",
    time_shifting_factor: float = 1.0,
    resolution: int = 384,
    mesh=None,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    quantize: str | None = None,
    calib_queries=None,
) -> VisualClozeModel:
    """Reference-parity constructor (visualcloze.py:79-139 signature).

    model_path: the trained VisualCloze LoRA checkpoint (.pth/.safetensors,
    reference-trainer or diffusers/peft LoRA format) OR a diffusers pipeline
    snapshot directory (the released VisualClozePipeline-384/-512: LoRA
    already merged into transformer/; vae/ and the text encoders are taken
    from the snapshot when present, else from the env-var paths).
    quantize="int8": weight-only int8 DiT (single-chip 12B serving,
    models/quant.py). For 16 GB chips, load the quantized tree through
    pipeline/serving.py (save_params_dir once, then compile-first +
    format-matched device_put via load_compiled_params) — a plain whole-tree
    device_put can trigger a PJRT relayout copy that OOMs; bench.py phase B
    is the worked example of the serving path.
    """
    del lora_rank  # rank is read from the checkpoint shapes
    snapshot = model_path if is_diffusers_snapshot(model_path) else None
    if snapshot:
        flux_cfg, params = load_flux_params(
            model_name, lora_path=None, dtype=dtype, base_path=snapshot
        )
    else:
        flux_cfg, params = load_flux_params(model_name, lora_path=model_path, dtype=dtype)
    if quantize == "int8":
        from ..models.quant import quantize_flux_int8

        params = quantize_flux_int8(params)
    elif quantize == "w8a8":
        # int8 weights AND per-token dynamic int8 activations — the MXU's
        # double-rate int8 path (models/quant.quantize_flux_w8a8). Opt-in;
        # quality gated on real-weight validation like int4.
        from ..models.quant import quantize_flux_w8a8

        params = quantize_flux_w8a8(params)
    elif quantize == "w8a8_smooth":
        pass  # calibration needs the constructed pipeline — handled below
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    # NOTE: mesh sharding happens AFTER VisualClozeModel construction — the
    # constructor's rope-layout permutation runs on the host, and sharding
    # first would mean gather-to-host + re-shard for the largest DiT leaves.

    def sub(name: str) -> str | None:
        p = os.path.join(snapshot, name) if snapshot else None
        return p if p and os.path.isdir(p) else None

    model = VisualClozeModel(
        flux_cfg,
        params,
        load_ae(dtype, path=sub("vae")),
        load_t5(max_length, dtype, directory=sub("text_encoder_2"),
                tokenizer_dir=sub("tokenizer_2")),
        load_clip(dtype, directory=sub("text_encoder"),
                  tokenizer_dir=sub("tokenizer")),
        resolution=resolution,
        solver=solver,
        time_shifting_factor=time_shifting_factor,
        attn_impl=attn_impl,
    )
    if quantize == "w8a8_smooth":
        # SmoothQuant-equalized w8a8: calibrate (on calib_queries if given,
        # else a blank demo grid) with the unquantized tree resident, then
        # quantize in place (VisualClozeModel.calibrate_w8a8_smooth).
        # This path needs bf16-tree headroom and re-calibrates per process —
        # it is the CALIBRATION seam, not the 16 GB-chip serving path. For
        # production single-chip serving: run this once on the CPU host (or
        # a large chip), persist the quantized tree with
        # pipeline/serving.save_params_dir(model.params, dir) (the leaf
        # store round-trips the a8/a_sinv leaves), and serve it via the
        # compile-first + format-matched load (serving.load_params_dir /
        # load_compiled_params — bench.py phase B is the worked example).
        model.calibrate_w8a8_smooth(queries=calib_queries)
    if mesh is not None:
        model.params = shard_params(model.params, mesh)
    return model


def random_components(
    key: jax.Array,
    tiny: bool = True,
    dtype=jnp.float32,
    resolution: int = 384,
    attn_impl: str = "auto",
    mesh=None,
    rope_layout: str = "half",
) -> VisualClozeModel:
    """Randomly initialized pipeline (tests, benchmarks, offline demos).

    rope_layout: "half" (serving default: params permuted at construction)
    or "interleaved" (reference channel order kept — the trainer uses this
    so exported LoRA checkpoints live in the reference's weight space)."""
    flux_cfg = FluxConfig().tiny() if tiny else FluxConfig()
    ae_cfg = AutoEncoderConfig().tiny() if tiny else AutoEncoderConfig()
    t5_cfg = T5Config().tiny() if tiny else T5Config()
    clip_cfg = CLIPTextConfig().tiny() if tiny else CLIPTextConfig()
    if tiny:
        # tiny flux must still consume 16-ch latents + 256-ch mask: in=384
        # stays structural only for the full model; tiny uses the real ratios
        import dataclasses

        flux_cfg = dataclasses.replace(
            flux_cfg,
            in_channels=4 * ae_cfg.z_channels + 256 + 4 * ae_cfg.z_channels,
            out_channels=4 * ae_cfg.z_channels,
            vec_in_dim=clip_cfg.hidden_size,
            context_in_dim=t5_cfg.d_model,
        )
    ks = jax.random.split(key, 4)
    params = init_flux(ks[0], flux_cfg, dtype=dtype)
    ae = AutoEncoder(ae_cfg, init_autoencoder(ks[1], ae_cfg, dtype=dtype))
    t5 = TextEncoder(
        "t5", t5_cfg, init_t5(ks[2], t5_cfg, dtype=dtype), default_tokenizer("t5", None)
        if not tiny else _tiny_tokenizer(t5_cfg.vocab_size),
        t5_cfg.max_length,
    )
    clip = TextEncoder(
        "clip", clip_cfg, init_clip(ks[3], clip_cfg, dtype=dtype),
        _tiny_tokenizer(clip_cfg.vocab_size) if tiny else default_tokenizer("clip", None),
        clip_cfg.max_length,
    )
    model = VisualClozeModel(
        flux_cfg, params, ae, t5, clip, resolution=resolution,
        attn_impl=attn_impl, rope_layout=rope_layout,
    )
    if mesh is not None:  # after the constructor's rope permutation
        model.params = shard_params(model.params, mesh)
    return model


def _tiny_tokenizer(vocab_size: int):
    from ..models.conditioner import FallbackTokenizer

    return FallbackTokenizer(vocab_size)


def synthetic_full_components(
    key: jax.Array,
    resolution: int = 384,
    attn_impl: str = "auto",
    solver: str = "euler",
    t5_int4: bool = True,
    tiny: bool = False,
) -> VisualClozeModel:
    """FULL-SIZE serving stack with random weights initialized ON DEVICE —
    the resident-serving bench seam (serve.py --synthetic_full): proves one
    process can hold the production single-chip topology (12B int8 DiT +
    int4 T5-XXL + CLIP-L + VAE co-resident on 16 GB) and serve real HTTP
    queries, without FLUX checkpoints in the environment and without
    streaming ~12 GB over a slow host link.

    HBM sequencing: the quantized trees are initialized DIRECTLY in their
    quantized layouts (init_t5_int4 / init_clip_int8 / init_flux_int8), so
    peak HBM equals resident HBM (~14 GiB on a 15 GiB-usable chip). The
    init-bf16-then-quantize route transiently holds the 9.2 GB bf16 T5 plus
    fp32 quantization temps — measured to OOM next to the 12 GB int8 DiT.
    t5_int4=False keeps T5 bf16 — only viable with >=2 chips or >16 GB HBM
    (docs/SERVING.md serving topology).

    tiny=True shrinks every config (random_components' dimensions) so the
    wiring — int8 DiT + int4 T5 + int8 CLIP + unpermuted half layout — is
    testable on CPU; serve.py always uses the full size."""
    import dataclasses

    from ..models.quant import init_clip_int8, init_flux_int8, init_t5_int4

    if tiny:
        flux_cfg, ae_cfg = FluxConfig().tiny(), AutoEncoderConfig().tiny()
        t5_cfg, clip_cfg = T5Config().tiny(), CLIPTextConfig().tiny()
        flux_cfg = dataclasses.replace(
            flux_cfg,
            in_channels=4 * ae_cfg.z_channels + 256 + 4 * ae_cfg.z_channels,
            out_channels=4 * ae_cfg.z_channels,
            vec_in_dim=clip_cfg.hidden_size,
            context_in_dim=t5_cfg.d_model,
        )
    else:
        flux_cfg = FluxConfig()
        ae_cfg, t5_cfg, clip_cfg = AutoEncoderConfig(), T5Config(), CLIPTextConfig()
    def settle(tree):
        # sync + flush so deferred buffer FREES land before the next multi-GB
        # allocation (on a remote-attached device frees can trail the host by
        # a beat — see visualcloze.VisualClozeModel._retry_oom)
        import numpy as np

        jax.block_until_ready(tree)
        np.asarray(jax.device_get(jnp.zeros((1,), jnp.float32)))

    ks = jax.random.split(key, 4)
    if t5_int4:
        t5_params = init_t5_int4(ks[0], t5_cfg)
    else:
        t5_params = init_t5(ks[0], t5_cfg, dtype=jnp.bfloat16)
    settle(t5_params)
    flux_params = init_flux_int8(ks[1], flux_cfg)
    settle(flux_params)
    ae = AutoEncoder(ae_cfg, init_autoencoder(ks[2], ae_cfg, dtype=jnp.bfloat16))
    t5 = TextEncoder(
        "t5", t5_cfg, t5_params, _tiny_tokenizer(t5_cfg.vocab_size), t5_cfg.max_length
    )
    clip = TextEncoder(
        "clip", clip_cfg, init_clip_int8(ks[3], clip_cfg),
        _tiny_tokenizer(clip_cfg.vocab_size), clip_cfg.max_length,
    )
    return VisualClozeModel(
        flux_cfg, flux_params, ae, t5, clip, resolution=resolution,
        solver=solver, attn_impl=attn_impl, rope_layout="half",
        # random weights: any channel order is already a valid half layout;
        # permuting would round-trip the device tree through the host link
        permute_params=False,
        # ~14 GiB resident on one 16 GiB chip: serialize per-stage program
        # dispatch so concurrent temp reservations cannot exhaust the
        # remaining HBM (visualcloze.py hbm_serialize)
        hbm_serialize=not tiny,
    )
