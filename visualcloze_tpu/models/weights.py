"""Checkpoint converters: torch/safetensors state dicts <-> parameter pytrees.

TPU-native counterpart of the reference's weight loading
(models/util.py:384-472 load_flow_model / optionally_expand_state_dict and
visualcloze.py:111-112 LoRA overlay). Sources handled:
  - BFL FLUX safetensors (flux1-fill-dev.safetensors naming),
  - reference-trainer LoRA checkpoints (consolidated*.pth, lora_A/lora_B keys),
  - BFL VAE (ae.safetensors) and diffusers AutoencoderKL naming,
  - HF T5EncoderModel and CLIPTextModel state dicts.

Conventions: torch Linear weights are (out, in) -> stored (in, out) here;
convs are (out, in, kh, kw) -> (kh, kw, in, out); per-block tensors are
stacked along a leading depth axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import numpy as np

from ..config import AutoEncoderConfig, CLIPTextConfig, FluxConfig, T5Config

Params = dict[str, Any]
State = Mapping[str, np.ndarray]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu")
        if x.dtype.__str__() == "torch.bfloat16":
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _lin(state: State, key: str, dtype=None) -> Params:
    w = _np(state[f"{key}.weight"]).T  # (out,in) -> (in,out)
    p = {"w": w if dtype is None else w.astype(dtype)}
    bkey = f"{key}.bias"
    if bkey in state:
        b = _np(state[bkey])
        p["b"] = b if dtype is None else b.astype(dtype)
    return p


def _stack(trees: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


# ----------------------------- Flux -----------------------------

_TOP_LINS = {
    ("img_in",): "img_in",
    ("txt_in",): "txt_in",
    ("time_in", "in_layer"): "time_in.in_layer",
    ("time_in", "out_layer"): "time_in.out_layer",
    ("vector_in", "in_layer"): "vector_in.in_layer",
    ("vector_in", "out_layer"): "vector_in.out_layer",
    ("guidance_in", "in_layer"): "guidance_in.in_layer",
    ("guidance_in", "out_layer"): "guidance_in.out_layer",
    ("final_layer", "linear"): "final_layer.linear",
    ("final_layer", "adaLN"): "final_layer.adaLN_modulation.1",
}

_DOUBLE_LINS = {
    ("img_mod", "lin"): "img_mod.lin",
    ("txt_mod", "lin"): "txt_mod.lin",
    ("img_attn", "qkv"): "img_attn.qkv",
    ("img_attn", "proj"): "img_attn.proj",
    ("txt_attn", "qkv"): "txt_attn.qkv",
    ("txt_attn", "proj"): "txt_attn.proj",
    ("img_mlp", "0"): "img_mlp.0",
    ("img_mlp", "2"): "img_mlp.2",
    ("txt_mlp", "0"): "txt_mlp.0",
    ("txt_mlp", "2"): "txt_mlp.2",
}

_SINGLE_LINS = {
    ("linear1",): "linear1",
    ("linear2",): "linear2",
    ("modulation", "lin"): "modulation.lin",
}


def _set(tree: Params, path: tuple, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_flux(state: State, cfg: FluxConfig, dtype=None) -> Params:
    """BFL/reference torch state dict -> Flux pytree, with the Fill model's
    img_in zero-expansion (models/util.py:456-472) when the checkpoint's
    in-features are narrower than cfg.in_channels."""
    params: Params = {}
    for path, key in _TOP_LINS.items():
        if path[0] == "guidance_in" and not cfg.guidance_embed:
            continue
        _set(params, path, _lin(state, key, dtype))

    # zero-expand img_in (dev 64ch checkpoint -> fill 384ch model)
    w = params["img_in"]["w"]
    if w.shape[0] < cfg.in_channels:
        expanded = np.zeros((cfg.in_channels, w.shape[1]), dtype=w.dtype)
        expanded[: w.shape[0]] = w
        params["img_in"]["w"] = expanded

    def block(i: int, lins: dict, prefix: str, norms: list[str]) -> Params:
        p: Params = {}
        for path, key in lins.items():
            _set(p, path, _lin(state, f"{prefix}.{i}.{key}", dtype))
        for norm in norms:
            q = _np(state[f"{prefix}.{i}.{norm}.norm.query_norm.scale"])
            k = _np(state[f"{prefix}.{i}.{norm}.norm.key_norm.scale"])
            if dtype is not None:
                q, k = q.astype(dtype), k.astype(dtype)
            parent = norm.split(".")
            _set(p, tuple(parent) + ("norm",), {"q_scale": q, "k_scale": k})
        return p

    params["double_blocks"] = _stack(
        [block(i, _DOUBLE_LINS, "double_blocks", ["img_attn", "txt_attn"]) for i in range(cfg.depth)]
    )
    params["single_blocks"] = _stack(
        [
            {
                **block(i, _SINGLE_LINS, "single_blocks", []),
                "norm": {
                    "q_scale": _np(state[f"single_blocks.{i}.norm.query_norm.scale"]),
                    "k_scale": _np(state[f"single_blocks.{i}.norm.key_norm.scale"]),
                },
            }
            for i in range(cfg.depth_single_blocks)
        ]
    )
    if dtype is not None:
        # copy=False: leaves already cast by _lin/block pass through instead
        # of being duplicated (a full-copy here transiently doubled host
        # memory on a 12B checkpoint load)
        params = jax.tree.map(lambda x: x.astype(dtype, copy=False), params)
    return params


def flux_to_torch_state(params: Params, cfg: FluxConfig) -> dict[str, np.ndarray]:
    """Inverse of convert_flux (checkpoint export / roundtrip tests)."""
    state: dict[str, np.ndarray] = {}

    def put_lin(key: str, p: Params):
        # contiguous: safetensors serializes raw buffers, so a transposed
        # VIEW would be written with the wrong element order
        state[f"{key}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            state[f"{key}.bias"] = np.asarray(p["b"])

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    for path, key in _TOP_LINS.items():
        if path[0] == "guidance_in" and not cfg.guidance_embed:
            continue
        put_lin(key, get(params, path))

    for i in range(cfg.depth):
        bp = jax.tree.map(lambda x: np.asarray(x)[i], params["double_blocks"])
        for path, key in _DOUBLE_LINS.items():
            put_lin(f"double_blocks.{i}.{key}", get(bp, path))
        for stream in ("img_attn", "txt_attn"):
            state[f"double_blocks.{i}.{stream}.norm.query_norm.scale"] = bp[stream]["norm"]["q_scale"]
            state[f"double_blocks.{i}.{stream}.norm.key_norm.scale"] = bp[stream]["norm"]["k_scale"]
    for i in range(cfg.depth_single_blocks):
        bp = jax.tree.map(lambda x: np.asarray(x)[i], params["single_blocks"])
        for path, key in _SINGLE_LINS.items():
            put_lin(f"single_blocks.{i}.{key}", get(bp, path))
        state[f"single_blocks.{i}.norm.query_norm.scale"] = bp["norm"]["q_scale"]
        state[f"single_blocks.{i}.norm.key_norm.scale"] = bp["norm"]["k_scale"]
    return state


def _half_perm(head_dim: int) -> np.ndarray:
    """[0, 2, ..., D-2, 1, 3, ..., D-1]: interleaved pairs -> half layout."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def _qkv_out_perm(cfg: FluxConfig) -> np.ndarray:
    """Permutation over the fused qkv output dim (k-major: kk*(H*D)+h*D+dd),
    re-ordering q (kk=0) and k (kk=1) head channels into the "half" RoPE
    layout; v (kk=2) untouched. Shared by permute_rope_layout and its LoRA
    counterpart so base weights and runtime adapters can never disagree."""
    h, nh, d = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    perm_d = _half_perm(d)
    qkv_perm = np.arange(3 * h)
    for kk in range(2):
        for head in range(nh):
            base = kk * h + head * d
            qkv_perm[base : base + d] = base + perm_d
    return qkv_perm


def permute_rope_layout(params: Params, cfg: FluxConfig) -> Params:
    """Re-order q/k channels of every attention projection into the "half"
    RoPE layout (ops/rope.apply_rope_half). Valid because attention output is
    invariant to a consistent q/k channel permutation; v and all other
    weights are untouched. Apply once at load time; use
    flux_apply(rope_layout="half") with the result.

    Sharding-preserving: leaves that arrive as mesh-sharded jax.Arrays go
    back to the SAME NamedSharding after the host-side permutation (a plain
    jnp.asarray would silently rebuild them unsharded on the default device,
    mixing single-device leaves into a sharded tree)."""
    import jax
    import jax.numpy as jnp

    def _like(src, arr):
        shard = getattr(src, "sharding", None)
        if getattr(shard, "mesh", None) is not None:  # NamedSharding only
            return jax.device_put(jnp.asarray(arr), shard)
        return jnp.asarray(arr)

    perm_d = _half_perm(cfg.head_dim)
    qkv_perm = _qkv_out_perm(cfg)

    def permute_lin(p, out_perm):
        new = dict(p)
        w_key = "w" if "w" in p else "w_int8"  # int8-quantized entries too
        w = np.asarray(p[w_key])
        full = np.arange(w.shape[-1])
        full[: len(out_perm)] = out_perm
        new[w_key] = _like(p[w_key], w[..., full])
        if "w_scale" in p:
            new["w_scale"] = _like(p["w_scale"], np.asarray(p["w_scale"])[..., full])
        if "b" in p:
            new["b"] = _like(p["b"], np.asarray(p["b"])[..., full])
        return new

    def permute_norm(p):
        return {
            "q_scale": _like(p["q_scale"], np.asarray(p["q_scale"])[..., perm_d]),
            "k_scale": _like(p["k_scale"], np.asarray(p["k_scale"])[..., perm_d]),
        }

    out = dict(params)
    db = dict(params["double_blocks"])
    for stream in ("img_attn", "txt_attn"):
        s = dict(db[stream])
        s["qkv"] = permute_lin(s["qkv"], qkv_perm)
        s["norm"] = permute_norm(s["norm"])
        db[stream] = s
    out["double_blocks"] = db
    sb = dict(params["single_blocks"])
    sb["linear1"] = permute_lin(sb["linear1"], qkv_perm)  # first 3h cols are qkv
    sb["norm"] = permute_norm(sb["norm"])
    out["single_blocks"] = sb
    return out


def permute_rope_layout_lora(lora: Params, cfg: FluxConfig) -> Params:
    """Adapter counterpart of permute_rope_layout: a runtime (unfolded) LoRA
    tree applied on top of "half"-layout base params must write its qkv /
    linear1 deltas in the same permuted channel order. Only the OUTPUT side
    moves — lora "b" columns and "b_bias" — because the permutation acts on
    the projection's output channels; "a" reads the unpermuted input stream.
    Entries are optional (LoRA checkpoints may cover a subset of linears).
    MoE-LoRA entries (models/lora.init_moe_lora) permute their output-side
    factors the same way — shared_b and the stacked expert_b; the gate reads
    the unpermuted input stream and stays put."""
    import jax.numpy as jnp

    qkv_perm = _qkv_out_perm(cfg)

    def permute_entry(e):
        new = dict(e)
        for key in ("b", "shared_b", "expert_b", "b_bias"):
            if key in e:
                v = np.asarray(e[key])
                full = np.arange(v.shape[-1])
                full[: len(qkv_perm)] = qkv_perm
                new[key] = jnp.asarray(v[..., full])
        return new

    out = dict(lora)
    if "double_blocks" in lora:
        db = dict(lora["double_blocks"])
        for stream in ("img_attn", "txt_attn"):
            if stream in db and "qkv" in db[stream]:
                s = dict(db[stream])
                s["qkv"] = permute_entry(s["qkv"])
                db[stream] = s
        out["double_blocks"] = db
    if "single_blocks" in lora and "linear1" in lora["single_blocks"]:
        sb = dict(lora["single_blocks"])
        sb["linear1"] = permute_entry(sb["linear1"])
        out["single_blocks"] = sb
    return out


# ----------------------------- LoRA -----------------------------

def _lora_entry(state: State, key: str, dtype=None) -> Params | None:
    akey = f"{key}.lora_A.weight"
    if akey not in state:
        return None
    entry = {
        "a": _np(state[akey]).T,  # (r, in) -> (in, r)
        "b": _np(state[f"{key}.lora_B.weight"]).T,  # (out, r) -> (r, out)
    }
    bb = f"{key}.lora_B.bias"
    if bb in state:
        entry["b_bias"] = _np(state[bb])
    if dtype is not None:
        entry = {k: v.astype(dtype) for k, v in entry.items()}
    return entry


def convert_lora(state: State, cfg: FluxConfig, dtype=None) -> Params:
    """Reference-trainer LoRA checkpoint (lora_A/lora_B keys, train.py:684-708)
    -> LoRA pytree mirroring the Flux params structure."""
    lora: Params = {}
    for path, key in _TOP_LINS.items():
        if path[0] == "guidance_in" and not cfg.guidance_embed:
            continue
        e = _lora_entry(state, key, dtype)
        if e is not None:
            _set(lora, path, e)

    def blocks(n: int, lins: dict, prefix: str) -> Params | None:
        per = []
        for i in range(n):
            p: Params = {}
            for path, key in lins.items():
                e = _lora_entry(state, f"{prefix}.{i}.{key}", dtype)
                if e is not None:
                    _set(p, path, e)
            per.append(p)
        if not any(per):
            return None
        return _stack(per)

    d = blocks(cfg.depth, _DOUBLE_LINS, "double_blocks")
    s = blocks(cfg.depth_single_blocks, _SINGLE_LINS, "single_blocks")
    if d is not None:
        lora["double_blocks"] = d
    if s is not None:
        lora["single_blocks"] = s
    return lora


def lora_to_torch_state(lora: Params, cfg: FluxConfig) -> dict[str, np.ndarray]:
    """Export LoRA factors in the reference's checkpoint naming (lora_A/lora_B
    only — parity with train.py:684-708)."""
    state: dict[str, np.ndarray] = {}

    def put(key: str, e: Params):
        state[f"{key}.lora_A.weight"] = np.ascontiguousarray(np.asarray(e["a"]).T)
        state[f"{key}.lora_B.weight"] = np.ascontiguousarray(np.asarray(e["b"]).T)
        if "b_bias" in e:
            state[f"{key}.lora_B.bias"] = np.asarray(e["b_bias"])

    def get(tree, path):
        for p in path:
            if not isinstance(tree, dict) or p not in tree:
                return None
            tree = tree[p]
        return tree

    for path, key in _TOP_LINS.items():
        e = get(lora, path)
        if e is not None:
            put(key, e)
    for prefix, lins, n in (
        ("double_blocks", _DOUBLE_LINS, cfg.depth),
        ("single_blocks", _SINGLE_LINS, cfg.depth_single_blocks),
    ):
        stacked = lora.get(prefix)
        if stacked is None:
            continue
        for i in range(n):
            bp = jax.tree.map(lambda x: np.asarray(x)[i], stacked)
            for path, key in lins.items():
                e = get(bp, path)
                if e is not None:
                    put(f"{prefix}.{i}.{key}", e)
    return state


# ----------------------------- diffusers FLUX -----------------------------
#
# The released VisualCloze checkpoints are diffusers-first
# (ref README.md:140-198: VisualClozePipeline-384/-512 full models and
# VisualClozePipeline-LoRA-384/-512 safetensors, "merged into the official
# pipelines of diffusers"). The diffusers FluxTransformer2DModel re-names
# every module and, structurally, splits the fused BFL projections:
#   qkv -> attn.to_q/to_k/to_v (+ add_q/k/v_proj for the txt stream) and
#   linear1 -> attn.to_q/to_k/to_v + proj_mlp,
# and its AdaLayerNormContinuous orders the final modulation [scale, shift]
# where BFL's LastLayer is [shift, scale]. We normalize diffusers naming onto
# BFL naming (re-fusing the splits) and reuse convert_flux — one pytree
# layout, two wire formats, mirroring the VAE strategy above.

# our (BFL) linear key -> diffusers linear key, 1:1 entries only
_D_TOP = {
    "img_in": "x_embedder",
    "txt_in": "context_embedder",
    "time_in.in_layer": "time_text_embed.timestep_embedder.linear_1",
    "time_in.out_layer": "time_text_embed.timestep_embedder.linear_2",
    "vector_in.in_layer": "time_text_embed.text_embedder.linear_1",
    "vector_in.out_layer": "time_text_embed.text_embedder.linear_2",
    "guidance_in.in_layer": "time_text_embed.guidance_embedder.linear_1",
    "guidance_in.out_layer": "time_text_embed.guidance_embedder.linear_2",
    "final_layer.linear": "proj_out",
}

_D_DOUBLE = {  # within transformer_blocks.{i}.
    "img_mod.lin": "norm1.linear",
    "txt_mod.lin": "norm1_context.linear",
    "img_attn.proj": "attn.to_out.0",
    "txt_attn.proj": "attn.to_add_out",
    "img_mlp.0": "ff.net.0.proj",
    "img_mlp.2": "ff.net.2",
    "txt_mlp.0": "ff_context.net.0.proj",
    "txt_mlp.2": "ff_context.net.2",
}

_D_DOUBLE_NORMS = {
    "img_attn.norm.query_norm.scale": "attn.norm_q.weight",
    "img_attn.norm.key_norm.scale": "attn.norm_k.weight",
    "txt_attn.norm.query_norm.scale": "attn.norm_added_q.weight",
    "txt_attn.norm.key_norm.scale": "attn.norm_added_k.weight",
}

_D_SINGLE = {  # within single_transformer_blocks.{i}.
    "modulation.lin": "norm.linear",
    "linear2": "proj_out",
}

_D_SINGLE_NORMS = {
    "norm.query_norm.scale": "attn.norm_q.weight",
    "norm.key_norm.scale": "attn.norm_k.weight",
}

# fused BFL projection -> ordered diffusers sub-projections (out-dim slices)
_D_QKV_DOUBLE_IMG = ("attn.to_q", "attn.to_k", "attn.to_v")
_D_QKV_DOUBLE_TXT = ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj")
_D_LINEAR1 = ("attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp")


def is_diffusers_flux_state(state: State) -> bool:
    return any(
        k.startswith(("transformer_blocks.", "single_transformer_blocks."))
        or k == "x_embedder.weight"
        for k in state
    )


def _swap_scale_shift(x: np.ndarray) -> np.ndarray:
    """diffusers AdaLayerNormContinuous emits [scale, shift]; BFL LastLayer
    consumes [shift, scale]. Symmetric, so one function serves both ways."""
    half = x.shape[0] // 2
    return np.concatenate([x[half:], x[:half]], axis=0)


def _count_blocks(state: State, prefix: str) -> int:
    idx = {int(k.split(".")[1]) for k in state if k.startswith(prefix + ".")}
    return max(idx) + 1 if idx else 0


def normalize_diffusers_flux_keys(state: State) -> dict[str, np.ndarray]:
    """diffusers FluxTransformer2DModel state dict -> BFL naming."""
    out: dict[str, np.ndarray] = {}

    def move(bfl: str, dif: str):
        for suffix in (".weight", ".bias"):
            if dif + suffix in state:
                out[bfl + suffix] = _np(state[dif + suffix])

    def fuse(bfl: str, parts: tuple[str, ...], prefix: str):
        # torch Linear weights are (out, in): concat the split projections
        # back along the output dim, in BFL order
        ws = [_np(state[f"{prefix}{p}.weight"]) for p in parts]
        out[bfl + ".weight"] = np.concatenate(ws, axis=0)
        bias_keys = [f"{prefix}{p}.bias" for p in parts]
        if all(b in state for b in bias_keys):
            out[bfl + ".bias"] = np.concatenate([_np(state[b]) for b in bias_keys], axis=0)

    for bfl, dif in _D_TOP.items():
        move(bfl, dif)
    for suffix in (".weight", ".bias"):
        key = "norm_out.linear" + suffix
        if key in state:
            out["final_layer.adaLN_modulation.1" + suffix] = _swap_scale_shift(_np(state[key]))

    for i in range(_count_blocks(state, "transformer_blocks")):
        d = f"transformer_blocks.{i}."
        b = f"double_blocks.{i}."
        for bfl, dif in _D_DOUBLE.items():
            move(b + bfl, d + dif)
        for bfl, dif in _D_DOUBLE_NORMS.items():
            out[b + bfl] = _np(state[d + dif])
        fuse(b + "img_attn.qkv", _D_QKV_DOUBLE_IMG, d)
        fuse(b + "txt_attn.qkv", _D_QKV_DOUBLE_TXT, d)

    for i in range(_count_blocks(state, "single_transformer_blocks")):
        d = f"single_transformer_blocks.{i}."
        b = f"single_blocks.{i}."
        for bfl, dif in _D_SINGLE.items():
            move(b + bfl, d + dif)
        for bfl, dif in _D_SINGLE_NORMS.items():
            out[b + bfl] = _np(state[d + dif])
        fuse(b + "linear1", _D_LINEAR1, d)
    return out


def convert_flux_diffusers(state: State, cfg: FluxConfig, dtype=None) -> Params:
    """diffusers FluxTransformer2DModel state dict (e.g. the released
    VisualClozePipeline-384/-512 transformer/ shards) -> Flux pytree."""
    return convert_flux(normalize_diffusers_flux_keys(state), cfg, dtype)


def flux_to_diffusers_state(params: Params, cfg: FluxConfig) -> dict[str, np.ndarray]:
    """Flux pytree -> diffusers FluxTransformer2DModel naming (export and
    roundtrip tests): splits the fused qkv/linear1 projections and swaps the
    final modulation order."""
    bfl = flux_to_torch_state(params, cfg)
    h = cfg.hidden_size
    out: dict[str, np.ndarray] = {}

    def split(bfl_key: str, parts: tuple[str, ...], prefix: str, sizes: list[int]):
        offs = np.cumsum([0] + sizes)
        for p, lo, hi in zip(parts, offs[:-1], offs[1:]):
            out[f"{prefix}{p}.weight"] = bfl[bfl_key + ".weight"][lo:hi]
            if bfl_key + ".bias" in bfl:
                out[f"{prefix}{p}.bias"] = bfl[bfl_key + ".bias"][lo:hi]

    def move(bfl_key: str, dif: str):
        for suffix in (".weight", ".bias"):
            if bfl_key + suffix in bfl:
                out[dif + suffix] = bfl[bfl_key + suffix]

    for bfl_key, dif in _D_TOP.items():
        move(bfl_key, dif)
    for suffix in (".weight", ".bias"):
        key = "final_layer.adaLN_modulation.1" + suffix
        if key in bfl:
            out["norm_out.linear" + suffix] = _swap_scale_shift(bfl[key])

    for i in range(cfg.depth):
        b, d = f"double_blocks.{i}.", f"transformer_blocks.{i}."
        for bfl_key, dif in _D_DOUBLE.items():
            move(b + bfl_key, d + dif)
        for bfl_key, dif in _D_DOUBLE_NORMS.items():
            out[d + dif] = bfl[b + bfl_key]
        split(b + "img_attn.qkv", _D_QKV_DOUBLE_IMG, d, [h, h, h])
        split(b + "txt_attn.qkv", _D_QKV_DOUBLE_TXT, d, [h, h, h])
    for i in range(cfg.depth_single_blocks):
        b, d = f"single_blocks.{i}.", f"single_transformer_blocks.{i}."
        for bfl_key, dif in _D_SINGLE.items():
            move(b + bfl_key, d + dif)
        for bfl_key, dif in _D_SINGLE_NORMS.items():
            out[d + dif] = bfl[b + bfl_key]
        split(b + "linear1", _D_LINEAR1, d, [h, h, h, cfg.mlp_hidden_dim])
    return out


# ----------------------------- diffusers LoRA -----------------------------

def is_diffusers_lora_state(state: State) -> bool:
    return any(
        ".lora_A." in k
        and (
            k.startswith(("transformer.", "transformer_blocks.", "single_transformer_blocks."))
            or ".attn.to_" in k
        )
        for k in state
    )


def _d_lora_entry(state: State, key: str, dtype=None) -> Params | None:
    """One diffusers/peft LoRA pair -> {"a": (in, r), "b": (r, out)}.

    Optional `{key}.alpha` (kohya-style) is folded into b as alpha/r."""
    akey = f"{key}.lora_A.weight"
    if akey not in state:
        return None
    a = _np(state[akey]).T.astype(np.float32)  # (r, in) -> (in, r)
    b = _np(state[f"{key}.lora_B.weight"]).T.astype(np.float32)  # (out, r) -> (r, out)
    alpha_key = f"{key}.alpha"
    if alpha_key in state:
        b = b * (float(_np(state[alpha_key])) / b.shape[0])
    entry = {"a": a, "b": b}
    bb = f"{key}.lora_B.bias"
    if bb in state:
        entry["b_bias"] = _np(state[bb]).astype(np.float32)
    if dtype is not None:
        entry = {k: v.astype(dtype) for k, v in entry.items()}
    return entry


def _fuse_lora_entries(
    subs: list[Params | None], out_sizes: list[int], dtype=None
) -> Params | None:
    """LoRA pairs on split projections -> one pair on the fused projection.

    Exact block construction: A factors concatenate along the rank axis and
    each B lands in its projection's output slice (rank grows to the sum of
    the present sub-ranks; absent sub-projections contribute nothing)."""
    present = [(s, lo, hi) for s, lo, hi in zip(
        subs, np.cumsum([0] + out_sizes)[:-1], np.cumsum(out_sizes)
    ) if s is not None]
    if not present:
        return None
    total_out = int(sum(out_sizes))
    total_r = int(sum(s["a"].shape[-1] for s, _, _ in present))
    a = np.concatenate([s["a"] for s, _, _ in present], axis=-1)
    b = np.zeros((total_r, total_out), np.float32)
    bb = np.zeros((total_out,), np.float32)
    has_bias = False
    r0 = 0
    for s, lo, hi in present:
        r = s["a"].shape[-1]
        b[r0 : r0 + r, lo:hi] = s["b"]
        if "b_bias" in s:
            bb[lo:hi] = s["b_bias"]
            has_bias = True
        r0 += r
    entry = {"a": a, "b": b}
    if has_bias:
        entry["b_bias"] = bb
    if dtype is not None:
        entry = {k: v.astype(dtype) for k, v in entry.items()}
    return entry


def convert_lora_diffusers(state: State, cfg: FluxConfig, dtype=None) -> Params:
    """diffusers-format FLUX LoRA (e.g. VisualClozePipeline-LoRA-384/-512)
    -> LoRA pytree mirroring the Flux params structure.

    Accepts peft naming with or without the `transformer.` prefix. Split
    q/k/v (and proj_mlp) adapters are re-fused into block-structured factors
    on the fused BFL projections — exact, at the cost of rank summing."""
    state = {k.removeprefix("transformer."): v for k, v in state.items()}
    h = cfg.hidden_size
    lora: Params = {}

    def top(path: tuple, dif_key: str, swap_final: bool = False):
        e = _d_lora_entry(state, dif_key, dtype)
        if e is None:
            return
        if swap_final:
            e = dict(e)
            e["b"] = np.concatenate(
                [e["b"][:, e["b"].shape[1] // 2 :], e["b"][:, : e["b"].shape[1] // 2]],
                axis=1,
            )
            if "b_bias" in e:
                e["b_bias"] = _swap_scale_shift(e["b_bias"])
        _set(lora, path, e)

    bfl_to_path = {v: k for k, v in _TOP_LINS.items()}
    for bfl_key, dif_key in _D_TOP.items():
        if bfl_key.startswith("guidance_in") and not cfg.guidance_embed:
            continue
        top(bfl_to_path[bfl_key], dif_key)
    top(("final_layer", "adaLN"), "norm_out.linear", swap_final=True)

    def block_entries(i: int, kind: str) -> Params:
        p: Params = {}
        if kind == "double":
            d = f"transformer_blocks.{i}."
            for bfl_key, dif in _D_DOUBLE.items():
                e = _d_lora_entry(state, d + dif, dtype)
                if e is not None:
                    _set(p, tuple(bfl_key.split(".")), e)
            for stream, parts in (("img_attn", _D_QKV_DOUBLE_IMG),
                                  ("txt_attn", _D_QKV_DOUBLE_TXT)):
                e = _fuse_lora_entries(
                    [_d_lora_entry(state, d + part, dtype) for part in parts],
                    [h, h, h], dtype,
                )
                if e is not None:
                    _set(p, (stream, "qkv"), e)
        else:
            d = f"single_transformer_blocks.{i}."
            for bfl_key, dif in _D_SINGLE.items():
                e = _d_lora_entry(state, d + dif, dtype)
                if e is not None:
                    _set(p, tuple(bfl_key.split(".")), e)
            e = _fuse_lora_entries(
                [_d_lora_entry(state, d + part, dtype) for part in _D_LINEAR1],
                [h, h, h, cfg.mlp_hidden_dim], dtype,
            )
            if e is not None:
                _set(p, ("linear1",), e)
        return p

    doubles = [block_entries(i, "double") for i in range(cfg.depth)]
    singles = [block_entries(i, "single") for i in range(cfg.depth_single_blocks)]
    for name, per in (("double_blocks", doubles), ("single_blocks", singles)):
        if any(per):
            lora[name] = _stack(per)  # raises if blocks carry non-uniform adapters
    return lora


def lora_to_diffusers_state(lora: Params, cfg: FluxConfig) -> dict[str, np.ndarray]:
    """LoRA pytree -> diffusers/peft naming (`transformer.` prefix), splitting
    fused-projection adapters: each split projection shares the fused A and
    takes its output slice of B — the same factorization diffusers' own
    BFL->diffusers LoRA conversion produces."""
    bfl = lora_to_torch_state(lora, cfg)
    h = cfg.hidden_size
    out: dict[str, np.ndarray] = {}

    def move(bfl_key: str, dif: str, swap_final: bool = False):
        a, b = f"{bfl_key}.lora_A.weight", f"{bfl_key}.lora_B.weight"
        if a not in bfl:
            return
        bw = bfl[b]
        bias = bfl.get(f"{bfl_key}.lora_B.bias")
        if swap_final:
            bw = _swap_scale_shift(bw)
            bias = None if bias is None else _swap_scale_shift(bias)
        out[f"transformer.{dif}.lora_A.weight"] = bfl[a]
        out[f"transformer.{dif}.lora_B.weight"] = bw
        if bias is not None:
            out[f"transformer.{dif}.lora_B.bias"] = bias

    def split(bfl_key: str, parts: tuple[str, ...], prefix: str, sizes: list[int]):
        a = f"{bfl_key}.lora_A.weight"
        if a not in bfl:
            return
        bw, bias = bfl[f"{bfl_key}.lora_B.weight"], bfl.get(f"{bfl_key}.lora_B.bias")
        offs = np.cumsum([0] + sizes)
        for p, lo, hi in zip(parts, offs[:-1], offs[1:]):
            out[f"transformer.{prefix}{p}.lora_A.weight"] = bfl[a]
            out[f"transformer.{prefix}{p}.lora_B.weight"] = bw[lo:hi]
            if bias is not None:
                out[f"transformer.{prefix}{p}.lora_B.bias"] = bias[lo:hi]

    for bfl_key, dif in _D_TOP.items():
        move(bfl_key, dif)
    move("final_layer.adaLN_modulation.1", "norm_out.linear", swap_final=True)
    for i in range(cfg.depth):
        b, d = f"double_blocks.{i}.", f"transformer_blocks.{i}."
        for bfl_key, dif in _D_DOUBLE.items():
            move(b + bfl_key, d + dif)
        split(b + "img_attn.qkv", _D_QKV_DOUBLE_IMG, d, [h, h, h])
        split(b + "txt_attn.qkv", _D_QKV_DOUBLE_TXT, d, [h, h, h])
    for i in range(cfg.depth_single_blocks):
        b, d = f"single_blocks.{i}.", f"single_transformer_blocks.{i}."
        for bfl_key, dif in _D_SINGLE.items():
            move(b + bfl_key, d + dif)
        split(b + "linear1", _D_LINEAR1, d, [h, h, h, cfg.mlp_hidden_dim])
    return out


# ----------------------------- T5 -----------------------------

def convert_t5(state: State, cfg: T5Config, dtype=None) -> Params:
    """HF T5EncoderModel state dict -> t5.py pytree."""
    def w(key):
        x = _np(state[key])
        return x if dtype is None else x.astype(dtype)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        blocks.append(
            {
                "attn": {
                    "ln": w(f"{p}.layer.0.layer_norm.weight"),
                    "q": w(f"{p}.layer.0.SelfAttention.q.weight").T,
                    "k": w(f"{p}.layer.0.SelfAttention.k.weight").T,
                    "v": w(f"{p}.layer.0.SelfAttention.v.weight").T,
                    "o": w(f"{p}.layer.0.SelfAttention.o.weight").T,
                },
                "ffn": {
                    "ln": w(f"{p}.layer.1.layer_norm.weight"),
                    "wi_0": w(f"{p}.layer.1.DenseReluDense.wi_0.weight").T,
                    "wi_1": w(f"{p}.layer.1.DenseReluDense.wi_1.weight").T,
                    "wo": w(f"{p}.layer.1.DenseReluDense.wo.weight").T,
                },
            }
        )
    return {
        "embed": w("shared.weight"),
        "relative_attention_bias": w(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "blocks": _stack(blocks),
        "final_ln": w("encoder.final_layer_norm.weight"),
    }


# ----------------------------- CLIP -----------------------------

def convert_clip(state: State, cfg: CLIPTextConfig, dtype=None) -> Params:
    """HF CLIPTextModel state dict -> clip.py pytree."""
    def w(key):
        x = _np(state[key])
        return x if dtype is None else x.astype(dtype)

    def lin(key):
        p = {"w": w(f"{key}.weight").T, "b": w(f"{key}.bias")}
        return p

    def ln(key):
        return {"scale": w(f"{key}.weight"), "bias": w(f"{key}.bias")}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        blocks.append(
            {
                "ln1": ln(f"{p}.layer_norm1"),
                "attn": {
                    "q": lin(f"{p}.self_attn.q_proj"),
                    "k": lin(f"{p}.self_attn.k_proj"),
                    "v": lin(f"{p}.self_attn.v_proj"),
                    "o": lin(f"{p}.self_attn.out_proj"),
                },
                "ln2": ln(f"{p}.layer_norm2"),
                "fc1": lin(f"{p}.mlp.fc1"),
                "fc2": lin(f"{p}.mlp.fc2"),
            }
        )
    return {
        "token_embed": w("text_model.embeddings.token_embedding.weight"),
        "pos_embed": w("text_model.embeddings.position_embedding.weight"),
        "blocks": _stack(blocks),
        "final_ln": ln("text_model.final_layer_norm"),
    }


# ----------------------------- VAE -----------------------------

def _conv(state: State, key: str, dtype=None) -> Params:
    w = _np(state[f"{key}.weight"])
    if w.ndim == 2:  # diffusers attention projections are Linear
        w = w[:, :, None, None]
    w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    b = _np(state[f"{key}.bias"])
    if dtype is not None:
        w, b = w.astype(dtype), b.astype(dtype)
    return {"w": w, "b": b}


def _gn(state: State, key: str, dtype=None) -> Params:
    s, b = _np(state[f"{key}.weight"]), _np(state[f"{key}.bias"])
    if dtype is not None:
        s, b = s.astype(dtype), b.astype(dtype)
    return {"scale": s, "bias": b}


def _resnet(state: State, key: str, dtype=None) -> Params:
    p = {
        "norm1": _gn(state, f"{key}.norm1", dtype),
        "conv1": _conv(state, f"{key}.conv1", dtype),
        "norm2": _gn(state, f"{key}.norm2", dtype),
        "conv2": _conv(state, f"{key}.conv2", dtype),
    }
    if f"{key}.nin_shortcut.weight" in state:
        p["nin_shortcut"] = _conv(state, f"{key}.nin_shortcut", dtype)
    return p


def _attn(state: State, key: str, dtype=None) -> Params:
    return {
        "norm": _gn(state, f"{key}.norm", dtype),
        "q": _conv(state, f"{key}.q", dtype),
        "k": _conv(state, f"{key}.k", dtype),
        "v": _conv(state, f"{key}.v", dtype),
        "proj_out": _conv(state, f"{key}.proj_out", dtype),
    }


def normalize_diffusers_vae_keys(state: State) -> dict[str, np.ndarray]:
    """Map diffusers AutoencoderKL naming onto BFL naming so one converter
    serves both checkpoint formats (the reference mixes them:
    visualcloze.py:100 uses diffusers, models/util.py:434-453 uses BFL)."""
    out: dict[str, np.ndarray] = {}
    for k, v in state.items():
        nk = k
        nk = nk.replace("down_blocks.", "down.")
        nk = nk.replace("up_blocks.", "up_rev.")  # diffusers reverses decoder order
        nk = nk.replace(".resnets.", ".block.")
        nk = nk.replace("downsamplers.0.conv", "downsample.conv")
        nk = nk.replace("upsamplers.0.conv", "upsample.conv")
        nk = nk.replace("mid_block.block.0", "mid.block_1")
        nk = nk.replace("mid_block.block.1", "mid.block_2")
        nk = nk.replace("mid_block.attentions.0.group_norm", "mid.attn_1.norm")
        nk = nk.replace("mid_block.attentions.0.to_q", "mid.attn_1.q")
        nk = nk.replace("mid_block.attentions.0.to_k", "mid.attn_1.k")
        nk = nk.replace("mid_block.attentions.0.to_v", "mid.attn_1.v")
        nk = nk.replace("mid_block.attentions.0.to_out.0", "mid.attn_1.proj_out")
        nk = nk.replace("conv_norm_out", "norm_out")
        nk = nk.replace("conv_shortcut", "nin_shortcut")
        out[nk] = v
    # fix decoder up-block ordering: diffusers up_blocks[0] is the *highest*
    # resolution last? (diffusers stores them in forward execution order,
    # BFL indexes by resolution level with up[0] = highest)
    n_up = len({k.split(".")[2] for k in out if k.startswith("decoder.up_rev.")})
    final = {}
    for k, v in out.items():
        if k.startswith("decoder.up_rev."):
            parts = k.split(".")
            parts[2] = str(n_up - 1 - int(parts[2]))
            k = ".".join(["decoder", "up"] + parts[2:])
        final[k] = v
    return final


def vae_to_torch_state(params: Params, cfg: AutoEncoderConfig) -> dict[str, np.ndarray]:
    """Inverse of convert_vae in BFL naming (export / roundtrip tests)."""
    state: dict[str, np.ndarray] = {}

    def put(key: str, node: Params):
        if "w" in node:  # conv
            state[f"{key}.weight"] = np.ascontiguousarray(
                np.asarray(node["w"]).transpose(3, 2, 0, 1)
            )
            state[f"{key}.bias"] = np.asarray(node["b"])
        else:  # group norm
            state[f"{key}.weight"] = np.asarray(node["scale"])
            state[f"{key}.bias"] = np.asarray(node["bias"])

    def put_resnet(key: str, p: Params):
        for name in ("norm1", "conv1", "norm2", "conv2"):
            put(f"{key}.{name}", p[name])
        if "nin_shortcut" in p:
            put(f"{key}.nin_shortcut", p["nin_shortcut"])

    def put_attn(key: str, p: Params):
        for name in ("norm", "q", "k", "v", "proj_out"):
            put(f"{key}.{name}", p[name])

    for side in ("encoder", "decoder"):
        p = params[side]
        put(f"{side}.conv_in", p["conv_in"])
        put_resnet(f"{side}.mid.block_1", p["mid"]["block_1"])
        put_attn(f"{side}.mid.attn_1", p["mid"]["attn_1"])
        put_resnet(f"{side}.mid.block_2", p["mid"]["block_2"])
        put(f"{side}.norm_out", p["norm_out"])
        put(f"{side}.conv_out", p["conv_out"])
    for i, level in enumerate(params["encoder"]["down"]):
        for j, bp in enumerate(level["block"]):
            put_resnet(f"encoder.down.{i}.block.{j}", bp)
        if "downsample" in level:
            put(f"encoder.down.{i}.downsample.conv", level["downsample"]["conv"])
    for i, level in enumerate(params["decoder"]["up"]):
        for j, bp in enumerate(level["block"]):
            put_resnet(f"decoder.up.{i}.block.{j}", bp)
        if "upsample" in level:
            put(f"decoder.up.{i}.upsample.conv", level["upsample"]["conv"])
    return state


def convert_vae(state: State, cfg: AutoEncoderConfig, dtype=None) -> Params:
    """BFL ae.safetensors naming -> autoencoder pytree. For diffusers
    checkpoints run normalize_diffusers_vae_keys first."""
    if any("down_blocks" in k or "mid_block" in k for k in state):
        state = normalize_diffusers_vae_keys(state)
    n_levels = len(cfg.ch_mult)
    enc: Params = {
        "conv_in": _conv(state, "encoder.conv_in", dtype),
        "down": [],
        "mid": {
            "block_1": _resnet(state, "encoder.mid.block_1", dtype),
            "attn_1": _attn(state, "encoder.mid.attn_1", dtype),
            "block_2": _resnet(state, "encoder.mid.block_2", dtype),
        },
        "norm_out": _gn(state, "encoder.norm_out", dtype),
        "conv_out": _conv(state, "encoder.conv_out", dtype),
    }
    for i in range(n_levels):
        level: Params = {
            "block": [
                _resnet(state, f"encoder.down.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks)
            ]
        }
        if f"encoder.down.{i}.downsample.conv.weight" in state:
            level["downsample"] = {"conv": _conv(state, f"encoder.down.{i}.downsample.conv", dtype)}
        enc["down"].append(level)

    dec: Params = {
        "conv_in": _conv(state, "decoder.conv_in", dtype),
        "mid": {
            "block_1": _resnet(state, "decoder.mid.block_1", dtype),
            "attn_1": _attn(state, "decoder.mid.attn_1", dtype),
            "block_2": _resnet(state, "decoder.mid.block_2", dtype),
        },
        "norm_out": _gn(state, "decoder.norm_out", dtype),
        "conv_out": _conv(state, "decoder.conv_out", dtype),
        "up": [],
    }
    for i in range(n_levels):
        level = {
            "block": [
                _resnet(state, f"decoder.up.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if f"decoder.up.{i}.upsample.conv.weight" in state:
            level["upsample"] = {"conv": _conv(state, f"decoder.up.{i}.upsample.conv", dtype)}
        dec["up"].append(level)
    return {"encoder": enc, "decoder": dec}
