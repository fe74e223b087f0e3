"""Single-chip serving utilities: on-disk parameter store and format-matched
device placement.

Solves the 12B-on-16GB loading problem (docs/ROADMAP.md #2): feeding a
pre-built ~12 GB weight tree into a jitted program with plain device_put can
trigger a whole-tree PJRT relayout copy (the default host->device layout
rarely matches the layout the compiled executable wants) — a transient 2x
memory spike that OOMs a 16 GB chip. The fix is to compile FIRST against
abstract shapes, read the executable's `input_formats`, and device_put each
leaf directly into its final on-device layout — peak overhead is one leaf,
not one tree.

The on-disk store is one .npy per leaf + a JSON manifest (memory-mappable, so
loading streams leaves straight from page cache into their device layout).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

import jax
import ml_dtypes
import numpy as np

Params = dict[str, Any]


# ----------------------------- on-disk store -----------------------------

def _path_segments(key_path) -> list:
    segs: list = []
    for k in key_path:
        if hasattr(k, "key"):  # DictKey
            segs.append(str(k.key))
        elif hasattr(k, "idx"):  # SequenceKey
            segs.append(int(k.idx))
        else:
            segs.append(str(k))
    return segs


def save_params_dir(params: Params, path: str) -> None:
    """Write a parameter pytree as <path>/<leaf>.npy files + manifest.json."""
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    manifest = []
    for i, (kp, leaf) in enumerate(leaves):
        arr = np.asarray(leaf)
        name = re.sub(r"[^A-Za-z0-9_.-]", "_", jax.tree_util.keystr(kp)).strip("_")
        fname = f"{i:04d}_{name[:120]}.npy"
        np.save(os.path.join(path, fname), arr)
        manifest.append(
            {"path": _path_segments(kp), "file": fname, "dtype": str(arr.dtype)}
        )
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_params_dir(path: str, mmap: bool = True) -> Params:
    """Rebuild the pytree from save_params_dir output; leaves are np.memmap
    views by default (no host RAM copy until read)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    root: Any = None

    def ensure(node, seg, next_seg):
        container: Any = [] if isinstance(next_seg, int) else {}
        if isinstance(node, list):
            while len(node) <= seg:
                node.append(None)
            if node[seg] is None:
                node[seg] = container
            return node[seg]
        return node.setdefault(seg, container)

    for entry in manifest:
        arr = np.load(os.path.join(path, entry["file"]), mmap_mode="r" if mmap else None)
        want_dtype = _resolve_dtype(entry.get("dtype"))
        if want_dtype is not None and arr.dtype != want_dtype:
            arr = arr.view(want_dtype)  # extended dtypes (bfloat16) mmap as raw void
        segs = entry["path"]
        if root is None:
            root = [] if isinstance(segs[0], int) else {}
        node = root
        for j, seg in enumerate(segs[:-1]):
            node = ensure(node, seg, segs[j + 1])
        last = segs[-1]
        if isinstance(node, list):
            while len(node) <= last:
                node.append(None)
            node[last] = arr
        else:
            node[last] = arr
    return root


def _resolve_dtype(name: str | None) -> np.dtype | None:
    if name is None:
        return None
    try:
        return np.dtype(name)
    except TypeError:
        return np.dtype(getattr(ml_dtypes, name))


# ----------------------------- format-matched placement -----------------------------

def compile_with_formats(fn: Callable, *args):
    """jit-compile `fn` against the (possibly abstract) args WITHOUT placing
    them on device; returns (compiled, input_formats) where input_formats
    mirrors the args tuple."""
    abstract = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    compiled = jax.jit(fn).lower(*abstract).compile()
    return compiled, compiled.input_formats[0]


def device_put_with_formats(tree, formats):
    """Leaf-by-leaf device_put into the executable's expected layouts.
    np.memmap leaves stream from disk; peak extra memory is one leaf."""
    return jax.tree.map(lambda a, f: jax.device_put(np.asarray(a), f), tree, formats)


def load_compiled_params(fn: Callable, host_params: Params, *example_args):
    """One-shot helper: compile fn(params, *example_args) from shapes, then
    place host_params (and the example args) format-matched.

    Returns (compiled, device_params, device_args)."""
    compiled, fmts = compile_with_formats(fn, host_params, *example_args)
    dev_params = device_put_with_formats(host_params, fmts[0])
    dev_args = tuple(
        device_put_with_formats(a, f) for a, f in zip(example_args, fmts[1:])
    )
    return compiled, dev_params, dev_args


# ----------------------------- synthetic checkpoints -----------------------------

def build_synthetic_int8_checkpoint(cfg, path: str, seed: int = 0) -> None:
    """Write a random int8-quantized full-size Flux checkpoint to disk
    (bench seam: exercises the exact real-weight serving path without FLUX
    weights in the environment). Host-side numpy, leaf-streamed to disk."""
    rng = np.random.default_rng(seed)
    h, mh, d = cfg.hidden_size, cfg.mlp_hidden_dim, cfg.head_dim

    def qlin(d_in, d_out, bias=True, lead=()):
        p = {
            "w_int8": rng.integers(-127, 128, (*lead, d_in, d_out), dtype=np.int8),
            "w_scale": np.full((*lead, d_out), 0.02 * d_in**-0.5 / 127.0, np.float32),
        }
        if bias:
            p["b"] = np.zeros((*lead, d_out), ml_dtypes.bfloat16)
        return p

    def qnorm(lead):
        one = np.ones((*lead, d), ml_dtypes.bfloat16)
        return {"q_scale": one, "k_scale": one.copy()}

    D, S = cfg.depth, cfg.depth_single_blocks
    params = {
        "img_in": qlin(cfg.in_channels, h),
        "txt_in": qlin(cfg.context_in_dim, h),
        "time_in": {"in_layer": qlin(256, h), "out_layer": qlin(h, h)},
        "vector_in": {"in_layer": qlin(cfg.vec_in_dim, h), "out_layer": qlin(h, h)},
        "double_blocks": {
            "img_mod": {"lin": qlin(h, 6 * h, lead=(D,))},
            "txt_mod": {"lin": qlin(h, 6 * h, lead=(D,))},
            "img_attn": {
                "qkv": qlin(h, 3 * h, lead=(D,)),
                "proj": qlin(h, h, lead=(D,)),
                "norm": qnorm((D,)),
            },
            "txt_attn": {
                "qkv": qlin(h, 3 * h, lead=(D,)),
                "proj": qlin(h, h, lead=(D,)),
                "norm": qnorm((D,)),
            },
            "img_mlp": {"0": qlin(h, mh, lead=(D,)), "2": qlin(mh, h, lead=(D,))},
            "txt_mlp": {"0": qlin(h, mh, lead=(D,)), "2": qlin(mh, h, lead=(D,))},
        },
        "single_blocks": {
            "linear1": qlin(h, 3 * h + mh, lead=(S,)),
            "linear2": qlin(h + mh, h, lead=(S,)),
            "norm": qnorm((S,)),
            "modulation": {"lin": qlin(h, 3 * h, lead=(S,))},
        },
        "final_layer": {
            "linear": qlin(h, cfg.out_channels),
            "adaLN": qlin(h, 2 * h),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {"in_layer": qlin(256, h), "out_layer": qlin(h, h)}
    save_params_dir(params, path)
