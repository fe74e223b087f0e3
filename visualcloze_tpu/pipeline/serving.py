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

The on-disk store is one .npy per leaf + a JSON manifest.

Restart speed (round 5): `jax.device_put(leaf, format)` converts the host
buffer into the TPU's tiled layout ON THE HOST, single-threaded.
`device_put_retile` instead ships each large leaf as flat bytes (trivial
layout, no host tiling pass) and runs the tiling conversion ON DEVICE via a
tiny donated reshape program pinned to the target Format — HBM-bandwidth
work (~µs per leaf). `stream_params_dir` pipelines the disk read of leaf
i+1 under the DMA of leaf i with a bounded in-flight window, so a cold
restart is bounded by max(disk, link) instead of disk + host-retile + link.

Measurement honesty (bench.py restart phase / scripts/bench_restart.py):
over a buffering transport — notably the axon tunnel used in this dev
environment — `block_until_ready` can return once bytes are handed to the
local proxy, NOT when they are resident in HBM; put-side rates measured
that way are enqueue rates. The true link rate must be measured with a
readback-forced sync (np.asarray of a slice of the placed buffer), and
restart totals must be timed through the FIRST QUERY, which cannot execute
before every weight byte has landed. On this environment's tunnel the true
sustained link is ~20 MB/s (12 GB => ~10 min, link-bound physics); on a
production v5e host the same path rides PCIe at GB/s.
"""

from __future__ import annotations

import json
import os
import re
import time
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


def _tree_from_manifest(manifest: list, leaves: list) -> Params:
    """Rebuild the nested dict/list pytree from manifest paths + leaf list."""
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

    for entry, leaf in zip(manifest, leaves):
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
            node[last] = leaf
        else:
            node[last] = leaf
    return root


def load_params_dir(path: str, mmap: bool = True) -> Params:
    """Rebuild the pytree from save_params_dir output; leaves are np.memmap
    views by default (no host RAM copy until read)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    leaves = []
    for entry in manifest:
        arr = np.load(os.path.join(path, entry["file"]), mmap_mode="r" if mmap else None)
        want_dtype = _resolve_dtype(entry.get("dtype"))
        if want_dtype is not None and arr.dtype != want_dtype:
            arr = arr.view(want_dtype)  # extended dtypes (bfloat16) mmap as raw void
        leaves.append(arr)
    return _tree_from_manifest(manifest, leaves)


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


def device_put_with_formats(tree, formats, max_inflight_bytes: int | None = None):
    """Leaf-by-leaf device_put into the executable's expected layouts.
    np.memmap leaves stream from disk; peak extra memory is one leaf.

    Large leaves take the two-hop flat-DMA + on-device-retile path
    (device_put_retile) — no single-threaded host tiling pass (module
    docstring). Puts are dispatched with a BOUNDED number of bytes in
    flight (default ~1.5 GB): device_put is async, so an unbounded
    tree-wide dispatch stages every flat leaf in HBM before the donating
    retiles can free any — for a 12 GB tree that is ~24 GB transient on a
    16 GB chip, which deadlocks the transfer stream (observed: host blocked
    in sk_stream_wait_memory with the device allocator wedged)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if isinstance(formats, (jax.Device, jax.sharding.Sharding)):
        fmt_leaves = [formats] * len(leaves)  # broadcast one placement target
    else:
        fmt_leaves = jax.tree_util.tree_flatten(formats)[0]
    placed = _put_bounded(
        (np.asarray(a) for a in leaves), fmt_leaves, max_inflight_bytes
    )
    return jax.tree_util.tree_unflatten(treedef, placed)


_DEFAULT_INFLIGHT = 1536 * 1024 * 1024


def _put_bounded(arrays, fmts, max_inflight_bytes=None):
    """device_put_retile each (array, fmt) pair keeping at most
    max_inflight_bytes of un-synced puts outstanding; returns the list of
    placed leaves. Blocking the OLDEST put first preserves pipelining (the
    newest dispatches overlap the oldest drain)."""
    from collections import deque

    bound = max_inflight_bytes or _DEFAULT_INFLIGHT
    placed: list = []
    inflight: deque = deque()  # (index, nbytes)
    in_bytes = 0
    for a, f in zip(arrays, fmts):
        while inflight and in_bytes + a.nbytes > bound:
            i, nb = inflight.popleft()
            placed[i].block_until_ready()
            in_bytes -= nb
        placed.append(device_put_retile(a, f))
        inflight.append((len(placed) - 1, a.nbytes))
        in_bytes += a.nbytes
    return placed


# Leaves below this take the direct put (host tiling of small arrays is
# cheap; the two-hop path would spend more on program dispatch).
_RETILE_MIN_BYTES = 4 * 1024 * 1024
_retile_programs: dict[tuple, Any] = {}


def _retile_program(shape, dtype, fmt):
    """Compiled flat->shaped-into-format reshape, cached per signature. The
    flat input is donated so the staging buffer is freed as soon as the
    retile finishes (peak HBM overhead: one leaf, not two trees). fmt=None
    compiles without an output pin (default layout on the input's device)."""
    key = (shape, str(dtype), str(fmt))
    fn = _retile_programs.get(key)
    if fn is None:
        kw = {} if fmt is None else {"out_shardings": fmt}
        fn = jax.jit(lambda flat: flat.reshape(shape), donate_argnums=0, **kw)
        _retile_programs[key] = fn
    return fn


def device_put_retile(arr, fmt):
    """Place one host leaf via flat-bytes DMA + on-device retile (module
    docstring). `fmt` may be an executable Format (layout pinned), or a
    Device / single-device Sharding (default layout — e.g. before any
    executable exists to dictate formats). Falls back to a plain put for
    small leaves, non-contiguous arrays, and multi-device shardings."""
    from jax.experimental.layout import Format

    a = np.asarray(arr)
    small = a.nbytes < _RETILE_MIN_BYTES or a.ndim < 2 or not a.flags["C_CONTIGUOUS"]
    if isinstance(fmt, Format):
        devices = fmt.sharding.device_set
        pin = fmt
    elif isinstance(fmt, jax.sharding.Sharding):
        devices = fmt.device_set
        pin = None
    elif isinstance(fmt, jax.Device):
        devices, pin = {fmt}, None
    else:
        devices, pin = set(), None
    if small or len(devices) != 1:
        return jax.device_put(a, fmt)
    try:
        program = _retile_program(a.shape, a.dtype, pin)
        return program(jax.device_put(a.reshape(-1), next(iter(devices))))
    except Exception:  # pragma: no cover - backend-specific format gaps
        return jax.device_put(a, fmt)


def stream_params_dir(path: str, formats=None, max_prefetch: int = 2,
                      max_inflight_bytes: int | None = None):
    """Cold-restart weight stream: read the leaf store sequentially and place
    each leaf with device_put_retile, PIPELINED — a reader thread loads leaf
    i+1 from disk (sequential buffered read, no mmap page-fault churn) while
    leaf i's flat DMA + on-device retile run. Returns (tree, stats) where
    stats decomposes the wall time into disk-read vs put/retile dispatch.

    formats: the executable's parameter Formats tree (layout-pinned
    placement), or a single Device/Sharding applied to every leaf (default
    layouts — e.g. before any executable exists), or None for the default
    device. The disk read and the DMA overlap, so total ~= max(disk, link)
    + the non-overlapped remainder; stats carries both terms so the
    bottleneck can be named instead of asserted (BENCH round-5, VERDICT 1).

    In-flight puts are BOUNDED (see device_put_with_formats: unbounded
    async dispatch doubles the tree in HBM and wedges the stream), and the
    final block loop forces every leaf, so total_s is the true enqueue+
    drain wall time as seen by this host — over a buffering transport
    (e.g. the axon tunnel) only a subsequent consumer (the first query)
    observes full residency; time that separately."""
    from concurrent.futures import ThreadPoolExecutor

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if formats is None:
        formats = jax.devices()[0]
    broadcast = isinstance(formats, (jax.Device, jax.sharding.Sharding))
    if broadcast:
        fmt_leaves = [formats] * len(manifest)
    else:
        fmt_leaves = jax.tree_util.tree_flatten(formats)[0]
    if len(fmt_leaves) != len(manifest):
        raise ValueError(
            f"format tree has {len(fmt_leaves)} leaves, store has {len(manifest)}"
        )

    disk_s = 0.0
    t0 = time.perf_counter()

    def read(entry):
        nonlocal disk_s
        r0 = time.perf_counter()
        arr = np.load(os.path.join(path, entry["file"]))
        want = _resolve_dtype(entry.get("dtype"))
        if want is not None and arr.dtype != want:
            arr = arr.view(want)
        disk_s += time.perf_counter() - r0
        return arr

    def reads():
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = [pool.submit(read, e) for e in manifest[:max_prefetch]]
            for i in range(len(manifest)):
                if i + max_prefetch < len(manifest):
                    pending.append(pool.submit(read, manifest[i + max_prefetch]))
                yield pending[i].result()

    placed = _put_bounded(reads(), fmt_leaves, max_inflight_bytes)
    for leaf in placed:
        leaf.block_until_ready()
    total_s = time.perf_counter() - t0

    # rebuild the tree in the formats tree's structure (manifest order is
    # tree_flatten order — save_params_dir wrote it that way); with a
    # broadcast target the structure comes from the manifest paths instead
    if broadcast:
        tree = _tree_from_manifest(manifest, placed)
    else:
        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(formats), placed
        )
    nbytes = sum(l.nbytes for l in placed)
    stats = {
        "total_s": total_s,
        "disk_s": disk_s,  # thread time inside np.load (overlaps the DMA)
        "bytes": nbytes,
        "mb_per_s": nbytes / 1e6 / total_s if total_s else float("inf"),
    }
    return tree, stats


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

def _synthetic_int8_tree(cfg, qlin, qnorm):
    """Shared structure of the synthetic int8 Flux tree (matches
    models/quant.quantize_flux_int8 output); `qlin(d_in, d_out, lead=())`
    and `qnorm(lead)` supply the leaves (host numpy or on-device jnp)."""
    h, mh = cfg.hidden_size, cfg.mlp_hidden_dim
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
    return params


def build_synthetic_int8_checkpoint(cfg, path: str, seed: int = 0) -> None:
    """Write a random int8-quantized full-size Flux checkpoint to disk
    (bench seam: exercises the exact real-weight serving path without FLUX
    weights in the environment). Host-side numpy, leaf-streamed to disk."""
    rng = np.random.default_rng(seed)
    d = cfg.head_dim

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

    save_params_dir(_synthetic_int8_tree(cfg, qlin, qnorm), path)


# On-device random int8 init (zero host->device transfer — fast full-size
# server boots over slow links): models/quant.init_flux_int8. Structure
# parity with this module's on-disk checkpoint is tested in
# tests/test_serving.py.
