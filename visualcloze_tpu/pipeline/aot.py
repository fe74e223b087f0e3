"""AOT-serialized serving executables: the cold-start killer.

A serving-daemon restart re-pays XLA compilation for every (bucket,
adapter-signature) denoise program — ~10 minutes for the two int8 12B
buckets (BENCH_r03 "compile+load 582s one-time") even though the weights
load in seconds from the on-disk leaf store (pipeline/serving.py). The
persistent *HLO* compilation cache helps only when XLA's internal key
matches; this module removes the compile from the restart path entirely by
serializing the **compiled executable** itself (jax.experimental
.serialize_executable) keyed by a stable signature of (function tag,
abstract inputs, static args, backend fingerprint).

Two layers:

- save_executable / load_executable — one compiled program <-> one file
  (pickle of the PJRT executable blob + in/out pytree defs).
- AotJit — a drop-in for ``jax.jit(fn, static_argnames=...)`` that, once
  ``enable(cache_dir)`` is called, dispatches each call signature to a
  deserialized executable when one is on disk, else compiles once and
  persists. Without enable() it behaves exactly like jax.jit (tests and
  non-serving paths pay nothing).

VisualClozeModel wraps its denoise/VAE programs in AotJit; serve.py enables
it by default (--aot_dir / $VISUALCLOZE_AOT_DIR) so a daemon restart loads
executables + int8 leaves instead of recompiling. bench.py measures the
resulting warm-restart.

Safety: executables are valid only for the exact backend (jax version,
platform, device kind, device count) and input layout — all part of the key;
a failed deserialize falls back to a fresh compile and overwrites the entry.
Deserialize success is NOT sufficient on the CPU backend: XLA:CPU AOT blobs
embed LLVM target features (including synthetic tuning flags like
+prefer-no-scatter that no host ever reports), and a mismatched reload
surfaces only at DISPATCH time as "Function <fusion> not found (type id: 1)"
— observed on this very host reloading its own entries across processes. So
the first call of a disk-loaded executable is validated (block_until_ready
inside try/except) and falls back to a fresh compile on any runtime error.
Worse, a bad CPU reload can poison LATER loads in the same process (the
fusion-function registry interaction is order-dependent), so on the cpu
backend enable() is a no-op unless VISUALCLOZE_AOT_FORCE=1 — CPU warm
restarts ride the persistent HLO cache (utils/cache.py) instead. TPU
executables target the accelerator, not host LLVM codegen, and reload
cleanly.
"""

from __future__ import annotations

import functools
import hashlib
import logging
import os
import pickle
import time
from typing import Any, Callable

import jax

logger = logging.getLogger(__name__)

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "visualcloze_tpu", "aot"
)


def default_aot_dir() -> str:
    return os.environ.get("VISUALCLOZE_AOT_DIR", DEFAULT_DIR)


@functools.lru_cache(maxsize=1)
def code_fingerprint() -> str:
    """Hash of the package's Python source. Without it a daemon restart
    after a code change (same jax, same shapes) would silently reuse the
    executable compiled from the OLD code — a numerics fix to flux_apply or
    denoise would never reach a warm-restarted server. ~16k LoC hashes in
    well under 100 ms, once per process."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fname in sorted(filenames):
            if not fname.endswith((".py", ".json", ".c", ".so")):
                continue
            path = os.path.join(dirpath, fname)
            h.update(os.path.relpath(path, pkg_root).encode())
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:
                pass
    return h.hexdigest()[:16]


def backend_fingerprint() -> str:
    """Everything a serialized executable is specific to. For the CPU
    backend that includes the HOST ISA: XLA:CPU executables embed machine
    code compiled for the compiling host's CPU features, and running one on
    a leaner host dispatch-fails ("Function ... not found") — a runtime
    error the deserialize-time fallback cannot catch (utils/cache.py has
    the same keying for the HLO cache)."""
    from ..utils.cache import _host_fingerprint

    devs = jax.devices()
    return "|".join([
        jax.__version__,
        code_fingerprint(),
        _host_fingerprint(jax.default_backend()),
        getattr(devs[0], "device_kind", "?"),
        str(len(devs)),
    ])


def _leaf_sig(leaf) -> str:
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", type(leaf).__name__)
    sharding = getattr(leaf, "sharding", None)
    return f"{shape}:{dtype}:{sharding}"


def call_signature(tag: str, args: tuple, static_kwargs: dict) -> str:
    """Stable content key for one call: tag + backend + static args +
    tree structure + per-leaf (shape, dtype, sharding)."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    h = hashlib.sha256()
    h.update(backend_fingerprint().encode())
    h.update(tag.encode())
    h.update(repr(sorted(static_kwargs.items())).encode())
    h.update(str(treedef).encode())
    for leaf in leaves:
        h.update(_leaf_sig(leaf).encode())
    return h.hexdigest()[:24]


def save_executable(compiled, path: str) -> None:
    """Persist one compiled program (atomic rename; best-effort). The
    executable's device-id assignment rides along: deserialize_and_load
    defaults to ALL client devices, which breaks any program compiled for a
    subset (e.g. single-device programs on a multi-chip host)."""
    from jax.experimental import serialize_executable as se

    blob, in_tree, out_tree = se.serialize(compiled)
    device_ids = [d.id for d in compiled.runtime_executable().local_devices()]
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump((blob, in_tree, out_tree, device_ids), f)
    os.replace(tmp, path)


def load_executable(path: str):
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        blob, in_tree, out_tree, device_ids = pickle.load(f)
    by_id = {d.id: d for d in jax.devices()}
    return se.deserialize_and_load(
        blob, in_tree, out_tree,
        execution_devices=[by_id[i] for i in device_ids],
    )


class AotJit:
    """jax.jit plus an on-disk executable cache.

    Dynamic args are positional; keyword args must all be static
    (static_argnames). Until enable() is called this is a plain jax.jit.
    """

    def __init__(self, fn: Callable, static_argnames=(), tag: str = "fn"):
        self._static = tuple(static_argnames)
        self._jit = jax.jit(fn, static_argnames=self._static)
        self._execs: dict[str, Any] = {}
        self._dir: str | None = None
        self.tag = tag
        self.stats = {"compiles": 0, "disk_loads": 0, "hits": 0}

    def enable(self, cache_dir: str) -> "AotJit":
        if jax.default_backend() == "cpu" and not os.environ.get(
            "VISUALCLOZE_AOT_FORCE"
        ):
            # XLA:CPU AOT reload is unreliable in-process AND cross-process
            # (module docstring); CPU restarts are served by the persistent
            # HLO cache (utils/cache.py) instead. VISUALCLOZE_AOT_FORCE=1
            # opts back in (tests exercising the disk path).
            logger.info("aot: disk persistence disabled on the cpu backend "
                        "(XLA:CPU AOT loader unreliable); jit-only")
            return self
        os.makedirs(cache_dir, exist_ok=True)
        self._dir = cache_dir
        return self

    def __call__(self, *args, **kwargs):
        if self._dir is None:
            return self._jit(*args, **kwargs)
        unknown = set(kwargs) - set(self._static)
        if unknown:
            raise TypeError(
                f"AotJit({self.tag}): keyword args must be static, got {unknown}"
            )
        key = call_signature(self.tag, args, kwargs)
        ex = self._execs.get(key)
        if ex is not None:
            self.stats["hits"] += 1
            return ex(*args)
        path = os.path.join(self._dir, f"{self.tag}-{key}.jaxexec")
        if os.path.exists(path):
            # Deserialize AND validate by running this very call: XLA:CPU
            # AOT reloads can deserialize fine yet dispatch-fail ("Function
            # <fusion> not found") — see module docstring. One
            # block_until_ready per (signature, process) is the cost.
            try:
                t0 = time.perf_counter()
                ex = load_executable(path)
                out = ex(*args)
                jax.block_until_ready(out)
                self.stats["disk_loads"] += 1
                logger.info("aot: loaded %s in %.1fs (skipped compile)",
                            os.path.basename(path), time.perf_counter() - t0)
                self._execs[key] = ex
                return out
            except Exception as e:  # stale/corrupt/foreign-host/lossy blob
                logger.warning("aot: reload of %s failed (%s); recompiling",
                               path, e)
        t0 = time.perf_counter()
        ex = self._jit.lower(*args, **kwargs).compile()
        self.stats["compiles"] += 1
        try:
            save_executable(ex, path)
            logger.info("aot: compiled+saved %s (%.1fs)",
                        os.path.basename(path), time.perf_counter() - t0)
        except Exception as e:  # serialization unsupported -> still serve
            logger.warning("aot: could not persist %s (%s)", path, e)
        self._execs[key] = ex
        return ex(*args)
