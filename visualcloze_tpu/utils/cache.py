"""Persistent XLA compilation cache (opt-in).

TPU compiles are expensive (~20-40s for the denoise program); the cache makes
warm restarts instant. Called by the CLIs; controlled via VISUALCLOZE_CACHE_DIR
(default ~/.cache/visualcloze_tpu/xla).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint(platform: str) -> str:
    """Cache namespace per (platform, host ISA). XLA:CPU persistent-cache
    entries embed AOT machine-code compiled for the *compiling* host's CPU
    features, and XLA does not key on them — an entry written on an
    AVX512-richer host dispatch-fails on a leaner one ("Function
    slice_bitcast_fusion not found"). TPU/GPU executables target the
    accelerator, so the platform name alone suffices there."""
    if platform != "cpu":
        return platform
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 spells the ISA-feature line "flags"; arm64 "Features"
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return "cpu-" + hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    # No parseable cpuinfo (macOS, exotic kernels): namespace by the machine
    # identity instead of collapsing every such host into one shared bucket
    # that would cross-load foreign-ISA AOT machine code.
    import platform as _plat

    u = _plat.uname()
    ident = "|".join([u.system, u.machine, u.processor, u.version])
    return "cpu-" + hashlib.sha256(ident.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "VISUALCLOZE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "visualcloze_tpu", "xla"),
    )
    path = os.path.join(path, _host_fingerprint(jax.default_backend()))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
