"""Persistent XLA compilation cache (opt-in).

TPU compiles are expensive (~20-40s for the denoise program); the cache makes
warm restarts instant. Called by the CLIs; controlled via VISUALCLOZE_CACHE_DIR
(default ~/.cache/visualcloze_tpu/xla).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "VISUALCLOZE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "visualcloze_tpu", "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
