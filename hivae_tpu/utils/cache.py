"""Persistent XLA compilation cache (flagship models take minutes to
compile; the cache makes warm starts near-instant). Call early in CLIs."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("HIVAE_XLA_CACHE",
                                  os.path.expanduser("~/.cache/hivae_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
