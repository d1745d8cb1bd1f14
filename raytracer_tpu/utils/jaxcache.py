"""Persistent XLA compilation cache setup.

First compiles through the TPU tunnel cost seconds to minutes; the
persistent cache makes every later process start warm. Called by the CLI,
bench, and engine entry points (safe to call multiple times / on CPU).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "RAYTRACER_TPU_CACHE", os.path.expanduser("~/.cache/raytracer_tpu_xla")
    )
    if cache_dir == "off":
        # RAYTRACER_TPU_CACHE=off: hard-disable (the test suite — a
        # fresh per-run dir would give zero cross-process reuse since
        # CLI tests run main() in-process, while the cache WRITE path
        # has segfaulted inside jax's put_executable_and_time
        # mid-suite; observed 2026-08-19, VERDICT r4. Skipping the
        # cache also skips serializing every >1s executable.)
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — run without the cache
