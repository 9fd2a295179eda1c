"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel are slow (minutes for the
full decode graph); the persistent cache makes every later process start
warm.  Call ``enable()`` once, before the first jit execution.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/manga_ocr_tpu/xla")


def enable(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or os.environ.get("MANGA_OCR_TPU_XLA_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
