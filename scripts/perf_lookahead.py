"""Serving-loop lookahead A/B: sync ocr_page loop vs streamed ocr_pages
at lookahead 1/2, steady-state (256-crop single-bucket pages, full-size
model, serving config).

Round-3-final measurement (v5e via tunnel):
  sync 936 / 934 crops/s (repeat), lookahead 1: 976, lookahead 2: 1200.
Two pages in flight cover the readback RTT that one leaves exposed;
``ocr_pages`` defaults to lookahead=2 accordingly (engine/engine.py).

Usage: python scripts/perf_lookahead.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.tokenizer import CharTokenizer  # noqa: E402


def main():
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    engine = TpuMangaOcrEngine(
        params_f32,
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=32,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
        .astype(np.uint8)
        for _ in range(256)
    ]
    _ = engine.ocr_page(crops)  # warm
    pages = [crops] * 6
    _ = engine.ocr_pages(pages[:3])  # warm the streamed loop (first pass ~3x slow)
    for label, call in (
        ("sync loop      ", lambda: [engine.ocr_page(p) for p in pages]),
        ("lookahead=1    ", lambda: engine.ocr_pages(pages, lookahead=1)),
        ("lookahead=2    ", lambda: engine.ocr_pages(pages, lookahead=2)),
        ("sync loop again", lambda: [engine.ocr_page(p) for p in pages]),
    ):
        t0 = time.perf_counter()
        out = call()
        dt = time.perf_counter() - t0
        n = sum(len(t) for t in out)
        print(
            f"{label} {n / dt:8.1f} crops/s  ({dt / len(pages) * 1000:.0f} ms/page)",
            flush=True,
        )


if __name__ == "__main__":
    main()
