"""Serving-loop RPC-reduction A/B: packed single-array readback + threaded
dispatch (round-3 late changes) vs the recorded baseline.

Baseline (pre-change, docs/PERF.md): sync 936 crops/s, lookahead 1: 976,
lookahead 2: 1200 (213 ms/page).  The changes under test:

1. host-side slice of the readback (no device-side ``tokens[:valid]``
   dispatch — one less tunnel RTT per array),
2. lengths packed as column 0 of the token matrix (ONE readback RPC per
   page instead of two),
3. ``copy_to_host_async`` issued at dispatch time (transfer starts when
   compute finishes, not when the collector blocks),
4. ``ocr_pages`` dispatches on a background thread (page N+1 host prep +
   h2d overlap page N readback/detok).

Usage: python scripts/perf_serving_rpc.py
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
from manga_ocr_tpu.utils.metrics import StageTimer  # noqa: E402


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
    t0 = time.perf_counter()
    _ = engine.ocr_page(crops)  # warm (compile)
    print(f"warm/compile: {time.perf_counter() - t0:.1f}s", flush=True)
    pages = [crops] * 6
    _ = engine.ocr_pages(pages[:3])  # warm the streamed loop (first pass ~3x slow)
    for label, call in (
        ("sync loop      ", lambda: [engine.ocr_page(p) for p in pages]),
        ("lookahead=1    ", lambda: engine.ocr_pages(pages, lookahead=1)),
        ("lookahead=2    ", lambda: engine.ocr_pages(pages, lookahead=2)),
        ("lookahead=3    ", lambda: engine.ocr_pages(pages, lookahead=3)),
        ("lookahead=2 (r)", lambda: engine.ocr_pages(pages, lookahead=2)),
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
    timer = StageTimer()
    engine.ocr_page(crops, timer=timer)
    print(timer.report(), flush=True)


if __name__ == "__main__":
    main()
