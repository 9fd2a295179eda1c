"""Streamed serving-loop A/B after the native host-prep landing.

The round-3 steady-state A/B (docs/PERF.md) measured sync 936 / lookahead-1
976 / lookahead-2 1200 crops/s with the NumPy prep (~55 ms/page of host
CPU).  The native fused prep cuts that to ~5 ms/page, which both shrinks
the per-page critical path and frees the single host core for the readback
loop — so the lookahead optimum may move again.  Re-sweep: sync, lookahead
1..4, plus the per-stage split from one synchronous call.

Usage: python scripts/perf_stream3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.tokenizer import CharTokenizer  # noqa: E402
from manga_ocr_tpu.utils.metrics import StageTimer  # noqa: E402

B, PAGES = 256, 6


def say(m):
    print(m, flush=True)


def main() -> None:
    params = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    engine = TpuMangaOcrEngine(
        params,
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=32,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
        .astype(np.uint8)
        for _ in range(B)
    ]
    engine.ocr_page(crops)  # compile + warm
    pages = [crops] * PAGES
    engine.ocr_pages(pages[:3])  # warm the streamed loop itself

    timer = StageTimer()
    with timer.stage("ocr_page"):
        engine.ocr_page(crops, timer=timer)
    say("stage split (sync): " + str({k: round(v["mean_ms"], 1) for k, v in timer.summary().items()}))

    def run(label, fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            n = sum(len(t) for t in out)
            best = min(best, dt)
        say(f"{label}: {n / best:.1f} crops/s ({best / PAGES * 1e3:.1f} ms/page)")

    run("sync loop     ", lambda: [engine.ocr_page(p) for p in pages])
    for la in (1, 2, 3, 4):
        run(f"lookahead {la}   ", lambda la=la: engine.ocr_pages(pages, lookahead=la))


if __name__ == "__main__":
    main()
