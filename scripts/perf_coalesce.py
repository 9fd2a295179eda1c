"""A/B: coalesced single-readback vs per-bucket readbacks on TWO-BUCKET pages.

The round-3 full-path recheck measured the streamed loop DROPPING below the
sync rate when the page's crop mix spans two shape buckets (two dispatches +
two blocking readbacks per page; docs/PERF.md).  The engine now concatenates
the per-bucket token matrices on device so a multi-bucket page costs ONE
readback RPC.  This script measures the steady-state streamed rate both ways
within one process (within-run A/B per the tunnel discipline): the flag flip
reuses the same engine, params, and compiled model programs — only the
readback plan differs.

Workload: 256-crop pages, half in the (128,128) bucket, half in (256,256)
(padded batch 128 each — two model dispatches per page either way).

Usage: python scripts/perf_coalesce.py [n_pages_per_round]
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

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MAX_NEW = 32


def make_page(rng) -> list[np.ndarray]:
    crops = []
    for _ in range(128):  # -> (128, 128) bucket
        crops.append(
            rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
            .astype(np.uint8)
        )
    for _ in range(128):  # -> (256, 256) bucket
        crops.append(
            rng.integers(0, 256, size=(rng.integers(160, 250), rng.integers(130, 250), 3))
            .astype(np.uint8)
        )
    return crops


def stream_rate(engine, pages, rounds=3) -> float:
    best = float("inf")
    n = sum(len(p) for p in pages)
    for _ in range(rounds):
        t0 = time.perf_counter()
        texts = engine.ocr_pages(pages)
        best = min(best, time.perf_counter() - t0)
        assert sum(len(t) for t in texts) == n
    return n / best


def sync_split(engine, crops) -> dict:
    timer = StageTimer()
    with timer.stage("ocr_page"):
        engine.ocr_page(crops, timer=timer)
    return {k: round(v["mean_ms"] * v["count"], 1) for k, v in timer.summary().items()}


def main() -> None:
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    engine = TpuMangaOcrEngine(
        params_f32,
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=MAX_NEW,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    page = make_page(rng)
    pages = [page] * N_PAGES

    print("warming (2 model programs @B=128 + concat)...", flush=True)
    t0 = time.perf_counter()
    engine.ocr_page(page)
    print(f"warm took {time.perf_counter() - t0:.1f}s", flush=True)
    engine.ocr_pages(pages[:3])  # warm the streamed loop

    texts_by_mode = {}
    # modes: off = per-bucket transfers + per-bucket readbacks;
    # readback = per-bucket transfers, ONE fused readback;
    # full = ONE fused h2d buffer + ONE fused readback.  ABA to bound drift.
    for mode in ("full", "readback", "off", "full"):
        engine._coalesce = mode in ("full", "readback")
        engine._fuse_wire = mode == "full"
        if mode not in texts_by_mode:
            texts_by_mode[mode] = engine.ocr_page(page)
        engine.ocr_pages(pages[:2])
        rate = stream_rate(engine, pages)
        split = sync_split(engine, page)
        print(
            f"mode={mode}: streamed {rate:.1f} crops/s "
            f"({256 / rate * 1000:.1f} ms/page); sync split total-ms {split}",
            flush=True,
        )
    ref = texts_by_mode["off"]
    for mode, texts in texts_by_mode.items():
        assert texts == ref, f"mode {mode} diverged from per-bucket path"
    print("token parity across modes: ok", flush=True)


if __name__ == "__main__":
    main()
