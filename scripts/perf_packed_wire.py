"""Packed-wire A/B: gray (padded) vs packed (tight) host->device format.

The gray wire ships the padded [B, bh, bw] batch (~4.2 MB for a 256-crop
(128,128)-bucket page); the packed wire ships each crop's gray bytes
tightly plus [B] offsets (~2.9 MB on the bench distribution) and
reconstructs the padded batch on-device with a clamped gather
(byte-identical, tests/test_engine.py).  Through the ~45 MB/s tunnel the
wire is the full-path bottleneck, so ~30% fewer bytes should be ~30% less
h2d time; on directly-attached v5e it is simply ~30% less DMA.

Measures: unpack-only device cost, sync ocr_page stage split for both
wires, and the streamed ocr_pages rate for both.

Usage: python scripts/perf_packed_wire.py
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
from manga_ocr_tpu.ops import preprocess as pp  # noqa: E402
from manga_ocr_tpu.parallel import batching  # noqa: E402
from manga_ocr_tpu.utils.metrics import StageTimer  # noqa: E402

B, PAGES = 256, 6


def say(m):
    print(m, flush=True)


def main() -> None:
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
        .astype(np.uint8)
        for _ in range(B)
    ]

    # --- unpack-only device cost (slope over repeated gathers) ----------
    [pb] = batching.prep_page_packed(crops, 1)
    flat = jnp.asarray(pb.flat)
    meta = jnp.asarray(np.concatenate([pb.sizes, pb.offsets[:, None]], axis=1))
    bh, bw = pb.bucket_hw
    say(f"wire bytes: packed {pb.flat.size/1e6:.2f} MB vs gray "
        f"{pb.sizes.shape[0]*bh*bw/1e6:.2f} MB")

    def make_unpack_n(n):
        # the carry is chained THROUGH the gather via a one-byte write to
        # flat — a loop-invariant body would be hoisted by XLA and measure
        # one gather instead of n (docs/PERF.md measurement hazard)
        @jax.jit
        def f(flat, meta):
            def step(c, _):
                f2 = flat.at[0, 0].set(c.astype(jnp.uint8))
                u, _sz = pp.unpack_packed_page(f2, meta, bh=bh, bw=bw)
                return (c + jnp.sum(u[:1, :8].astype(jnp.int32))) & 0xFF, None

            c, _ = jax.lax.scan(step, jnp.int32(0), None, length=n)
            return c

        return f

    t = {}
    for n in (2, 10):
        fn = make_unpack_n(n)
        _ = int(fn(flat, meta))
        t0 = time.perf_counter()
        for _ in range(4):
            _ = int(fn(flat, meta))
        t[n] = (time.perf_counter() - t0) / 4
    say(f"unpack device cost: {(t[10]-t[2])/8*1e3:.3f} ms per [{B},{bh},{bw}] gather")

    # --- engines ---------------------------------------------------------
    params = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    pages = [crops] * PAGES
    for wire in ("gray", "packed"):
        eng = TpuMangaOcrEngine(
            params, MangaOCRConfig.base(), CharTokenizer.synthetic(),
            max_length=32, dtype=jnp.bfloat16, wire=wire,
        )
        eng.ocr_page(crops)
        eng.ocr_pages(pages[:3])
        timer = StageTimer()
        with timer.stage("ocr_page"):
            eng.ocr_page(crops, timer=timer)
        say(f"[{wire}] stage split: "
            + str({k: round(v["mean_ms"], 1) for k, v in timer.summary().items()}))
        for la in (2, 3):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                out = eng.ocr_pages(pages, lookahead=la)
                best = min(best, time.perf_counter() - t0)
                n = sum(len(x) for x in out)
            say(f"[{wire}] lookahead {la}: {n/best:.1f} crops/s "
                f"({best/PAGES*1e3:.1f} ms/page)")


if __name__ == "__main__":
    main()
