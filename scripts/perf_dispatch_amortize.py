"""Per-dispatch overhead probes on the model-only serving path.

Round-3 trace attribution: device total ~56.2 ms at B=256 (encoder 37.0 +
decode 16.9 + cross-KV tail 1.6 + glue 0.7), yet the pipelined bench
effective time is ~65 ms/dispatch (3927 crops/s) — ~9 ms/dispatch is spent
OUTSIDE the program.  Candidates: host issue cost per call (python arg
flatten + tunnel execute RPC) and device idle between consecutive programs
(if the tunnel admits one outstanding execute at a time).

Probes, in compile-risk order:
1. Reproduce the pipelined rate at B=256/384 + measure ISSUE-ONLY host time
   (time to submit all calls before the first readback) and an iters sweep
   (6 vs 16 — drain-edge effects shrink with depth).
2. Multi-page scan: K=4 pages of B=256 through ``lax.scan`` in ONE dispatch
   (distinct data per page, lengths out per page).  If per-dispatch overhead
   is real, crops/s rises toward the pure-device 256/0.0562 = 4555 ceiling;
   if the 9 ms is somehow inside the program boundary, it stays flat.
   NOTE: fresh Mosaic compile of the whole body (~up to 20 min) — runs last.

Usage: python scripts/perf_dispatch_amortize.py
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

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402

MAX_NEW = 32

CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
PARAMS["encoder"] = _cast_quantized(
    quantize_encoder(P32["encoder"], quantize_attn_proj=True), jnp.bfloat16
)
FN = mdl.make_jitted_ocr(CFG, max_length=MAX_NEW, chunk_size=MAX_NEW)


def say(msg: str) -> None:
    print(msg, flush=True)


def pipelined(b: int, iters: int) -> tuple[float, float, float]:
    """(crops/s, ms/dispatch, issue ms/dispatch) — bench.py methodology."""
    px = jax.jit(
        lambda k: jax.random.normal(k, (b, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    np.asarray(FN(PARAMS, px).lengths)  # warm
    best, issue_at_best = float("inf"), 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [FN(PARAMS, px) for _ in range(iters)]
        t_issue = (time.perf_counter() - t0) / iters
        for o in outs:
            np.asarray(o.lengths)
        dt = (time.perf_counter() - t0) / iters
        if dt < best:
            best, issue_at_best = dt, t_issue
    return b / best, best * 1e3, issue_at_best * 1e3


def main() -> None:
    for b in (256, 384):
        for iters in (6, 16):
            rate, ms, issue = pipelined(b, iters)
            say(
                f"B={b} iters={iters}: {rate:.1f} crops/s, {ms:.2f} ms/dispatch,"
                f" issue {issue:.2f} ms/dispatch"
            )

    # --- multi-page scan: K pages per dispatch --------------------------
    k, b = 4, 256

    def multi(params, pxs):  # pxs [K, B, 224, 224, 3]
        def step(c, px):
            out = mdl.ocr_forward(params, px, CFG, max_length=MAX_NEW,
                                  chunk_size=MAX_NEW)
            return c, out.lengths
        _, lengths = jax.lax.scan(step, 0, pxs)
        return lengths  # [K, B]

    mfn = jax.jit(multi)
    pxs = jax.jit(
        lambda key: jax.random.normal(key, (k, b, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    say(f"compiling scan-of-{k} (fresh Mosaic compile, may take ~20 min)...")
    t0 = time.perf_counter()
    np.asarray(mfn(PARAMS, pxs))
    say(f"compiled+first run in {time.perf_counter() - t0:.1f} s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [mfn(PARAMS, pxs) for _ in range(3)]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / 3)
    say(
        f"scan-of-{k} pages x B={b}: {k * b / best:.1f} crops/s "
        f"({best * 1e3:.1f} ms per {k}-page dispatch, "
        f"{best * 1e3 / k:.2f} ms/page)"
    )


if __name__ == "__main__":
    main()
