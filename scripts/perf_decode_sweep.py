"""Decode-length sensitivity sweep (VERDICT round-1 #8).

Measures the serving configuration at B=256 across decode budgets
(8/16/32/64 fixed-length) plus a realistic-length mode: per-row stop
lengths drawn from the committed bubble-length distribution (clipped
lognormal, median ~12 chars — typical manga bubbles run 5-30 chars) with
chunked early exit, so the done-masking machinery is exercised exactly as
it would be with a real checkpoint emitting EOS.

Usage: python scripts/perf_decode_sweep.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import time_fn  # noqa: E402

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402

B = 256
# The committed realistic bubble-length distribution lives in ONE place —
# the bench (its budget-300 phase scores against it); import, don't copy.
from manga_ocr_tpu.benchmark import committed_lengths  # noqa: E402


def main():
    cfg = MangaOCRConfig.serving()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(params_f32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    px = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)

    print("| budget | mode | ms/batch | crops/s |")
    for budget in (8, 16, 32, 64):
        fn = mdl.make_jitted_ocr(cfg, max_length=budget, chunk_size=budget)
        t = time_fn(lambda p, x: fn(p, x), params, px, iters=5)
        print(f"| {budget} | fixed | {t:.1f} | {B / t * 1000:.0f} |")
        sys.stdout.flush()

    # realistic: max budget 48, chunk 8, forced stops from the distribution
    stops = jnp.asarray(committed_lengths(B))

    @jax.jit
    def realistic(p, x):
        enc = mdl.encode(p, x, cfg)
        return mdl.greedy_decode(p, enc, cfg, max_length=48, chunk_size=8, stop_lengths=stops)

    t = time_fn(lambda p, x: realistic(p, x), params, px, iters=5)
    out = realistic(params, px)
    print(f"| 48 (chunk 8) | realistic (median ~12) | {t:.1f} | {B / t * 1000:.0f} |")
    print(f"# realistic mean emitted length: {float(np.asarray(out.lengths).mean()):.1f}")


if __name__ == "__main__":
    main()
