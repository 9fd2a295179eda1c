"""A/B: fuse_cross_kv (final-LN + cross-K/V projections inside the decode
mega-kernel) vs the precomputed-slab XLA tail, full ocr_forward at the
serving config.  Token equality is asserted on the SAME random weights.

Usage: python scripts/perf_fuse_kv.py
"""

from __future__ import annotations

import dataclasses
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

B = 256
MAX_NEW = 32
ITERS = 8


def bench(fn, params, px):
    out = fn(params, px)
    np.asarray(out.lengths)  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(params, px) for _ in range(ITERS)]
    for o in outs:
        np.asarray(o.lengths)
    dt = (time.perf_counter() - t0) / ITERS
    return dt, out


def main():
    cfg_fuse = MangaOCRConfig.serving()
    cfg_ref = dataclasses.replace(
        cfg_fuse,
        decoder=dataclasses.replace(cfg_fuse.decoder, fuse_cross_kv=False),
    )
    p32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(p32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(p32["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    px = jax.jit(lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )

    results = {}
    for name, cfg in (("ref", cfg_ref), ("fuse", cfg_fuse)):
        fn = mdl.make_jitted_ocr(cfg, max_length=MAX_NEW, chunk_size=MAX_NEW)
        t0 = time.perf_counter()
        dt, out = bench(fn, params, px)
        print(
            f"{name}: {dt * 1e3:.2f} ms/dispatch = {B / dt:.1f} crops/s "
            f"(compile+warm {time.perf_counter() - t0 - ITERS * dt:.0f}s)",
            flush=True,
        )
        results[name] = (dt, np.asarray(out.tokens), np.asarray(out.lengths))

    tok_eq = np.array_equal(results["ref"][1], results["fuse"][1])
    len_eq = np.array_equal(results["ref"][2], results["fuse"][2])
    print(f"token parity: tokens={tok_eq} lengths={len_eq}")
    speedup = results["ref"][0] / results["fuse"][0]
    print(f"speedup: {speedup:.3f}x "
          f"({results['ref'][0]*1e3:.2f} -> {results['fuse'][0]*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
