"""Batch-size sweep of the serving e2e dispatch (XLA decode step).

The per-decode-step op-granularity overhead (~0.6 ms, docs/PERF.md) is
batch-INDEPENDENT, so larger batches amortize it: crops/s should rise with
B until encoder time or HBM traffic dominates.  Also reports encoder-only
time at each B (to size the unpadded fused-attn-layer change).

Usage: python scripts/perf_batch_sweep.py [b1 b2 ...]
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
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [256, 384, 512, 768, 1024]
MAX_NEW = 32


def timed(fn, args, iters=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = MangaOCRConfig.serving()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(params_f32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True),
        jnp.bfloat16,
    )
    fn_e2e = mdl.make_jitted_ocr(cfg, max_length=MAX_NEW, chunk_size=MAX_NEW)
    fn_enc = jax.jit(lambda p, x: vit.encode(p["encoder"], x, cfg.encoder))

    print(f"{'B':>5} {'enc ms':>8} {'e2e ms':>8} {'crops/s':>8}", flush=True)
    for b in BATCHES:
        px = jax.jit(
            lambda k: jax.random.normal(k, (b, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        try:
            t_enc = timed(fn_enc, (params, px))
            t_e2e = timed(lambda p, x: fn_e2e(p, x).lengths, (params, px))
        except Exception as e:  # noqa: BLE001
            print(f"{b:>5} failed: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"{b:>5} {t_enc:8.2f} {t_e2e:8.2f} {b / t_e2e * 1e3:8.0f}", flush=True)


if __name__ == "__main__":
    main()
