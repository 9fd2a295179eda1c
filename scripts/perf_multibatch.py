"""Multi-batch dispatch probe: K independent B=256 forward passes inside
ONE jitted program vs K separate dispatches.

Motivation: pipelined bench dispatches measure ~65 ms wall at ~55.6 ms
attributed device time — ~10 ms/dispatch of tunnel RPC tax that does not
overlap.  Raw batch scaling is flat (256→1024: per-crop device cost
grows), but K sequential B=256 programs in one dispatch keep the
per-crop device cost of B=256 while paying the dispatch tax once per K.

Usage: python scripts/perf_multibatch.py
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

B = 256
STEPS = 32


def main():
    cfg = MangaOCRConfig.serving()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(params_f32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True),
        jnp.bfloat16,
    )
    fn = mdl.make_jitted_ocr(cfg, max_length=STEPS, chunk_size=STEPS)

    px = jax.jit(
        lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    def rate_separate(iters=8):
        _ = np.asarray(fn(params, px).lengths)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [fn(params, px) for _ in range(iters)]
            for o in outs:
                np.asarray(o.lengths)
            best = min(best, (time.perf_counter() - t0) / iters)
        return B / best

    print(f"separate dispatches:      {rate_separate():8.1f} crops/s", flush=True)

    for k in (2, 4):
        # K forward passes in ONE program (distinct inputs so XLA cannot
        # CSE them; device executes them back-to-back, one dispatch tax)
        pxs = [px + jnp.float32(i).astype(jnp.bfloat16) for i in range(k)]

        @jax.jit
        def fn_k(p, *xs):
            return [fn(p, x).lengths for x in xs]

        _ = [np.asarray(l) for l in fn_k(params, *pxs)]
        best = float("inf")
        iters = max(2, 8 // k)
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [fn_k(params, *pxs) for _ in range(iters)]
            for o in outs:
                np.asarray(o[-1])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"fused dispatch k={k}:       {k * B / best:8.1f} crops/s", flush=True)


if __name__ == "__main__":
    main()
