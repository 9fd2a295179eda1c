"""Measure COLD-compile wall time of the bench config rungs at B=256.

Round-3 postmortem (VERDICT.md): the driver's bench run must print a
scored line fast even when the persistent XLA cache misses (cache keys
for the big programs are unstable across time — docs/PERF.md).  This
script times the first-call compile of each candidate bench rung against
an empty cache dir so benchmark.py's rung ladder can budget honestly.

Run: MANGA_OCR_TPU_XLA_CACHE=$(mktemp -d) python scripts/perf_compile_times.py
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.quantize import quantize_encoder
    from manga_ocr_tpu.engine.engine import _cast_quantized
    from manga_ocr_tpu.utils import jax_cache

    cache = jax_cache.enable()
    print(f"cache dir: {cache} ({len(os.listdir(cache))} entries)", flush=True)

    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params_bf16 = mdl.cast_params(params_f32, jnp.bfloat16)
    params_q = dict(params_bf16)
    params_q["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True),
        jnp.bfloat16,
    )

    serving = MangaOCRConfig.serving()
    rungs = {
        # rung 0: reference XLA math, bf16 — no Pallas at all
        "xla_bf16": (MangaOCRConfig.base(), params_bf16),
        # rung 1: fused int8 encoder kernels, XLA decode step
        "fused_enc_xla_dec": (
            dataclasses.replace(
                serving,
                decoder=dataclasses.replace(
                    serving.decoder, step_kernel="xla", head_phased=False
                ),
            ),
            params_q,
        ),
        # rung 2: full serving config (decode mega-kernel)
        "serving_full": (serving, params_q),
    }

    import numpy as np

    for name, (cfg, params) in rungs.items():
        fn = mdl.make_jitted_ocr(cfg, max_length=32, chunk_size=32)
        px = jax.jit(
            lambda k: jax.random.normal(k, (256, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        t0 = time.perf_counter()
        out = fn(params, px)
        np.asarray(out.lengths)
        t1 = time.perf_counter()
        # warm second call for the run-time reference
        t2 = time.perf_counter()
        np.asarray(fn(params, px).lengths)
        t3 = time.perf_counter()
        print(
            f"{name}: first call {t1 - t0:.1f}s, warm {1000 * (t3 - t2):.1f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
