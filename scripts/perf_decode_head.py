"""Decode-loop head sweep: vocab-matmul tile size x group/VMEM budget.

The mega-kernel's greedy head runs the [g, 768] @ [768, 6144] vocab matmul
as a chain of per-tile (matmul, max, argmax, select) updates — each tile is
a serial link in the step's latency chain (the loop is chain-latency-bound,
docs/PERF.md round 3).  At g=16 the full [16, 6144] f32 logits are 393 KB,
so one un-tiled matmul + one argmax is VMEM-trivial; sweep tile sizes to
trade chain links against Mosaic's per-op scheduling.

Also re-probes group=32 with a raised auto-shrink budget (the r3 g=32 row
used manual slab DMA because the default 110 MB estimate shrank the block;
the compiler cap is 127 MB and the estimate's fixed term is conservative).

COMPILE BUDGET: the mega-kernel's Mosaic compile is ~17 min per config
(measured round 3) — so this sweep times t(31) ONLY, un-pipelined wall per
dispatch, and compares DELTAS against the in-process default-config row
(the tunnel's fixed dispatch cost is shared and cancels in the delta).
Run a confirming t15 slope only on a winner before landing it.

Usage: python scripts/perf_decode_head.py
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

from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_decoder  # noqa: E402
from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.ops.decode_loop import greedy_decode_loop  # noqa: E402

B = 256
CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
QDEC = _cast_quantized(quantize_decoder(P32["decoder"]), jnp.bfloat16)
DCFG = CFG.decoder
ENC = jax.random.normal(
    jax.random.PRNGKey(2), (B, CFG.encoder.seq_len, CFG.encoder.hidden_size),
    jnp.bfloat16,
)


def wall_ms(fn, *args, iters=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cross = jax.jit(
        lambda p, e: dec.precompute_cross_kv_packed(p, e, DCFG)
    )(PARAMS["decoder"], ENC)

    base_t31 = None
    for group, budget, vt in (
        (16, 110, 512),    # current serving config — the delta reference
        (16, 110, 2048),   # 3 head chain links instead of 12
        (32, 122, 512),    # block-spec g=32: raised budget, cap is 127
    ):
        label = f"g={group} budget={budget} vt={vt}"
        try:
            fn = jax.jit(
                lambda p, c, _g=group, _b=budget, _vt=vt: greedy_decode_loop(
                    p, c, DCFG, steps=31, dtype=jnp.bfloat16,
                    group=_g, vmem_budget_mb=_b, vocab_tile=_vt,
                )[1]
            )
            t31 = wall_ms(fn, QDEC, cross)
            if base_t31 is None:
                base_t31 = t31
            print(
                f"{label:30s} t31={t31:7.2f} ms  "
                f"delta={t31 - base_t31:+7.2f} ms vs default",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{label:30s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
