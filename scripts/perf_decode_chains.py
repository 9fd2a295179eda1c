"""Decode-loop chain-latency sweep: interleaved independent row-chains and
the phased (grouped-matmul + tree-argmax) greedy head.

The g=8/16 scaling data (docs/PERF.md round 3) pins the mega-kernel's
dominant cost as per-program serial-chain latency (~0.32 of 0.55 ms/token
at g=16): each step is one long dependent op chain.  Two attacks:

- ``loop_chains=2``: split a program's rows into two independent chains
  whose step bodies are emitted interleaved — chain A's step has no data
  dependency on chain B's, so the scheduler can hide one chain's latency
  under the other's work.  (The encoder-side analog, mlp_subtiles, measured
  WORSE — but there the split cost MXU-sized matmul efficiency; here the
  matmuls are already tiny and latency-bound.)
- ``head_phased``: the greedy head's 12 vocab tiles currently form a
  serial (matmul, max, argmax, select) chain; phased emission groups all
  matmuls first and reduces as a binary tree (12 links -> ~4 levels).

COMPILE BUDGET: ~17-25 min per config — t(31) wall only, deltas against
the in-process default row (fixed tunnel cost cancels).

Usage: python scripts/perf_decode_chains.py
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
    ref_tokens = None
    for group, budget, chains, phased in (
        (16, 110, 1, False),   # current serving config — the delta reference
        (16, 110, 1, True),    # phased head only
        (16, 110, 2, False),   # 2 chains of 8 rows, 16 programs
        (32, 122, 2, False),   # 2 chains of 16 rows, 8 programs
    ):
        label = f"g={group} chains={chains} phased={phased}"
        try:
            fn = jax.jit(
                lambda p, c, _g=group, _b=budget, _ch=chains, _hp=phased:
                greedy_decode_loop(
                    p, c, DCFG, steps=31, dtype=jnp.bfloat16,
                    group=_g, vmem_budget_mb=_b, chains=_ch, head_phased=_hp,
                )
            )
            out = fn(QDEC, cross)
            toks = np.asarray(out[0])
            if ref_tokens is None:
                ref_tokens = toks
            parity = np.array_equal(toks, ref_tokens)
            t31 = wall_ms(fn, QDEC, cross)
            if base_t31 is None:
                base_t31 = t31
            print(
                f"{label:32s} t31={t31:7.2f} ms  "
                f"delta={t31 - base_t31:+7.2f} ms  parity={parity}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{label:32s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
