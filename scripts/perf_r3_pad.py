"""Honest chained A/B of the seq-pad-to-200 encoder stack.

perf_r3_sched.py's `encode` rows fed a loop-INVARIANT pixel constant into
the timing scan, so XLA could hoist the encode out of the loop — those
numbers (38.4 / 14.9 ms) exceed the int8 roofline and are invalid.  Here
every variant chains the scan carry through the full 12-layer stack:

  A  x[B,197,D] -> 12 fused layers @197            (baseline = scan12)
  B  x -> pad(200) -> 12 layers @200 (vl=197) -> slice[:197]
  C  B + parallel grid semantics
  D  B + phased SDPA
  E  B + parallel + phased

Usage: python scripts/perf_r3_pad.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms  # noqa: E402

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402

B = 256
CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
PARAMS["encoder"] = _cast_quantized(
    quantize_encoder(P32["encoder"], quantize_attn_proj=True), jnp.bfloat16
)
ENC = PARAMS["encoder"]
X = jax.random.normal(
    jax.random.PRNGKey(2), (B, CFG.encoder.seq_len, CFG.encoder.hidden_size),
    jnp.bfloat16,
)


def stack(ecfg, pad_to: int):
    s_true = CFG.encoder.seq_len

    def body(x):
        if pad_to > s_true:
            x = jnp.pad(x, ((0, 0), (0, pad_to - s_true), (0, 0)))

        def step(c, lp):
            return vit.encoder_block(c, lp, ecfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y[:, :s_true] if pad_to > s_true else y

    return body


def main():
    base = dataclasses.replace(CFG.encoder, seq_pad_to=0)
    cases = [
        ("A @197 baseline", base, 0),
        ("B pad200", base, 200),
        ("C pad+parallel", dataclasses.replace(base, parallel_grid=True), 200),
        ("D pad+phased", dataclasses.replace(base, batched_sdpa="phased"), 200),
        (
            "E pad+par+phased",
            dataclasses.replace(base, parallel_grid=True, batched_sdpa="phased"),
            200,
        ),
    ]
    for label, ecfg, pad in cases:
        ms = op_ms(stack(ecfg, pad), X, n1=2, n2=6, iters=4)
        print(f"{label:20s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
