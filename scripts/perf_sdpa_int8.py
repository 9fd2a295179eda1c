"""Encoder int8-SDPA sweep, in-context (stacked-weight scan12 at the
serving shape [256, 200, 768]).

``attn_sdpa_int8`` moves the two SDPA matmuls (QK^T and PV — the only bf16
MXU ops left in the serving encoder) onto the int8 MXU path with dynamic
quantization.  The dh=64 contraction half-fills the MXU's K depth in any
dtype; int8's double-pumped rate is the only lever past that shape loss.
Cost side: four extra quant passes per (batch, head) on the VPU.  This
sweep measures whether the MXU saving survives the added VPU work, at the
group optimum and its neighbors.

Usage: python scripts/perf_sdpa_int8.py
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
ECFG = CFG.encoder
ENC = PARAMS["encoder"]
SP = ECFG.seq_pad_to or ECFG.seq_len
X = jax.random.normal(
    jax.random.PRNGKey(2), (B, SP, ECFG.hidden_size), jnp.bfloat16
)


def scan12(cfg):
    def body(x):
        def step(c, lp):
            return vit.encoder_block(c, lp, cfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def main():
    for sdpa_i8, group in ((False, 4), (True, 4), (True, 8), (True, 2)):
        cfg = dataclasses.replace(ECFG, attn_sdpa_int8=sdpa_i8, attn_group=group)
        label = f"sdpa_int8={sdpa_i8} group={group}"
        try:
            ms = op_ms(scan12(cfg), X, n1=2, n2=6, iters=4)
            print(f"scan12 serving {label:28s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"scan12 serving {label:28s} FAILED "
                f"{type(e).__name__}: {str(e)[:90]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
