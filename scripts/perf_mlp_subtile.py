"""MLP subtile-interleave sweep, measured in the REAL serving context: a
12-layer stacked-weight scan at the padded serving shape [B, 200, D]
(PERF.md discipline: isolated-kernel slopes are optimistic).

Also quantifies the quant_rows no-clip change (already applied globally —
the baseline row here includes it; compare against the recorded 37.0 ms).

Usage: python scripts/perf_mlp_subtile.py
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
ECFG = CFG.encoder  # serving: fused_layer attn + fused MLP, seq_pad_to=200
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
    for subtiles in (1, 2, 4):
        cfg = dataclasses.replace(ECFG, mlp_subtiles=subtiles)
        try:
            ms = op_ms(scan12(cfg), X, n1=2, n2=6, iters=4)
            print(f"scan12 serving mlp_subtiles={subtiles}  {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"scan12 serving mlp_subtiles={subtiles}  FAILED "
                f"{type(e).__name__}: {str(e)[:90]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
