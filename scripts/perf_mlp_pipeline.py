"""MLP software-pipeline sweep: tile_m x subtiles, measured in-context
(stacked-weight 12-layer scan at the padded serving shape [256, 200, 768]).

The int8 MLP kernel's per-tile chain (LN -> quant -> mm1 -> dequant ->
GELU -> requant -> mm2 -> dequant -> residual) is fully dependent: the
~10 us VPU epilogue over the [tile, 3072] f32 intermediate serializes
behind its own MXU matmuls, and grid programs don't interleave compute.
The round-3 subtile sweep split the 512-row tile into 256/128-row chains
and lost to matmul-shrink (37.8 -> 38.4/40.2).  The untried shape:
DOUBLE the tile and split into full-size 512-row chains —
(tile_m=1024, subtiles=2) keeps every matmul at the winning [512, *]
size while giving Mosaic two independent chains per program to overlap
(chain A's VPU epilogue under chain B's MXU work).

Usage: python scripts/perf_mlp_pipeline.py
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
    for tile, sub in ((512, 1), (1024, 2), (1024, 1), (2048, 4), (2048, 2)):
        cfg = dataclasses.replace(ECFG, mlp_tile_m=tile, mlp_subtiles=sub)
        label = f"tile_m={tile} subtiles={sub}"
        try:
            ms = op_ms(scan12(cfg), X, n1=2, n2=6, iters=4)
            print(f"scan12 serving {label:26s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"scan12 serving {label:26s} FAILED "
                f"{type(e).__name__}: {str(e)[:90]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
