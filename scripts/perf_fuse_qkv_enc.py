"""Encoder attention fused-qkv sweep, in-context (stacked-weight scan12 at
the serving shape [256, 200, 768]).

``attn_fuse_qkv`` turns the attention kernel's three [768, 768] projection
matmuls into ONE [768, 2304] — the quantized activation is read once and
the MXU sees one wide op instead of three serial ones (the decode
mega-kernel already ships this shape).  Bit-exact, so this is purely a
scheduling measurement.  Re-checks the group optimum at the fused shape.

Usage: python scripts/perf_fuse_qkv_enc.py
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
    for fuse, group in ((False, 4), (True, 4), (True, 8), (True, 2)):
        cfg = dataclasses.replace(ECFG, attn_fuse_qkv=fuse, attn_group=group)
        label = f"fuse_qkv={fuse} group={group}"
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
