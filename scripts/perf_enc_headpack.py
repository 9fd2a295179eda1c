"""Encoder SDPA head-pack probe, in-context (VERDICT r5 #2(i)).

``attn_sdpa_headpack`` packs two adjacent dh=64 heads into ONE full-depth
K=128 contraction via block-diagonal K/V assembly (the decoder
segment-matrix trick applied to the encoder's 197-token self-attention):

    [Q_h1 | Q_h2] @ [[K_h1, 0], [0, K_h2]]^T = [scores_h1 | scores_h2]

Halves the SDPA op count (6 matmuls/batch-row instead of 12) and fills
the MXU K depth.  The tile model says the systolic pass count is
UNCHANGED (the K=64 waste moves into zero blocks along N:
2 x [200,64]x[64,200] and 1 x [200,128]x[128,400] both cost 8 passes of
a 128x128 MXU), so any win must come from op-count/pipelining and any
loss from the VPU assembly of the block-diagonal operands.  This probe
settles it with in-context numbers at the serving shape [256, 200, 768],
alongside the serving default and the previously rejected variants.

Usage: python scripts/perf_enc_headpack.py
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
    variants = (
        ("serving default (per-head loop)", {}),
        ("headpack", {"attn_sdpa_headpack": True}),
        ("headpack group=2", {"attn_sdpa_headpack": True, "attn_group": 2}),
        ("headpack group=8", {"attn_sdpa_headpack": True, "attn_group": 8}),
        ("headpack + fuse_qkv", {"attn_sdpa_headpack": True, "attn_fuse_qkv": True}),
    )
    for label, kw in variants:
        cfg = dataclasses.replace(ECFG, **kw)
        try:
            ms = op_ms(scan12(cfg), X, n1=2, n2=6, iters=4)
            print(f"scan12 serving {label:34s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"scan12 serving {label:34s} FAILED "
                f"{type(e).__name__}: {str(e)[:90]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
