"""Second-order sweep on the seq-pad win: pad length x attn group.

perf_r3_pad.py (chained, honest): pad 197->200 took the 12-layer stack
54.7 -> 37.0 ms.  200 is sublane-(8-)aligned but NOT 16-aligned; bf16
tiles pack (2,1) into (8,128) -> effective (16,128) on the
second-minor dim, so 208 may remove another relayout class.  The attn
group sweep also predates the alignment change (group=4 won at s=197)
— re-check 8 at the aligned shape.

Usage: python scripts/perf_r3_pad2.py
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
from manga_ocr_tpu.ops.flash_attention import fused_attn_layer  # noqa: E402

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
S_TRUE = CFG.encoder.seq_len


def stack(pad_to: int, group: int):
    ecfg = dataclasses.replace(CFG.encoder, seq_pad_to=pad_to)

    def body(x):
        if pad_to > S_TRUE:
            x = jnp.pad(x, ((0, 0), (0, pad_to - S_TRUE), (0, 0)))

        def step(c, lp):
            c = fused_attn_layer(
                c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                ecfg.num_heads, eps=ecfg.layer_norm_eps, group=group,
                valid_len=S_TRUE,
            )
            return vit._mlp(c, lp, ecfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y[:, :S_TRUE] if pad_to > S_TRUE else y

    return body


def main():
    for pad, group in (
        (200, 4),  # current serving default (37.0 ms reference)
        (208, 4),
        (200, 8),
        (208, 8),
        (256, 4),
    ):
        try:
            ms = op_ms(stack(pad, group), X, n1=2, n2=6, iters=4)
            print(f"pad={pad} group={group}  {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pad={pad} group={group}  FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
