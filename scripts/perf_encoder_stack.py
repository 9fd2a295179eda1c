"""Sweep the multi-layer encoder-stack kernel (ops/encoder_stack.py) against
the round-2 serving baseline, measured the ONLY way that has proven honest:
the full 12-layer stacked-weight pass at B=256 (isolated-kernel slopes are
systematically optimistic — see docs/PERF.md composition-overhead hunt).

Compares, all with int8 W8A8 weights + sigmoid GELU:
- baseline: fused_attn_layer + fused int8 MLP under lax.scan (54.7 ms r2)
- stacked lpc ∈ {1, 2, 3, 4, 6, 12} × group ∈ {2, 4, 8}

Usage: python scripts/perf_encoder_stack.py [lpc ...]
"""

from __future__ import annotations

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
from manga_ocr_tpu.ops.encoder_stack import encoder_stack  # noqa: E402
from manga_ocr_tpu.ops.flash_attention import fused_attn_layer  # noqa: E402

B = 256
CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
PARAMS["encoder"] = _cast_quantized(
    quantize_encoder(P32["encoder"], quantize_attn_proj=True), jnp.bfloat16
)
ECFG = CFG.encoder
ENC = PARAMS["encoder"]
X = jax.random.normal(
    jax.random.PRNGKey(2), (B, ECFG.seq_len, ECFG.hidden_size), jnp.bfloat16
)


def baseline_scan12():
    def body(x):
        def step(c, lp):
            c = fused_attn_layer(
                c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                ECFG.num_heads, eps=ECFG.layer_norm_eps,
            )
            return vit._mlp(c, lp, ECFG), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def stacked(lpc, group):
    def body(x):
        return encoder_stack(
            x, ENC["layers"], ECFG.num_heads, eps=ECFG.layer_norm_eps,
            lpc=lpc, group=group, gelu_mode=ECFG.gelu_mode,
        )

    return body


def main():
    lpcs = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 6, 12]
    try:
        ms = op_ms(baseline_scan12(), X, n1=2, n2=6, iters=4)
        print(f"scan12 baseline (r2 serving)        {ms:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"scan12 baseline FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
    for lpc in lpcs:
        for group in (4,):
            label = f"stacked lpc={lpc:2d} group={group}"
            try:
                ms = op_ms(stacked(lpc, group), X, n1=2, n2=6, iters=4)
                print(f"{label:36s} {ms:8.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(
                    f"{label:36s} FAILED {type(e).__name__}: {str(e)[:120]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
