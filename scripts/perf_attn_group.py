"""Attn-layer group sweep with the raised VMEM cap, measured in the REAL
context: a 12-layer stacked-weight scan (fixed-weight single-kernel numbers
proved optimistic — see scripts/perf_compose.py findings in PERF.md).

Usage: python scripts/perf_attn_group.py
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


def scan12_layer(group, batched_sdpa=False):
    def body(x):
        def step(c, lp):
            c = fused_attn_layer(
                c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                ECFG.num_heads, eps=ECFG.layer_norm_eps, group=group,
                batched_sdpa=batched_sdpa,
            )
            return vit._mlp(c, lp, ECFG), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def scan12_mixed(attn_mode, mlp_mode):
    """Decompose in-context costs: each half of the layer runs either the
    Pallas serving kernel or the XLA reference math."""
    import dataclasses

    xcfg = dataclasses.replace(ECFG, attn_kernel="xla", mlp_kernel="xla")

    def body(x):
        def step(c, lp):
            if attn_mode == "pallas":
                c = fused_attn_layer(
                    c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                    ECFG.num_heads, eps=ECFG.layer_norm_eps,
                )
            else:
                from manga_ocr_tpu.ops.common import layer_norm, mha

                h = layer_norm(
                    c, lp["ln1"]["scale"], lp["ln1"]["bias"], ECFG.layer_norm_eps
                )
                c = c + mha(h, h, lp["attn"], ECFG.num_heads)
            cfg = ECFG if mlp_mode == "pallas" else xcfg
            return vit._mlp(c, lp, cfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def main():
    for g, bsd in ((4, False), (4, True), (8, True)):
        label = f"group={g} sdpa={'batched' if bsd else 'loop'}"
        try:
            ms = op_ms(scan12_layer(g, bsd), X, n1=2, n2=6, iters=4)
            print(f"scan12 attn {label:24s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"scan12 attn {label:24s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
    for am, mm in (("pallas", "pallas"), ("pallas", "xla"), ("xla", "pallas"),
                   ("xla", "xla")):
        label = f"attn={am} mlp={mm}"
        try:
            ms = op_ms(scan12_mixed(am, mm), X, n1=2, n2=6, iters=4)
            print(f"scan12 mixed {label:22s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"scan12 mixed {label:22s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
