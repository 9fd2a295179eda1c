"""A/B the 'parallel' grid dimension_semantics hint on the serving encoder
kernels, measured in-context (stacked-weight 12-layer scan).

Usage: python scripts/perf_r3_sched.py
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


def scan12(ecfg):
    def body(x):
        def step(c, lp):
            return vit.encoder_block(c, lp, ecfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def scan12_sdpa(mode):
    """Layer scan with an explicit SDPA emission mode on the attn kernel."""
    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    ecfg = CFG.encoder

    def body(x):
        def step(c, lp):
            c = fused_attn_layer(
                c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                ecfg.num_heads, eps=ecfg.layer_norm_eps, batched_sdpa=mode,
            )
            return vit._mlp(c, lp, ecfg), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


PIX = jax.random.normal(
    jax.random.PRNGKey(3),
    (B, CFG.encoder.image_size, CFG.encoder.image_size, 3),
    jnp.bfloat16,
)


def encoder_total(ecfg):
    def body(x):
        y = vit.encode(ENC, PIX, ecfg)
        return x + y[:1, :1, :1].sum() * 0.0

    return body


def main():
    base = CFG.encoder  # serving: seq_pad_to=200
    unpadded = dataclasses.replace(base, seq_pad_to=0)
    for label, ecfg in (
        ("arbitrary (baseline)", unpadded),
        ("parallel", dataclasses.replace(unpadded, parallel_grid=True)),
    ):
        ms = op_ms(scan12(ecfg), X, n1=2, n2=6, iters=4)
        print(f"scan12 {label:22s} {ms:8.3f} ms", flush=True)
    for label, ecfg in (
        ("encode seq=197", unpadded),
        ("encode seq_pad=200", base),
        ("encode pad+parallel", dataclasses.replace(base, parallel_grid=True)),
    ):
        ms = op_ms(encoder_total(ecfg), X, n1=1, n2=3, iters=4)
        print(f"{label:22s} {ms:8.3f} ms", flush=True)
    for mode in ("phased",):
        ms = op_ms(scan12_sdpa(mode), X, n1=2, n2=6, iters=4)
        print(f"scan12 sdpa={mode:14s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
