"""Tile/group parameter sweep for the encoder serving kernels (slope-timed).

With the scoped-VMEM cap raised (CompilerParams), bigger blocks = fewer
grid programs; this sweeps attn-layer group, MLP tile_m, and merged-layer
group to find the per-layer optimum.

Usage: python scripts/perf_kernel_tune.py
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
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402
from manga_ocr_tpu.ops.flash_attention import fused_attn_layer, fused_encoder_layer  # noqa: E402
from manga_ocr_tpu.ops.fused_mlp import fused_mlp_block  # noqa: E402

B = 256
CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
PARAMS["encoder"] = _cast_quantized(
    quantize_encoder(P32["encoder"], quantize_attn_proj=True), jnp.bfloat16
)
ECFG = CFG.encoder
LP0 = jax.tree.map(lambda a: a[0], PARAMS["encoder"]["layers"])
X = jax.random.normal(
    jax.random.PRNGKey(2), (B, ECFG.seq_len, ECFG.hidden_size), jnp.bfloat16
)


def report(name, body):
    try:
        ms = op_ms(body, X, n1=4, n2=16, iters=4)
        print(f"{name:42s} {ms:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


def main():
    for g in (2, 4, 8):
        report(
            f"attn layer group={g}",
            lambda x, g=g: fused_attn_layer(
                x, LP0["attn"], LP0["ln1"]["scale"], LP0["ln1"]["bias"],
                ECFG.num_heads, eps=ECFG.layer_norm_eps, group=g,
            ),
        )
    fc1, fc2 = LP0["mlp"]["fc1"], LP0["mlp"]["fc2"]
    w1 = (fc1["w_q"], fc1["scale"])
    w2 = (fc2["w_q"], fc2["scale"])
    for tile in (512, 1024, 2048):
        report(
            f"mlp tile_m={tile}",
            lambda x, t=tile: fused_mlp_block(
                x, LP0["ln2"]["scale"], LP0["ln2"]["bias"],
                w1, fc1["bias"], w2, fc2["bias"],
                eps=ECFG.layer_norm_eps, tile_m=t,
            ),
        )
    report(
        "mlp gelu=sigmoid tile=512",
        lambda x: fused_mlp_block(
            x, LP0["ln2"]["scale"], LP0["ln2"]["bias"],
            w1, fc1["bias"], w2, fc2["bias"],
            eps=ECFG.layer_norm_eps, gelu_mode="sigmoid",
        ),
    )
    for g in (2, 4, 8):
        report(
            f"merged layer group={g}",
            lambda x, g=g: fused_encoder_layer(
                x, LP0, ECFG.num_heads, eps=ECFG.layer_norm_eps, group=g
            ),
        )


if __name__ == "__main__":
    main()
