"""Slope-timed encoder stage costs at B=256 (serving config, real chip).

Every number here is a slope between two in-dispatch repeat counts
(perf_util.op_ms style), so the axon tunnel's ~30 ms fixed dispatch cost
cancels.  Ops whose output shape differs from their input are scanned via
a tiny numerical feedback (x + mean(f(x)) * 1e-30) that prevents DCE
without perturbing values.

Usage: python scripts/perf_encoder_slope.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms  # noqa: E402

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402
from manga_ocr_tpu.ops.common import layer_norm  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

CFG = MangaOCRConfig.serving()
P32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
PARAMS = mdl.cast_params(P32, jnp.bfloat16)
PARAMS["encoder"] = _cast_quantized(
    quantize_encoder(P32["encoder"], quantize_attn_proj=True), jnp.bfloat16
)
ENC = PARAMS["encoder"]
ECFG, DCFG = CFG.encoder, CFG.decoder

PX = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)
X_SEQ = jax.random.normal(
    jax.random.PRNGKey(2), (B, ECFG.seq_len, ECFG.hidden_size), jnp.bfloat16
)
LP0 = jax.tree.map(lambda a: a[0], ENC["layers"])


def feedback(f):
    """Wrap out-of-shape op f into a shape-preserving body for scanning."""

    def body(x):
        out = f(x)
        leaf = jax.tree.leaves(out)[0]
        return x + (jnp.mean(leaf.astype(jnp.float32)) * 1e-30).astype(x.dtype)

    return body


def report(name, body, x, n1=4, n2=16):
    ms = op_ms(body, x, n1=n1, n2=n2, iters=4)
    print(f"{name:40s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    # whole encoder
    report(
        "encoder total",
        feedback(lambda px: vit.encode(ENC, px, ECFG)),
        PX,
        n1=2,
        n2=6,
    )
    report(
        "encoder total (unrolled layers)",
        feedback(lambda px: vit.encode(ENC, px, ECFG, unroll_layers=True)),
        PX,
        n1=2,
        n2=6,
    )
    # patch-embed variants
    report("patch-embed v0 (6D transpose)", feedback(lambda px: vit.patch_embed(ENC["patch_embed"], px, ECFG)), PX)

    def pe_merged(px):
        b, h, w, c = px.shape
        p = ECFG.patch_size
        gh, gw = h // p, w // p
        x = px.reshape(b, gh, p, gw, p * c)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, gh * gw, p * p * c)
        k = ENC["patch_embed"]["kernel"].reshape(p * p * c, ECFG.hidden_size)
        from manga_ocr_tpu.ops.common import dense

        return dense(x, k, ENC["patch_embed"]["bias"])

    report("patch-embed v1 (merged minor)", feedback(pe_merged), PX)

    def pe_einsum(px):
        b, h, w, c = px.shape
        p = ECFG.patch_size
        gh, gw = h // p, w // p
        x = px.reshape(b, gh, p, gw, p * c)
        k = ENC["patch_embed"]["kernel"].reshape(p, p * c, ECFG.hidden_size).astype(px.dtype)
        y = jnp.einsum("birjx,rxd->bijd", x, k, preferred_element_type=jnp.float32)
        return (
            y.reshape(b, gh * gw, ECFG.hidden_size)
            + ENC["patch_embed"]["bias"].astype(jnp.float32)
        ).astype(px.dtype)

    report("patch-embed v2 (einsum)", feedback(pe_einsum), PX)

    # one serving encoder layer (fused attn layer + fused int8 MLP)
    report(
        "1 layer (serving kernels)",
        lambda x: vit.encoder_block(x, LP0, ECFG),
        X_SEQ,
    )
    # pieces
    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    report(
        "  fused attn layer",
        lambda x: fused_attn_layer(
            x, LP0["attn"], LP0["ln1"]["scale"], LP0["ln1"]["bias"],
            ECFG.num_heads, eps=ECFG.layer_norm_eps,
        ),
        X_SEQ,
    )
    report("  fused int8 MLP", lambda x: vit._mlp(x, LP0, ECFG), X_SEQ)
    # merged whole-block kernel
    import dataclasses

    mcfg = dataclasses.replace(ECFG, attn_kernel="merged_layer")
    report(
        "1 layer (merged attn+MLP kernel)",
        lambda x: vit.encoder_block(x, LP0, mcfg),
        X_SEQ,
    )
    report(
        "encoder total (merged layers)",
        feedback(lambda px: vit.encode(ENC, px, mcfg)),
        PX,
        n1=2,
        n2=6,
    )
    # final LN
    report(
        "final LN",
        lambda x: layer_norm(
            x, ENC["final_ln"]["scale"], ENC["final_ln"]["bias"], ECFG.layer_norm_eps
        ),
        X_SEQ,
    )
    # cross-KV precompute
    report(
        "cross-KV precompute (int8)",
        feedback(lambda e: dec.precompute_cross_kv(PARAMS["decoder"], e, DCFG)),
        X_SEQ,
        n1=2,
        n2=8,
    )


if __name__ == "__main__":
    main()
