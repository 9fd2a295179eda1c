"""Measure the fused whole-layer decode-step kernel vs the XLA step on TPU.

Full-size model, B=256, 32-token budget, serving config (int8 encoder,
int8 cross-KV).  Usage: python scripts/perf_decode_fused.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

import dataclasses  # noqa: E402

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_decoder, quantize_encoder  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MAX_NEW = 32


def timed(fn, args, iters=8, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:8.2f} ms   ({B / ms * 1e3:6.0f} crops/s)", flush=True)
    return ms


def main():
    cfg = MangaOCRConfig.serving()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(params_f32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True),
        jnp.bfloat16,
    )
    px = jax.jit(lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    enc_out = jax.jit(lambda p, x: mdl.encode(p, x, cfg))(params, px)

    # decode only, XLA step
    fn_x = jax.jit(
        lambda p, e: mdl.greedy_decode(
            p, e, cfg, max_length=MAX_NEW, chunk_size=MAX_NEW
        ).lengths
    )
    timed(fn_x, (params, enc_out), label="decode32 XLA step")

    # decode only, fused whole-layer step (int8 decoder)
    qparams = dict(params)
    qparams["decoder"] = _cast_quantized(
        quantize_decoder(params_f32["decoder"]), jnp.bfloat16
    )
    fcfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_layer"),
    )
    fn_f = jax.jit(
        lambda p, e: mdl.greedy_decode(
            p, e, fcfg, max_length=MAX_NEW, chunk_size=MAX_NEW
        ).lengths
    )
    timed(fn_f, (qparams, enc_out), label="decode32 fused-layer step")

    # + fused greedy head
    hcfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, step_kernel="fused_layer", head_kernel="fused"
        ),
    )
    fn_h = jax.jit(
        lambda p, e: mdl.greedy_decode(
            p, e, hcfg, max_length=MAX_NEW, chunk_size=MAX_NEW
        ).lengths
    )
    timed(fn_h, (qparams, enc_out), label="decode32 fused layer+head")

    # fused head alone on the XLA step
    hxcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, head_kernel="fused")
    )
    fn_hx = jax.jit(
        lambda p, e: mdl.greedy_decode(
            p, e, hxcfg, max_length=MAX_NEW, chunk_size=MAX_NEW
        ).lengths
    )
    timed(fn_hx, (params, enc_out), label="decode32 XLA step + fused head")

    # e2e with fused decode
    fn_e2e = jax.jit(
        lambda p, x: mdl.ocr_forward(
            p, x, hcfg, max_length=MAX_NEW, chunk_size=MAX_NEW
        ).lengths
    )
    timed(fn_e2e, (qparams, px), label="e2e enc + fused decode32")


if __name__ == "__main__":
    main()
