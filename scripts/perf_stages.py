"""Stage-level breakdown of the serving OCR dispatch at B=256.

Times each pipeline stage as a separately jitted function, *pipelined*
(several calls in flight, host readback at the end) exactly like
``bench.py`` — so the per-stage numbers decompose the same throughput the
headline measures, with the axon tunnel's fixed dispatch cost hidden by
pipelining rather than subtracted.

Usage: python scripts/perf_stages.py [batch]
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

from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402
from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MAX_NEW = 32


def _force(out):
    """Force completion with a TINY host readback: fetching a full [B,S,D]
    output through the axon tunnel costs seconds and poisons the timing."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:8])


def timed(fn, args, iters=8, label=""):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        _force(o)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
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

    ecfg, dcfg = cfg.encoder, cfg.decoder

    # -- full e2e ------------------------------------------------------------
    fn_e2e = mdl.make_jitted_ocr(cfg, max_length=MAX_NEW, chunk_size=MAX_NEW)
    t_e2e = timed(lambda p, x: fn_e2e(p, x).lengths, (params, px), label="e2e (enc+decode32)")

    # -- encoder total ---------------------------------------------------------
    fn_enc = jax.jit(lambda p, x: vit.encode(p["encoder"], x, ecfg))
    t_enc = timed(fn_enc, (params, px), label="encoder total")

    # -- encoder pieces --------------------------------------------------------
    def embed_only(p, x):
        e = p["encoder"]
        h = vit.patch_embed(e["patch_embed"], x, ecfg)
        cls = jnp.broadcast_to(e["cls_token"].astype(h.dtype), (B, 1, ecfg.hidden_size))
        h = jnp.concatenate([cls, h], axis=1)
        return h + e["pos_embed"].astype(h.dtype)

    t_embed = timed(jax.jit(embed_only), (params, px), label="  patch-embed + cls + pos")

    x_seq = jax.jit(embed_only)(params, px)

    def scan_only(p, h):
        e = p["encoder"]

        def body(carry, lp):
            return vit.encoder_block(carry, lp, ecfg), None

        h, _ = jax.lax.scan(body, h, e["layers"])
        return h

    t_scan = timed(jax.jit(scan_only), (params, x_seq), label="  12-layer scan")

    def final_ln(p, h):
        e = p["encoder"]
        from manga_ocr_tpu.ops.common import layer_norm

        return layer_norm(h, e["final_ln"]["scale"], e["final_ln"]["bias"], ecfg.layer_norm_eps)

    t_ln = timed(jax.jit(final_ln), (params, x_seq), label="  final LN")

    # -- decode pieces ---------------------------------------------------------
    enc_out = fn_enc(params, px)

    t_ckv = timed(
        jax.jit(lambda p, e: dec.precompute_cross_kv(p["decoder"], e, dcfg)),
        (params, enc_out),
        label="cross-KV precompute",
    )

    fn_dec = jax.jit(
        lambda p, e: mdl.greedy_decode(p, e, cfg, max_length=MAX_NEW, chunk_size=MAX_NEW).lengths
    )
    t_dec = timed(fn_dec, (params, enc_out), label="decode (32 steps incl cross-KV)")

    print("-" * 58)
    print(
        f"sum(enc + dec) = {t_enc + t_dec:.2f} vs e2e {t_e2e:.2f};  "
        f"enc pieces sum {t_embed + t_scan + t_ln:.2f}"
    )
    print(f"throughput: {B / t_e2e * 1e3:.0f} crops/s (single-stream pipelined)")


if __name__ == "__main__":
    main()
