"""Round-3 probe: (a) full error capture for attn group=8/16/32, (b) a
jax.profiler trace of the scan12 dispatch (does tracing work over axon?),
(c) encoder + ocr_forward stage-sum attribution (VERDICT r2 #9).

Usage: python scripts/perf_r3_probe.py [group|trace|stages|all]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms, time_fn  # noqa: E402

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models import decoder as dec  # noqa: E402
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
PIX = jax.random.normal(
    jax.random.PRNGKey(3), (B, ECFG.image_size, ECFG.image_size, 3), jnp.bfloat16
)


def scan12(group):
    def body(x):
        def step(c, lp):
            c = fused_attn_layer(
                c, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
                ECFG.num_heads, eps=ECFG.layer_norm_eps, group=group,
            )
            return vit._mlp(c, lp, ECFG), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def probe_groups():
    for g in (8, 16, 32):
        print(f"=== attn group={g} ===", flush=True)
        try:
            ms = op_ms(scan12(g), X, n1=2, n2=6, iters=3)
            print(f"scan12 group={g}: {ms:.3f} ms", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"group={g} FAILED (full traceback above)", flush=True)


def probe_trace():
    fn = jax.jit(scan12(4))
    out = fn(X)
    jnp.asarray(out[:1, :1]).block_until_ready()
    import numpy as np

    np.asarray(out[:1, :1, :1])
    logdir = "/tmp/jax_trace_scan12"
    try:
        jax.profiler.start_trace(logdir)
        o = fn(X)
        np.asarray(o[:1, :1, :1])
        jax.profiler.stop_trace()
        print("trace captured to", logdir, flush=True)
        for root, _, files in os.walk(logdir):
            for f in files:
                p = os.path.join(root, f)
                print("  ", p, os.path.getsize(p), flush=True)
    except Exception:
        traceback.print_exc()
        print("trace FAILED", flush=True)


def probe_stages():
    # encoder internal attribution
    enc_ms = op_ms(lambda x: vit.encode(ENC, PIX, ECFG) + 0.0 * x[:1, :1, :1].sum(),
                   X, n1=1, n2=3, iters=3)
    scan_ms = op_ms(scan12(4), X, n1=2, n2=6, iters=4)
    print(f"vit.encode total       {enc_ms:8.3f} ms", flush=True)
    print(f"scan12 (layers only)   {scan_ms:8.3f} ms", flush=True)

    # ocr_forward attribution (serving config: fused_loop decode)
    dcfg = CFG.decoder

    def f_encode(x):
        return mdl.encode(PARAMS, PIX, CFG) + 0.0 * x[:1, :1, :1].sum()

    def f_crosskv(x):
        ck = dec.precompute_cross_kv_packed(PARAMS["decoder"], x, dcfg, int8=False)
        leaves = jax.tree.leaves(ck)
        return x + sum(l[:1, :1, :1].astype(x.dtype).sum() for l in leaves if l.ndim >= 3) * 0.0

    def f_greedy(x):
        r = mdl.greedy_decode(PARAMS, x, CFG, max_length=32)
        return x + r.lengths[:1].astype(x.dtype).sum() * 0.0

    def f_full(x):
        r = mdl.ocr_forward(PARAMS, PIX, CFG, max_length=32)
        return x + r.lengths[:1].astype(x.dtype).sum() * 0.0

    for name, f, (n1, n2) in (
        ("encode", f_encode, (1, 3)),
        ("cross-kv packed bf16", f_crosskv, (2, 8)),
        ("greedy_decode(32) [ckv+loop]", f_greedy, (1, 3)),
        ("ocr_forward(32) full", f_full, (1, 3)),
    ):
        ms = op_ms(f, X, n1=n1, n2=n2, iters=3)
        print(f"{name:30s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("group", "all"):
        probe_groups()
    if which in ("trace", "all"):
        probe_trace()
    if which in ("stages", "all"):
        probe_stages()
