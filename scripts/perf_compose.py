"""Root-cause the encoder layer composition overhead (slope-timed, B=256).

A single serving layer (attn kernel + MLP kernel) measures ~1.5 ms more
than the sum of its kernels measured alone.  Hypotheses:
  (a) per-iteration weight slicing from the stacked [12, ...] params,
  (b) alternation between two different Mosaic kernel binaries,
  (c) something about the specific attn->mlp data hand-off.

Bodies measured (all shape-preserving, scanned under op_ms):
  attn1        one attn kernel, fixed layer-0 weights
  mlp1         one MLP kernel, fixed layer-0 weights
  attn2        two attn kernels back-to-back (same binary twice)
  attn+mlp     one full layer (alternating binaries)
  scan12-attn  lax.scan of attn over the REAL stacked 12-layer weights
  scan12-mlp   same for the MLP
  scan12-layer the real encoder body (attn+mlp over stacked weights)

Usage: python scripts/perf_compose.py
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
LP0 = jax.tree.map(lambda a: a[0], ENC["layers"])
X = jax.random.normal(
    jax.random.PRNGKey(2), (B, ECFG.seq_len, ECFG.hidden_size), jnp.bfloat16
)


def attn(x, lp=None):
    lp = lp or LP0
    return fused_attn_layer(
        x, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
        ECFG.num_heads, eps=ECFG.layer_norm_eps,
    )


def mlp(x, lp=None):
    return vit._mlp(x, lp or LP0, ECFG)


def scan12(fn):
    def body(x):
        def step(c, lp):
            return fn(c, lp), None

        y, _ = jax.lax.scan(step, x, ENC["layers"])
        return y

    return body


def report(name, body, n1=4, n2=16):
    ms = op_ms(body, X, n1=n1, n2=n2, iters=4)
    print(f"{name:22s} {ms:8.3f} ms", flush=True)


def main():
    report("attn1", attn)
    report("mlp1", mlp)
    report("attn2", lambda x: attn(attn(x)))
    report("attn+mlp", lambda x: mlp(attn(x)))
    report("scan12-attn", scan12(lambda x, lp: attn(x, lp)), n1=2, n2=6)
    report("scan12-mlp", scan12(lambda x, lp: mlp(x, lp)), n1=2, n2=6)
    report("scan12-layer", scan12(lambda x, lp: mlp(attn(x, lp), lp)), n1=2, n2=6)


if __name__ == "__main__":
    main()
