"""Profiler-trace attribution of one full ocr_forward dispatch (serving
config, B=256): every XLA op's on-device time, aggregated.  Supersedes
slope-probe stage guessing — the axon runtime supports jax.profiler.

Usage: python scripts/perf_trace_full.py [outdir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402

B = 256
MAX_NEW = 32


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_full"
    cfg = MangaOCRConfig.serving()
    p32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(p32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(p32["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    fn = mdl.make_jitted_ocr(cfg, max_length=MAX_NEW, chunk_size=MAX_NEW)
    px = jax.jit(lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    out = fn(params, px)
    np.asarray(out.lengths)  # warm
    jax.profiler.start_trace(outdir)
    out = fn(params, px)
    np.asarray(out.lengths)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3]
    agg = collections.defaultdict(lambda: [0.0, 0])
    for e in ev:
        a = agg[e["name"]]
        a[0] += e["dur"]
        a[1] += 1
    total = sum(d for d, _ in agg.values())
    print(f"device ops total {total / 1e3:.3f} ms over {len(ev)} events")
    for name, (d, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"{d / 1e3:9.3f} ms  x{c:4d}  {name[:84]}", flush=True)


if __name__ == "__main__":
    main()
