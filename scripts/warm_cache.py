"""Warm the persistent XLA cache for serving + bench (compile discipline).

Warms the serving engine's FULL reachable shape set (every bucket x batch —
see ``TpuMangaOcrEngine.warm_set``) plus the bench graphs, so production
processes start with zero cold compiles.  With the persistent cache this is
one-time per model revision; re-runs hit the cache and finish fast.

    python scripts/warm_cache.py             # warm everything
    python scripts/warm_cache.py --verify    # assert warm start (cache hits)
    python scripts/warm_cache.py --quick     # representative subset only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.tokenizer import CharTokenizer
import bench

# A warm-start (persisted-cache hit) executes in under this bound; a cold
# compile of the full model takes minutes through the remote compile service.
VERIFY_BUDGET_S = 30.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--verify", action="store_true", help="assert cache hits")
    p.add_argument("--quick", action="store_true", help="representative subset")
    p.add_argument(
        "--max-length",
        type=int,
        default=300,
        help="must match the serving engine's max_length (cli/serve default "
        "300) — each bucket program closes over it, so warming a different "
        "value compiles programs production never dispatches",
    )
    args = p.parse_args()

    t0 = time.time()
    params = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    engine = TpuMangaOcrEngine(
        params,
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=args.max_length,
    )
    engine.warmup(full=not args.quick)
    t_engine = time.time() - t0
    print(f"engine warm set ({len(engine._warmed)} shapes) in {t_engine:.1f}s", flush=True)

    # bench graphs (must mirror bench.py's jit arguments exactly)
    from manga_ocr_tpu.models.quantize import quantize_encoder
    from manga_ocr_tpu.engine.engine import _cast_quantized

    cfg = MangaOCRConfig.serving()
    bparams = mdl.cast_params(params, jnp.bfloat16)
    bparams["encoder"] = _cast_quantized(
        quantize_encoder(params["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    fn = mdl.make_jitted_ocr(
        cfg, max_length=bench.MAX_NEW_TOKENS, chunk_size=bench.MAX_NEW_TOKENS
    )
    t_b = {}
    for b in bench.BATCH_SIZES:
        px = jax.jit(
            lambda k, bb=b: jax.random.normal(k, (bb, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        t1 = time.time()
        np.asarray(fn(bparams, px).lengths)
        t_b[b] = time.time() - t1
        print(f"warmed bench B={b} in {t_b[b]:.1f}s", flush=True)

    if args.verify:
        slow = {b: t for b, t in t_b.items() if t > VERIFY_BUDGET_S}
        if t_engine > VERIFY_BUDGET_S * 4 or slow:
            print(
                f"VERIFY FAILED: cold compiles detected (engine {t_engine:.0f}s, "
                f"bench {slow}) — cache misses across restart",
                file=sys.stderr,
            )
            return 1
        print("VERIFY OK: persisted-cache hits across process restart")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
