"""Pre-compile the bench/serving graphs into the persistent XLA cache.

Run once after model-code changes so that `bench.py` (and the driver's
compile checks) start warm:  python scripts/warm_cache.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
import bench


def main() -> None:
    cfg = MangaOCRConfig.base()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # Must mirror bench.py's jit arguments exactly or the cache misses.
    fn = mdl.make_jitted_ocr(
        cfg, max_length=bench.MAX_NEW_TOKENS, chunk_size=bench.MAX_NEW_TOKENS
    )
    for b in bench.BATCH_SIZES:
        px = jax.jit(
            lambda k, bb=b: jax.random.normal(k, (bb, 224, 224, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        t0 = time.time()
        np.asarray(fn(params, px).lengths)
        print(f"warmed B={b} in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
