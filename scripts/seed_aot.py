"""Seed the AOT executable store with every bench/serving program.

One process, sequential (the chip is single-tenant): rung-1 and rung-2
bench programs at both batch sizes, the budget-300 realistic program, and
the serving engine's bench-path program.  Each lands in
``~/.cache/manga_ocr_tpu/aot`` via ``utils/aot_store`` — after this, a
default-budget ``python bench.py`` completes every phase from the store
(no multi-minute Mosaic compiles).

Run: python scripts/seed_aot.py   (wall: minutes when the XLA cache
hits, up to ~1 h when every mega-kernel compiles cold)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu import benchmark as bm  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.utils import aot_store  # noqa: E402


def say(msg: str) -> None:
    print(f"[seed t={time.time() - T0:.0f}s] {msg}", flush=True)


T0 = time.time()


def main() -> None:
    params = bm._serving_params()
    say("params ready")
    serving = MangaOCRConfig.serving()
    fast = dataclasses.replace(
        serving,
        decoder=dataclasses.replace(
            serving.decoder, step_kernel="xla", head_phased=False
        ),
    )
    fast_fn = mdl.make_jitted_ocr(fast, max_length=bm.MAX_NEW_TOKENS,
                                  chunk_size=bm.MAX_NEW_TOKENS)
    serving_fn = mdl.make_jitted_ocr(serving, max_length=bm.MAX_NEW_TOKENS,
                                     chunk_size=bm.MAX_NEW_TOKENS)
    for tag, fn in (("fast", fast_fn), ("serving", serving_fn)):
        for b in bm.BATCH_SIZES:
            px = jax.jit(
                lambda k, _b=b: jax.random.normal(k, (_b, 224, 224, 3), jnp.bfloat16)
            )(jax.random.PRNGKey(1))
            exe = aot_store.load_or_compile(
                fn, (params, px), f"bench-{tag}-b{b}", note=say
            )
            np.asarray(exe(params, px).lengths)  # force execution
            say(f"bench-{tag}-b{b} ready")

    # budget-300 realistic program (bench phase C)
    b = bm.BATCH_SIZES[0]
    stops = jnp.asarray(bm.committed_lengths(b))

    @jax.jit
    def b300(p, x):
        enc = mdl.encode(p, x, serving)
        return mdl.greedy_decode(p, enc, serving, max_length=300, stop_lengths=stops)

    px = jax.jit(
        lambda k: jax.random.normal(k, (b, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    exe = aot_store.load_or_compile(b300, (params, px), f"bench-budget300-b{b}", note=say)
    np.asarray(exe(params, px).lengths)
    say("bench-budget300 ready")

    # serving engine program at the bench full-path shape (phase B):
    # the same synthetic crops bench_full_path uses -> bucket (128, 128),
    # padded batch 256
    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    engine = TpuMangaOcrEngine(
        mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0)),
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=bm.MAX_NEW_TOKENS,
        dtype=jnp.bfloat16,
        aot=True,
    )
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
        .astype(np.uint8)
        for _ in range(bm.BATCH_SIZES[0])
    ]
    engine.ocr_page(crops)
    say("engine serving program ready")
    say("ALL SEEDED")


if __name__ == "__main__":
    main()
