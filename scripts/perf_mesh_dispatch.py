"""Measured per-dispatch overhead of the SHARDED serving program at
mesh=1 on the real chip (VERDICT r4 #7).

The multi-chip throughput projection (docs/PERF.md weak-scaling table,
~32k crops/s at 8xv5e) was built from CPU dryruns; its missing constant
is what the mesh machinery itself costs per dispatch on the real
runtime.  A 1-device mesh is the degenerate case every one of those
projections passes through: same jit-under-Mesh path, same
NamedSharding-constrained batch, same replicated params — zero ICI
traffic.  Measuring it against the unsharded program isolates the
sharding-layer overhead (GSPMD partitioning pass + sharded-array
plumbing) from the collective costs (which the decode path does not
have: batch-dim data parallelism inserts NO collectives — every
per-token op is row-local, verified by the dryrun shardings).

Usage: python scripts/perf_mesh_dispatch.py
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

from manga_ocr_tpu.engine.engine import _cast_quantized  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.quantize import quantize_encoder  # noqa: E402
from manga_ocr_tpu.parallel import mesh as meshlib  # noqa: E402

B = 256
MAX_NEW = 32


def rate(fn, params, px, iters=16) -> float:
    np.asarray(fn(params, px).lengths)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, px) for _ in range(iters)]
        for o in outs:
            np.asarray(o.lengths)
        best = min(best, (time.perf_counter() - t0) / iters)
    return B / best


def main():
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)
    cfg = MangaOCRConfig.serving()
    p32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(p32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(p32["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    px = jax.jit(
        lambda k: jax.random.normal(k, (B, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    # 1) unsharded single-chip program (the bench headline path; fast
    # rung so the probe never risks a 19-min mega-kernel compile)
    import dataclasses

    fast = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, step_kernel="xla", head_phased=False),
    )
    fn = mdl.make_jitted_ocr(fast, max_length=MAX_NEW, chunk_size=MAX_NEW)
    r0 = rate(fn, params, px)
    print(f"unsharded           : {r0:8.1f} crops/s", flush=True)

    # 2) the same program jitted over a 1-device (data=1, model=1) mesh
    # with the engine's data-parallel serving shardings
    mesh = meshlib.make_mesh(1, 1)
    params_r = meshlib.dp_replicate(params, mesh)
    px_s = jax.device_put(px, meshlib.batch_sharding(mesh))
    with mesh:
        fn_m = mdl.make_jitted_ocr(fast, max_length=MAX_NEW, chunk_size=MAX_NEW)
        r1 = rate(fn_m, params_r, px_s)
    print(f"mesh=1 data-sharded : {r1:8.1f} crops/s", flush=True)
    ms0, ms1 = B / r0 * 1000, B / r1 * 1000
    print(
        f"per-dispatch overhead of the sharding layer: "
        f"{ms1 - ms0:+.2f} ms ({ms0:.2f} -> {ms1:.2f} ms/dispatch)",
        flush=True,
    )


if __name__ == "__main__":
    main()
