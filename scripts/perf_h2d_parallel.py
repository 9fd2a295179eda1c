"""Probe: can concurrent host->device transfers beat one serialized put?

The streamed serving loop is host->device-wire-bound through the axon
tunnel (docs/PERF.md: 95.6 ms/page ≈ the wire time of a 4.2 MB gray page
at ~45 MB/s + RTT).  If the tunnel parallelizes independent device_put
RPCs (separate streams), splitting each page's batch into K chunks and
shipping them from K threads would hide RTT and possibly multiply
effective bandwidth — the "pinned/parallel host buffers" attack
(VERDICT r3 #3).

Measures: one 4 MB uint8 put vs the same bytes as K concurrent puts
(K = 2, 4, 8), each repeated; completion forced by a device sum readback
(block_until_ready does not block through the tunnel).

Run: python scripts/perf_h2d_parallel.py
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

MB = 1 << 20
TOTAL = 4 * MB
ROUNDS = 6


def _force(*devs):
    """Force completion of transfers: tiny device reduce + host readback."""
    s = sum(jnp.sum(d[:64].astype(jnp.int32)) for d in devs)
    return int(np.asarray(s))


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, size=(TOTAL,), dtype=np.uint8)

    # warm the force-readback program
    _force(jax.device_put(host[:1024]))

    for k in (1, 2, 4, 8):
        chunks = np.array_split(host, k)
        pool = cf.ThreadPoolExecutor(max_workers=k) if k > 1 else None
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            if k == 1:
                devs = [jax.device_put(chunks[0])]
            else:
                devs = list(pool.map(jax.device_put, chunks))
            _force(*devs)
            best = min(best, time.perf_counter() - t0)
        if pool:
            pool.shutdown()
        rate = TOTAL / best / MB
        print(f"k={k}: best {best * 1000:.1f} ms  ({rate:.1f} MB/s)", flush=True)

    # Also probe overlap of transfer with an independent running dispatch
    # (does a concurrent put degrade compute, or ride along free?)
    w = jax.device_put(
        rng.standard_normal((2048, 2048)).astype(np.float32)
    )
    mm = jax.jit(lambda a: a @ a)
    _ = np.asarray(mm(w))[0, 0]  # warm
    t0 = time.perf_counter()
    outs = [mm(w) for _ in range(8)]
    _ = [np.asarray(o)[0, 0] for o in outs]
    compute_only = time.perf_counter() - t0
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(lambda: _force(jax.device_put(host)))
        outs = [mm(w) for _ in range(8)]
        _ = [np.asarray(o)[0, 0] for o in outs]
        fut.result()
    both = time.perf_counter() - t0
    print(
        f"8 matmuls alone: {compute_only * 1000:.1f} ms; "
        f"with concurrent 4MB put: {both * 1000:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
