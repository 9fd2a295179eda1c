"""Probe Mosaic per-program grid overhead + achievable matmul rates on the
axon runtime.  Round-1 kernels lost to a suspected ~25-45 us/program cost;
this measures it directly: (a) a copy kernel at several grid sizes,
(b) a resident-weight matmul at several row-tile sizes vs the XLA matmul.

Usage: python scripts/perf_grid.py [name ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

M, K, N = 50432, 768, 3072  # encoder fc1 shape at B=256 (tokens = 256*197)
N_INNER = 10
X = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
W = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02


def _time(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / iters / N_INNER * 1e3


def scan_op(body):
    @jax.jit
    def run(x0):
        def step(x, _):
            return body(x), None

        x, _ = jax.lax.scan(step, x0, None, length=N_INNER)
        return jnp.sum(x[:8, :8].astype(jnp.float32))

    return run


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.bfloat16(1.0009765625)


def make_copy(tm: int):
    def body(x):
        spec = pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel,
            grid=(M // tm,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        )(x)

    return body


def mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)[:, :K]


def make_mm(tm: int):
    def body(x):
        xs = pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
        os = pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
            o_ref[:] = acc[:, :K].astype(jnp.bfloat16)

        return pl.pallas_call(
            kernel,
            grid=(M // tm,),
            in_specs=[xs, ws],
            out_specs=os,
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        )(x, W)

    return body


def xla_mm(x):
    return jnp.dot(x, W, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :K]


VARIANTS = {
    "copy_tm64": make_copy(64),
    "copy_tm256": make_copy(256),
    "copy_tm1576": make_copy(1576),
    "copy_tm6304": make_copy(6304),
    "mm_xla": xla_mm,
    "mm_tm128": make_mm(128),
    "mm_tm256": make_mm(256),
    "mm_tm512": make_mm(512),
    "mm_tm3152": make_mm(3152),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            ms = _time(scan_op(VARIANTS[name]), X)
            progs = ""
            if "tm" in name:
                tm = int(name.split("tm")[1])
                progs = f"  ({M // tm} programs, {ms * 1e3 / (M // tm):.1f} us/prog)"
            print(f"{name:14s} {ms:8.3f} ms/iter{progs}")
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
