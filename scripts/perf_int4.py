"""Probe: is int4 matmul faster than int8 on the v5e MXU through Mosaic?

Slope-times raw dot_generals at the encoder fc1 shape [50432, 768] @
[768, 3072] for bf16 / int8 / int4 weight dtypes (activations int8), plus
an int4-weights int8-activations mixed case.  A ~2x int4 win would justify
W4A8 encoder quantization.

Usage: python scripts/perf_int4.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms  # noqa: E402

M, K, N = 50432, 768, 3072
TILE = 512


def make_matmul(w, acc_dtype, x_dtype):
    def kernel(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        # tiny NON-LINEAR reduce back to x-shape so the op chains under a
        # scan: a linear sum lets the compiler rewrite matmul+sum into a
        # matvec (x @ row-sum(w)) and skip the matmul entirely
        o_ref[:] = (
            x_ref[:].astype(jnp.float32)
            + jnp.max(acc.astype(jnp.float32), axis=-1, keepdims=True) * 1e-30
        ).astype(x_ref.dtype)

    def body(x):
        xs = pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(M // TILE,),
            in_specs=[
                xs,
                pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=xs,
            out_shape=jax.ShapeDtypeStruct((M, K), x_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, w)

    return body


def main():
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    x8 = jnp.clip(jnp.round(xb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    wb = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02
    w8 = jnp.clip(jnp.round(wb.astype(jnp.float32) * 500), -127, 127).astype(jnp.int8)

    for name, x, w, acc in [
        ("bf16 @ bf16 -> f32", xb, wb, jnp.float32),
        ("int8 @ int8 -> int32", x8, w8, jnp.int32),
    ]:
        try:
            ms = op_ms(make_matmul(w, acc, x.dtype), x, n1=4, n2=16, iters=4)
            print(f"{name:28s} {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    try:
        w4 = w8.astype(jnp.int4)
        for name, x, acc in [
            ("int8 @ int4 -> int32", x8, jnp.int32),
            ("int4 @ int4 -> int32", x8.astype(jnp.int4), jnp.int32),
        ]:
            try:
                ms = op_ms(make_matmul(w4, acc, x.dtype), x, n1=4, n2=16, iters=4)
                print(f"{name:28s} {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int4 dtype unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
