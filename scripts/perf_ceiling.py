"""Measure this chip's PRACTICAL matmul ceiling through the axon runtime.

If a bare XLA [8k,8k]@[8k,8k] bf16 matmul reaches ~90% of the 197 TF/s
v5e spec, the encoder kernels' ~45%-of-peak is a kernel problem; if the
bare matmul also caps near half, the spec number is not reachable through
this runtime and the encoder is near its true floor (changes the roadmap).

Usage: python scripts/perf_ceiling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms  # noqa: E402


def xla_case(n, k, m, dtype, acc):
    w = jax.random.normal(jax.random.PRNGKey(0), (k, m)).astype(dtype)
    if dtype == jnp.int8:
        w = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (k, m)) * 30, -127, 127).astype(jnp.int8)

    def body(x):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        # keep shape x -> x: fold back via slice (cheap vs the matmul)
        return (y[:, :k] if m >= k else jnp.pad(y, ((0, 0), (0, k - m)))).astype(x.dtype)

    if dtype == jnp.int8:
        x0 = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(1), (n, k)) * 30, -127, 127
        ).astype(jnp.int8)
    else:
        x0 = jax.random.normal(jax.random.PRNGKey(1), (n, k)).astype(dtype)
    ms = op_ms(body, x0, n1=4, n2=12, iters=4)
    fl = 2 * n * k * m
    print(
        f"XLA  {n}x{k}x{m} {jnp.dtype(dtype).name:8s} {ms:8.3f} ms  "
        f"{fl / ms / 1e9:7.1f} GF/s",
        flush=True,
    )


def pallas_case(n, k, m, dtype, acc, tile=512):
    if dtype == jnp.int8:
        w = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (k, m)) * 30, -127, 127).astype(jnp.int8)
        x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (n, k)) * 30, -127, 127).astype(jnp.int8)
    else:
        w = jax.random.normal(jax.random.PRNGKey(0), (k, m)).astype(dtype)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (n, k)).astype(dtype)

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc
        ).astype(o_ref.dtype)

    @jax.jit
    def mm(x):
        return pl.pallas_call(
            kern,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    def body(x):
        y = mm(x)
        return (y[:, :k] if m >= k else jnp.pad(y, ((0, 0), (0, k - m)))).astype(x.dtype)

    ms = op_ms(body, x0, n1=4, n2=12, iters=4)
    fl = 2 * n * k * m
    print(
        f"PAL  {n}x{k}x{m} {jnp.dtype(dtype).name:8s} tile={tile:4d} {ms:8.3f} ms  "
        f"{fl / ms / 1e9:7.1f} GF/s",
        flush=True,
    )


def main():
    bf = jnp.bfloat16
    # ceiling: big square, K large
    xla_case(8192, 8192, 8192, bf, jnp.float32)
    xla_case(8192, 8192, 8192, jnp.int8, jnp.int32)
    # the fc1 shape (flattened encoder tokens)
    xla_case(50432, 768, 3072, bf, jnp.float32)
    xla_case(50432, 768, 3072, jnp.int8, jnp.int32)
    pallas_case(50432, 768, 3072, bf, jnp.float32, tile=512)
    pallas_case(50432, 768, 3072, jnp.int8, jnp.int32, tile=512)
    pallas_case(50432, 768, 3072, jnp.int8, jnp.int32, tile=1024)
    # the qkv proj shape
    xla_case(50432, 768, 768, jnp.int8, jnp.int32)
    pallas_case(50432, 768, 768, jnp.int8, jnp.int32, tile=1024)


if __name__ == "__main__":
    main()
