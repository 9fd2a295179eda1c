"""Probe: fused encoder-MLP kernels (bf16 / int8) vs the XLA MLP, plus raw
HBM bandwidth and int8-dot support.  Usage: python scripts/perf_mlp.py [names]
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

M, K, N = 50432, 768, 3072
N_INNER = 10
X = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
W1 = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02
W2 = jax.random.normal(jax.random.PRNGKey(2), (N, K), jnp.bfloat16) * 0.02
B1 = jnp.zeros((N,), jnp.float32)
B2 = jnp.zeros((K,), jnp.float32)
LN_S = jnp.ones((K,), jnp.float32)
LN_B = jnp.zeros((K,), jnp.float32)

# pre-quantized weights (per-output-channel symmetric)
def quant_w(w):
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s

W1Q, S1 = quant_w(W1)
W2Q, S2 = quant_w(W2)


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


def _ln(x):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-12) * LN_S + LN_B


def mlp_xla(x):
    h = _ln(x).astype(jnp.bfloat16)
    h = jnp.dot(h, W1, preferred_element_type=jnp.float32) + B1
    h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
    o = jnp.dot(h, W2, preferred_element_type=jnp.float32) + B2
    return x + o.astype(jnp.bfloat16)


# polynomial erf (Pallas-lowerable), same approach as ops/fused_head
def _erf(x):
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    y = 1.0 - (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t
        + 0.254829592
    ) * t * jnp.exp(-x * x)
    return jnp.sign(x) * y


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def mlp_fused_bf16_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[:]
    h = _ln(x).astype(jnp.bfloat16)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + B1
    h = _gelu(h).astype(jnp.bfloat16)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + B2
    o_ref[:] = x + o.astype(jnp.bfloat16)


def make_mlp_fused_bf16(tm):
    xs = pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def body(x):
        return pl.pallas_call(
            mlp_fused_bf16_kernel,
            grid=(M // tm,),
            in_specs=[xs, w1s, w2s],
            out_specs=xs,
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        )(x, W1, W2)

    return body


def mlp_fused_int8_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[:]
    h32 = _ln(x)
    # per-token dynamic quantization
    amax = jnp.max(jnp.abs(h32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    hq = jnp.clip(jnp.round(h32 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h = acc.astype(jnp.float32) * sx * S1 + B1
    h = _gelu(h)
    amax2 = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    sx2 = jnp.maximum(amax2, 1e-8) / 127.0
    hq2 = jnp.clip(jnp.round(h / sx2), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq2, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o = acc2.astype(jnp.float32) * sx2 * S2 + B2
    o_ref[:] = x + o.astype(jnp.bfloat16)


def make_mlp_fused_int8(tm):
    xs = pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def body(x):
        return pl.pallas_call(
            mlp_fused_int8_kernel,
            grid=(M // tm,),
            in_specs=[xs, w1s, w2s],
            out_specs=xs,
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        )(x, W1Q, W2Q)

    return body


def read_bw_kernel(x_ref, o_ref):
    o_ref[0, :] = jnp.sum(x_ref[:], axis=0)


def read_bw(x):
    """Pure-read bandwidth probe: reduce 74MB to [1, K]."""
    xs = pl.BlockSpec((512, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        read_bw_kernel,
        grid=(M // 512,),
        in_specs=[xs],
        out_specs=os,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.bfloat16),
    )(x)
    return jnp.broadcast_to(out, (M, K))[:, :K] * jnp.bfloat16(1e-6) + x * 0


VARIANTS = {
    "mlp_xla": mlp_xla,
    "mlp_fused_bf16_256": make_mlp_fused_bf16(256),
    "mlp_fused_int8_256": make_mlp_fused_int8(256),
    "mlp_fused_int8_512": make_mlp_fused_int8(512),
    "read_bw": read_bw,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            ms = _time(scan_op(VARIANTS[name]), X)
            print(f"{name:22s} {ms:8.3f} ms/iter")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:22s} FAILED: {type(e).__name__}: {msg}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
