"""Patch-embed variants, slope-timed on TPU at B=256.

The round-1 formulation reshapes [B,224,224,3] to a 6-D array and
transposes with minor dim 3 — a relayout with 3-element vectors, suspected
to dominate the ~13 ms encoder residual (PERF.md).  Variants:

  v0  current: 6-D transpose (minor dim 3) + matmul
  v1  merge trailing (p, c) before transpose (minor dim 48) + matmul
  v2  einsum contraction, no explicit transpose (XLA picks the layout)
  v3  lax.conv_general_dilated stride-16 conv

Usage: python scripts/perf_patch_embed.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms, time_fn  # noqa: E402

B, HW, P, C, D = 256, 224, 16, 3, 768
G = HW // P  # 14

PX = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, C), jnp.bfloat16)
W = jax.random.normal(jax.random.PRNGKey(1), (P, P, C, D), jnp.bfloat16) * 0.02
BIAS = jnp.zeros((D,), jnp.float32)


def v0_current(px):
    x = px.reshape(B, G, P, G, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, G * G, P * P * C)
    k = W.reshape(P * P * C, D)
    return (jnp.dot(x, k, preferred_element_type=jnp.float32) + BIAS).astype(px.dtype)


def v1_merged(px):
    x = px.reshape(B, G, P, G, P * C)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, G * G, P * P * C)
    k = W.reshape(P * P * C, D)
    return (jnp.dot(x, k, preferred_element_type=jnp.float32) + BIAS).astype(px.dtype)


def v2_einsum(px):
    x = px.reshape(B, G, P, G, P * C)
    k = W.reshape(P, P * C, D)
    y = jnp.einsum("birjx,rxd->bijd", x, k, preferred_element_type=jnp.float32)
    return (y.reshape(B, G * G, D) + BIAS).astype(px.dtype)


def v3_conv(px):
    y = jax.lax.conv_general_dilated(
        px,
        W,
        window_strides=(P, P),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y.reshape(B, G * G, D) + BIAS).astype(px.dtype)


def main():
    ref = np.asarray(v0_current(PX), np.float32)
    for name, fn in [("v0_current", v0_current), ("v1_merged", v1_merged),
                     ("v2_einsum", v2_einsum), ("v3_conv", v3_conv)]:
        got = np.asarray(jax.jit(fn)(PX), np.float32)
        err = np.abs(got - ref).max()
        # slope-timed: px -> out isn't x->x, so scan over a wrapper that
        # keeps feeding the same input
        jf = jax.jit(fn)
        import time

        out = jf(PX); np.asarray(out[0, 0, :8])
        t0 = time.perf_counter()
        outs = [jf(PX) for _ in range(16)]
        for o in outs:
            np.asarray(o[0, 0, :8])
        ms = (time.perf_counter() - t0) / 16 * 1e3
        print(f"{name:12s} {ms:7.2f} ms   maxerr {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
