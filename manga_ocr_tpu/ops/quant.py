"""int8 weight quantization for the encoder's matmul-heavy blocks.

v5e's MXU runs int8 at 2× bf16 throughput; the encoder MLP (the single
largest time block, ~106 TF/s bf16 at B=256 — see docs/PERF.md) is the
target.  Scheme: symmetric per-output-channel int8 weights, dynamic
per-row (per-token) int8 activations, int32 accumulation, f32 dequant:

    y[m, n] = (x_q[m, :] · w_q[:, n]) * sx[m] * sw[n] + bias[n]

Quantization is opt-in (``models.quantize.quantize_encoder``); parity
tests bound the error against the bf16 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight_per_col(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[K, N] float -> (int8 [K, N], f32 scales [N])."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale


def dense_int8(
    x: jax.Array,  # [..., K] bf16/f32
    w_q: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [N] f32
    bias: jax.Array | None = None,
) -> jax.Array:
    """Dynamic-activation int8 matmul with f32 dequantization."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8)
    sx = amax / 127.0
    # reciprocal-multiply (not per-element divide), no clip — mirrors
    # kernel_utils.quant_rows so the XLA and Pallas int8 paths round
    # identically (token-parity tests compare them exactly); see there for
    # why the clip is provably dead
    x_q = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
