"""Fused attention Pallas kernel for the ViT encoder.

The encoder's XLA attention materializes [B, H, S, S] float32 logits and
probabilities in HBM (four tensor round-trips per layer).  At manga-ocr
shapes (S = 197 padded to 256, dh = 64) the whole attention working set for
one (batch, head) fits comfortably in VMEM, so this kernel computes
QK^T → mask → softmax → AV in one pass with only Q/K/V/O touching HBM:

- grid = (B*H,): one program per (batch, head) — S is small, no K/V tiling
  or online-softmax machinery needed (that's for long-sequence flash;
  here the win is purely fusion / HBM traffic),
- logits and softmax statistics in float32 on the VPU, matmuls on the MXU
  with ``preferred_element_type=f32``,
- the sequence is padded to a multiple of 128 lanes; padded key columns are
  masked with -inf before softmax, padded query rows are discarded by the
  caller's slice.

Falls back to the XLA reference implementation on CPU (tests run the kernel
in interpreter mode for parity instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.ops import common

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float):
    q = q_ref[0]  # [S, dh]
    k = k_ref[0]
    v = v_ref[0]
    s = q.shape[0]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [S, S] f32
    if valid_len < s:
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), dimension=1)
        logits = jnp.where(col < valid_len, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pad_len(s: int) -> int:
    return ((s + 127) // 128) * 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, H, S, dh] q/k/v -> [B, H, S, dh] attention output (full, unmasked
    except sequence padding)."""
    b, h, s, dh = q.shape
    sp = _pad_len(s)
    scale = 1.0 / (dh**0.5)

    def prep(x):
        x = x.reshape(b * h, s, dh)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    kernel = functools.partial(_attn_kernel, valid_len=s, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, sp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sp * sp * dh,
            bytes_accessed=4 * b * h * sp * dh * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
    )(qp, kp, vp)
    return out[:, :s, :].reshape(b, h, s, dh)


def mha_fused(
    x_q: jax.Array,
    x_kv: jax.Array,
    p: dict,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``ops.common.mha`` (self/cross attention with
    no mask) using the fused kernel."""
    q = common.split_heads(common.dense(x_q, p["q"]["kernel"], p["q"]["bias"]), num_heads)
    k = common.split_heads(common.dense(x_kv, p["k"]["kernel"], p["k"]["bias"]), num_heads)
    v = common.split_heads(common.dense(x_kv, p["v"]["kernel"], p["v"]["bias"]), num_heads)
    ctx = fused_attention(q, k, v, interpret=interpret)
    return common.dense(common.merge_heads(ctx), p["o"]["kernel"], p["o"]["bias"])
