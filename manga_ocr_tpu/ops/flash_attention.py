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


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, scores_ref, *, valid_len: int, scale: float, group: int
):
    """One program handles ``group`` (batch, head) pairs: per pair,
    QK^T → mask → softmax → AV with the f32 logits living in VMEM scratch.
    Grouping amortizes per-program grid overhead (measured ~25 µs/program
    on v5e — a 1-head grid spends more on iteration than on math)."""
    s = q_ref.shape[1]

    def one(g, _):
        q = q_ref[g]  # [S, dh]
        logits = jax.lax.dot_general(
            q,
            k_ref[g],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_len < s:
            col = jax.lax.broadcasted_iota(jnp.int32, (s, s), dimension=1)
            logits = jnp.where(col < valid_len, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        scores_ref[:] = (p / denom).astype(scores_ref.dtype)
        o_ref[g] = jax.lax.dot_general(
            scores_ref[:],
            v_ref[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, one, 0)


def _pad_len(s: int) -> int:
    return ((s + 127) // 128) * 128


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    group: int = 8,  # VMEM budget: (3 in + 1 out) x group x [256,64] blocks
    # double-buffered + f32 score temporaries must stay under the ~16 MB
    # scoped VMEM limit; 8 measured at XLA parity, 32 OOMs.
) -> jax.Array:
    """[B, H, S, dh] q/k/v -> [B, H, S, dh] attention output (full, unmasked
    except sequence padding)."""
    b, h, s, dh = q.shape
    sp = _pad_len(s)
    scale = 1.0 / (dh**0.5)
    n = b * h
    group = min(group, n)
    while n % group:
        group //= 2
    group = max(group, 1)

    def prep(x):
        x = x.reshape(n, s, dh)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    kernel = functools.partial(
        _attn_kernel, valid_len=s, scale=scale, group=group
    )
    spec = pl.BlockSpec(
        (group, sp, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, sp, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((sp, sp), q.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * sp * sp * dh,
            bytes_accessed=4 * n * sp * dh * q.dtype.itemsize,
            transcendentals=n * sp * sp,
        ),
    )(qp, kp, vp)
    return out[:, :s, :].reshape(b, h, s, dh)


def _packed_kernel(
    q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float, heads: int, dh: int
):
    """All heads of ``g`` batch items per program, operating directly on the
    projection output layout [g, Sp, H*dh] — no [B,H,S,dh] head transpose
    ever materializes in HBM (PERF.md round-1: relayouts, not FLOPs, dominate
    encoder attention cost)."""
    g, sp, _ = q_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=1)
    keep = col < valid_len
    for b in range(g):
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            logits = (
                jax.lax.dot_general(
                    q,
                    k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            logits = jnp.where(keep, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    p.astype(v.dtype),
                    v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        o_ref[b] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "group"))
def attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    interpret: bool = False,
    group: int = 4,
) -> jax.Array:
    """Fused attention on the packed layout: q/k/v [B, S, H*dh] (straight
    from the dense projections) -> [B, S, H*dh] context."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, s, d = q.shape
    dh = d // num_heads
    sp = _pad_len(s)
    scale = 1.0 / (dh**0.5)
    group = max(1, min(group, b))
    while b % group:
        group //= 2

    def prep(x):
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))) if sp != s else x

    qp, kp, vp = prep(q), prep(k), prep(v)
    kernel = functools.partial(
        _packed_kernel, valid_len=s, scale=scale, heads=num_heads, dh=dh
    )
    spec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * sp * sp * dh,
            bytes_accessed=4 * b * sp * d * q.dtype.itemsize,
            transcendentals=b * num_heads * sp * sp,
        ),
    )(qp, kp, vp)
    return out[:, :s, :]


def mha_packed(
    x_q: jax.Array,
    x_kv: jax.Array,
    p: dict,
    num_heads: int,
    interpret: bool = False,
    group: int = 4,
) -> jax.Array:
    """Drop-in MHA using the packed-layout fused kernel (no head transpose)."""
    q = common.dense(x_q, p["q"]["kernel"], p["q"]["bias"])
    k = common.dense(x_kv, p["k"]["kernel"], p["k"]["bias"])
    v = common.dense(x_kv, p["v"]["kernel"], p["v"]["bias"])
    ctx = attention_packed(q, k, v, num_heads, interpret=interpret, group=group)
    return common.dense(ctx, p["o"]["kernel"], p["o"]["bias"])


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
