"""Shared numeric primitives: layer norm, dense, attention (XLA reference).

These are the building blocks of the encoder/decoder.  They follow TPU
numerics discipline: matmuls run in the compute dtype (bf16 on TPU) with
float32 accumulation via ``preferred_element_type``; layer norm and softmax
statistics are computed in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value; safe in bf16/f32


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm over the last axis with float32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def dense(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """x @ kernel + bias with f32 accumulation on the MXU."""
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def dense_any(x: jax.Array, p: dict) -> jax.Array:
    """Dense dispatch: bf16 kernel or int8-quantized form (see
    ``models.quantize``)."""
    if "w_q" in p:
        from manga_ocr_tpu.ops.quant import dense_int8

        return dense_int8(x, p["w_q"], p["scale"], p.get("bias"))
    return dense(x, p["kernel"], p.get("bias"))


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., S, D] -> [..., H, S, dh]"""
    *lead, s, d = x.shape
    x = x.reshape(*lead, s, num_heads, d // num_heads)
    return jnp.swapaxes(x, -3, -2)


def merge_heads(x: jax.Array) -> jax.Array:
    """[..., H, S, dh] -> [..., S, D]"""
    x = jnp.swapaxes(x, -3, -2)
    *lead, s, h, dh = x.shape
    return x.reshape(*lead, s, h * dh)


def attention_scores(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Scaled dot-product attention (XLA reference path).

    q,k,v: [B, H, S_q|S_k, dh]; mask: additive-compatible boolean
    [B, 1|H, S_q, S_k] (True = attend).  Softmax runs in float32.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def mha(
    x_q: jax.Array,
    x_kv: jax.Array,
    p: dict,
    num_heads: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Full multi-head attention block: projections + SDPA + output proj.

    ``p`` holds q/k/v/o dense params. Works for self-attention
    (x_q is x_kv) and cross-attention.
    """
    q = split_heads(dense_any(x_q, p["q"]), num_heads)
    k = split_heads(dense_any(x_kv, p["k"]), num_heads)
    v = split_heads(dense_any(x_kv, p["v"]), num_heads)
    ctx = attention_scores(q, k, v, mask)
    return dense_any(merge_heads(ctx), p["o"])


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching HF ViT/BERT defaults."""
    return jax.nn.gelu(x, approximate=False)
