"""Fused greedy LM head: transform → GELU → LN → vocab matmul → argmax.

Per decode step the head is the single most expensive block (~1 ms of the
~1.8 ms step at B=256 — see docs/PERF.md): XLA runs it as several kernels
with HBM round-trips for the [B, 6144] float32 logits, plus a separate
argmax pass.  Greedy decoding never needs the logits — only the argmax — so
this kernel keeps everything resident in VMEM (the full [768, 6144] bf16
projection is ~9.4 MB, fits) and tracks a running (max, argmax) over vocab
tiles, writing back just [B] token ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VOCAB_TILE = 512


# erf lives in kernel_utils so a numerics fix lands once for every kernel
# (op-for-op the same Horner chain — bit-identical, argmax parity preserved)
from manga_ocr_tpu.ops.kernel_utils import erf_poly as _erf


def _head_kernel(
    x_ref,
    wt_ref,
    bt_ref,
    lns_ref,
    lnb_ref,
    wp_ref,
    bp_ref,
    idx_ref,
    *,
    eps: float,
    vocab: int,
):
    x = x_ref[:]  # [B, D]
    b = x.shape[0]
    # transform dense + exact GELU (f32)
    h = (
        jax.lax.dot_general(
            x,
            wt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bt_ref[0].astype(jnp.float32)[None, :]
    )
    # Exact-GELU via polynomial erf (Pallas TPU lowers neither erf nor
    # erfc; Abramowitz–Stegun 7.1.26, |eps| <= 1.5e-7 — far below bf16
    # resolution, argmax-equivalent to the exact head in tests).
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    # layer norm (f32 statistics)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0].astype(jnp.float32)[None, :] + lnb_ref[0].astype(
        jnp.float32
    )[None, :]
    h = h.astype(x.dtype)
    # tiled vocab projection with running argmax
    best = jnp.full((b, 1), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((b, 1), jnp.int32)
    n_tiles = vocab // VOCAB_TILE
    for j in range(n_tiles):
        logits = (
            jax.lax.dot_general(
                h,
                wp_ref[:, j * VOCAB_TILE : (j + 1) * VOCAB_TILE],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bp_ref[0, j * VOCAB_TILE : (j + 1) * VOCAB_TILE].astype(jnp.float32)[
                None, :
            ]
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        am = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        upd = m > best
        best_idx = jnp.where(upd, am + j * VOCAB_TILE, best_idx)
        best = jnp.where(upd, m, best)
    idx_ref[:] = best_idx


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_greedy_head(
    x: jax.Array,  # [B, D]
    wt: jax.Array,  # [D, D] transform dense kernel
    bt: jax.Array,  # [D]
    lns: jax.Array,  # [D] LN scale
    lnb: jax.Array,  # [D] LN bias
    wp: jax.Array,  # [D, V] vocab projection
    bp: jax.Array,  # [V]
    eps: float = 1e-12,
    interpret: bool = False,
) -> jax.Array:
    """Returns argmax token ids [B] int32.  Vocab must be a multiple of the
    tile (manga-ocr: 6144 = 12×512); callers pad otherwise."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, d = x.shape
    v = wp.shape[1]
    assert v % VOCAB_TILE == 0, f"vocab {v} not a multiple of {VOCAB_TILE}"
    kernel = functools.partial(_head_kernel, eps=eps, vocab=v)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        interpret=interpret,
    )(
        x,
        wt.astype(x.dtype),
        bt.reshape(1, -1),
        lns.reshape(1, -1),
        lnb.reshape(1, -1),
        wp.astype(x.dtype),
        bp.reshape(1, -1),
    )
    return out[:, 0]
