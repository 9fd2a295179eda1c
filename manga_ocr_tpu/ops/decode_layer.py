"""Fused decode-step kernels: self-attention and cross-attention blocks.

The XLA decode step at B=256 runs ~50 small ops per token: each op pays
launch latency and serializes its own HBM fetch, putting the measured step
at ~0.94 ms against a ~0.32 ms traffic floor (docs/PERF.md).  These kernels
collapse each decoder layer into two Pallas calls (+ the existing fused MLP
and greedy-head kernels), with the big streams — the int8 cross-K/V and the
self-attention cache — batch-tiled through the grid pipeline so their DMA
overlaps compute and the pipeline runs at the traffic floor.

Design notes (v5e, measured):

- A first whole-layer kernel with per-head matmuls ([8, 768] @ [768, 96]
  × 6 projections × 8 heads × 32 grid programs) ran 3x SLOWER than XLA —
  thousands of tiny serialized MXU ops.  This version uses whole-matrix
  projections only (q/k/v concatenated into one [D, 3D] matmul).
- head_dim (96) is not lane-aligned, and Mosaic lowers 96-offset lane
  slices through a broken gather path.  Per-head score/context reductions
  are instead done with a constant 0/1 *segment matrix* SEG [D, H]:
  scores[t, b, h] = (q ⊙ k)[t, b, :] @ SEG — one MXU op per block, no lane
  slicing or reshapes across the head boundary anywhere.
- The KV cache is packed [T, B, D] (heads merged): the per-step K/V row
  insert is a contiguous 2-D [batch-chunk, D] store at sublane index
  ``step``.  Softmax over T reduces sublanes — no transposes.
- Cross K/V are packed [B, S, D] int8 with per-(b, s) K scales and
  per-(b, d) V scales; the dequant multiplies land after the segment
  contractions, exactly like the XLA int8 cross-KV path.

Numerics mirror the XLA path (f32 softmax/LN statistics, bf16 residual
stream, per-row dynamic int8 activation quantization as in the encoder's
fused kernels), so greedy-token parity holds (tests/test_decode_layer.py).

Reference behavior being replaced: the per-crop torch ``generate()`` inside
the black-box manga_ocr package (`/root/reference/src/ui/main_window.py:9801`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.ops.kernel_utils import pick_group, NEG_INF, seg_matrix
from manga_ocr_tpu.ops.kernel_utils import quant_rows as _quant_rows



def _ln32(x32, s_ref, b_ref, eps):
    from manga_ocr_tpu.ops.kernel_utils import ln32

    return ln32(x32, s_ref[:], b_ref[:], eps)


def _proj(h32, w_ref, s_ref, b_ref, int8: bool, dt):
    """[g, K] f32 -> [g, N] f32 via int8 MXU (dynamic per-row activation
    quant) or plain matmul with f32 accumulation."""
    if int8:
        hq, sx = _quant_rows(h32)
        acc = jax.lax.dot_general(
            hq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * s_ref[:]
    else:
        y = jax.lax.dot_general(
            h32.astype(dt), w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return y + b_ref[:]





# ---------------------------------------------------------------------------
# self-attention step kernel
# ---------------------------------------------------------------------------


def _self_attn_kernel(
    step_ref,
    x_ref, wqkv, sqkv, bqkv, wo, so, bo, lns, lnb, seg_ref,
    ck_ref, cv_ref,
    xo_ref, cko_ref, cvo_ref,
    *,
    eps: float,
    heads: int,
    dh: int,
    int8_w: bool,
):
    step = step_ref[0]
    x = x_ref[:]  # [g, D]
    dt = x.dtype
    d = x.shape[-1]
    qkv = _proj(x.astype(jnp.float32), wqkv, sqkv, bqkv, int8_w, dt)  # [g, 3D]
    q = qkv[:, :d]
    k = qkv[:, d : 2 * d].astype(dt)
    v = qkv[:, 2 * d :].astype(dt)

    # the cache outputs ALIAS the inputs (input_output_aliases below), so
    # only the new row is written — no full-cache passthrough copy, which
    # would cost ~2x cache-size HBM traffic per layer per step (at the
    # engine's max_length=300 that is ~944 MB/token for the 2-layer decoder)
    del ck_ref, cv_ref
    cko_ref[step, :, :] = k
    cvo_ref[step, :, :] = v

    t_len = cko_ref.shape[0]
    g = x.shape[0]
    seg = seg_ref[:]  # [D, H] f32
    ck = cko_ref[:].astype(jnp.float32)  # [T, g, D]
    cv = cvo_ref[:].astype(jnp.float32)
    prod = q[None, :, :] * ck  # [T, g, D] f32
    scores = jax.lax.dot_general(
        prod.reshape(t_len * g, d), seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t_len, g, heads) * (1.0 / (dh**0.5))
    t_keep = jax.lax.broadcasted_iota(jnp.int32, (t_len, 1, 1), 0) <= step
    scores = jnp.where(t_keep, scores, NEG_INF)
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    p_full = jax.lax.dot_general(
        p.reshape(t_len * g, heads), seg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t_len, g, d)
    ctx = jnp.sum(p_full * cv, axis=0)  # [g, D] f32

    out = _proj(ctx, wo, so, bo, int8_w, dt)
    xo_ref[:] = _ln32((x + out.astype(dt)).astype(jnp.float32), lns, lnb, eps).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "group", "interpret")
)
def fused_self_attn_step(
    x: jax.Array,  # [B, D]
    p: dict,  # self_attn params: q/k/v/o denses (bf16 kernel or w_q+scale)
    ln: dict,  # self_ln
    cache_k: jax.Array,  # [T, B, D] packed cache
    cache_v: jax.Array,
    step: jax.Array,
    num_heads: int,
    eps: float,
    group: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """LN(x + SelfAttn(x)) for one decode step, cache updated in-kernel.
    Returns (x_out, cache_k_out, cache_v_out)."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, d = x.shape
    t_len = cache_k.shape[0]
    dh = d // num_heads
    group = pick_group(b, group)

    int8_w = "w_q" in p["q"]
    dt = x.dtype
    if int8_w:
        wqkv = jnp.concatenate([p[k]["w_q"] for k in ("q", "k", "v")], axis=1)
        sqkv = jnp.concatenate(
            [p[k]["scale"].astype(jnp.float32) for k in ("q", "k", "v")]
        )
        wo, so = p["o"]["w_q"], p["o"]["scale"].astype(jnp.float32)
    else:
        wqkv = jnp.concatenate(
            [p[k]["kernel"].astype(dt) for k in ("q", "k", "v")], axis=1
        )
        sqkv = jnp.ones((3 * d,), jnp.float32)
        wo, so = p["o"]["kernel"].astype(dt), jnp.ones((d,), jnp.float32)
    bqkv = jnp.concatenate(
        [p[k]["bias"].astype(jnp.float32) for k in ("q", "k", "v")]
    )

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    xs = pl.BlockSpec((group, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec(
        (t_len, group, d), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // group,),
        in_specs=[
            xs,
            const((d, 3 * d)), const((3 * d,)), const((3 * d,)),
            const((d, d)), const((d,)), const((d,)),
            const((d,)), const((d,)),
            const((d, num_heads)),
            cache_spec, cache_spec,
        ],
        out_specs=[xs, cache_spec, cache_spec],
    )
    kernel = functools.partial(
        _self_attn_kernel, eps=eps, heads=num_heads, dh=dh, int8_w=int8_w
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, d), dt),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        # cache_k/cache_v (positions 11/12 incl. the scalar-prefetch arg)
        # alias cache outputs 1/2: the kernel writes only the new K/V row
        input_output_aliases={11: 1, 12: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(step, jnp.int32).reshape(1),
        x,
        wqkv, sqkv, bqkv,
        wo, so, p["o"]["bias"].astype(jnp.float32),
        ln["scale"].astype(jnp.float32), ln["bias"].astype(jnp.float32),
        seg_matrix(num_heads, dh),
        cache_k, cache_v,
    )


# ---------------------------------------------------------------------------
# cross-attention step kernel
# ---------------------------------------------------------------------------


def _cross_attn_kernel(
    x_ref, wq, sq, bq, wo, so, bo, lns, lnb, seg_ref,
    K_ref, V_ref, ks_ref, vs_ref,
    xo_ref,
    *,
    eps: float,
    heads: int,
    dh: int,
    s_valid: int,
    int8_w: bool,
    int8_kv: bool,
):
    x = x_ref[:]  # [g, D]
    dt = x.dtype
    g, d = x.shape
    s_len = K_ref.shape[1]
    q = _proj(x.astype(jnp.float32), wq, sq, bq, int8_w, dt)  # [g, D] f32

    seg = seg_ref[:]
    K = K_ref[:].astype(jnp.float32)  # [g, S, D]
    prod = q[:, None, :] * K
    scores = jax.lax.dot_general(
        prod.reshape(g * s_len, d), seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s_len, heads)
    if int8_kv:
        scores = scores * ks_ref[:][:, :, None]
    scores = scores * (1.0 / (dh**0.5))
    if s_valid < s_len:
        keep = jax.lax.broadcasted_iota(jnp.int32, (1, s_len, 1), 1) < s_valid
        scores = jnp.where(keep, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p_full = jax.lax.dot_general(
        p.reshape(g * s_len, heads), seg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s_len, d)
    ctx = jnp.sum(p_full * V_ref[:].astype(jnp.float32), axis=1)  # [g, D]
    if int8_kv:
        ctx = ctx * vs_ref[:]

    out = _proj(ctx, wo, so, bo, int8_w, dt)
    xo_ref[:] = _ln32((x + out.astype(dt)).astype(jnp.float32), lns, lnb, eps).astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "s_valid", "group", "interpret"),
)
def fused_cross_attn_step(
    x: jax.Array,  # [B, D]
    p: dict,  # cross_attn params (q/o used)
    ln: dict,  # cross_ln
    cross_k: jax.Array,  # [B, S, D] int8 or bf16 (packed layout)
    cross_v: jax.Array,
    k_scale: jax.Array | None,  # [B, S] f32
    v_scale: jax.Array | None,  # [B, D] f32
    num_heads: int,
    eps: float,
    s_valid: int,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """LN(x + CrossAttn(x, enc)) for one decode step."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, d = x.shape
    s_len = cross_k.shape[1]
    dh = d // num_heads
    group = pick_group(b, group)

    int8_w = "w_q" in p["q"]
    int8_kv = cross_k.dtype == jnp.int8
    dt = x.dtype
    if int8_w:
        wq, sq = p["q"]["w_q"], p["q"]["scale"].astype(jnp.float32)
        wo, so = p["o"]["w_q"], p["o"]["scale"].astype(jnp.float32)
    else:
        wq, sq = p["q"]["kernel"].astype(dt), jnp.ones((d,), jnp.float32)
        wo, so = p["o"]["kernel"].astype(dt), jnp.ones((d,), jnp.float32)
    # NB: the bf16-KV mode still streams these (all-ones) scale blocks —
    # ~1 MB/step/layer of avoidable traffic.  Only the int8 serving layout
    # is perf-relevant, so the uniform kernel arity is kept for simplicity.
    if k_scale is None:
        k_scale = jnp.ones((b, s_len), jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones((b, d), jnp.float32)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    xs = pl.BlockSpec((group, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (group, s_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ks_spec = pl.BlockSpec((group, s_len), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vs_spec = pl.BlockSpec((group, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cross_attn_kernel,
        eps=eps,
        heads=num_heads,
        dh=dh,
        s_valid=s_valid,
        int8_w=int8_w,
        int8_kv=int8_kv,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            xs,
            const((d, d)), const((d,)), const((d,)),
            const((d, d)), const((d,)), const((d,)),
            const((d,)), const((d,)),
            const((d, num_heads)),
            kv_spec, kv_spec, ks_spec, vs_spec,
        ],
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((b, d), dt),
        # the f32 [g, S, D] prod/p_full intermediates overflow the default
        # 16 MB scoped budget at g=16; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        wq, sq, p["q"]["bias"].astype(jnp.float32),
        wo, so, p["o"]["bias"].astype(jnp.float32),
        ln["scale"].astype(jnp.float32), ln["bias"].astype(jnp.float32),
        seg_matrix(num_heads, dh),
        cross_k, cross_v, k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
    )
