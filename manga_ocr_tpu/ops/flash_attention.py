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
    # interpreter mode off-TPU, like every other kernel in this package
    interpret = interpret or jax.default_backend() == "cpu"
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


# ---------------------------------------------------------------------------
# Fully fused pre-LN attention layer: LN -> q/k/v proj -> SDPA -> out proj
# -> +residual, one kernel, weights VMEM-resident (int8 or bf16).
# ---------------------------------------------------------------------------


from manga_ocr_tpu.ops.kernel_utils import gelu_fn as _gelu_fn
from manga_ocr_tpu.ops.kernel_utils import ln32 as _ln32
from manga_ocr_tpu.ops.kernel_utils import quant_rows as _quant_rows


def _attn_core(
    x,
    wq_ref, wk_ref, wv_ref, wo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    bq_ref, bk_ref, bv_ref, bo_ref,
    lns_ref, lnb_ref,
    *,
    eps: float,
    valid_len: int,
    heads: int,
    dh: int,
    int8: bool,
    batched_sdpa: bool = False,
    fuse_qkv: bool = False,
    sdpa_int8: bool = False,
    sdpa_headpack: bool = False,
):
    """x + Attention(LN(x)) on an in-VMEM [g, sp, d] value; shared by the
    attention-only and the merged attention+MLP layer kernels.

    ``fuse_qkv``: wq/sq/bq hold the CONCATENATED [d, 3d]/[3d] q‖k‖v
    projection (wk/wv/sk/sv/bk/bv unused) — one MXU matmul instead of
    three, the quantized activation read once.  Bit-exact: each output
    column's contraction is unchanged.

    ``sdpa_int8``: run the two SDPA matmuls (QK^T and PV) on the int8 MXU
    path with dynamic quantization — per-row per-head for q/k/probs, per
    output column for v.  The dh=64 contraction uses half the MXU's K depth
    in any dtype (the encoder's known shape loss, docs/PERF.md); int8's
    double-pumped rate is the only lever past it.  Adds ~1/127-step noise
    to logits and probabilities — covered by the int8 serving parity
    tests."""
    g, sp, d = x.shape
    h32 = _ln32(x, lns_ref[:], lnb_ref[:], eps).reshape(g * sp, d)

    def proj(w_ref, s_ref, b_ref, hq, sx):
        n = w_ref.shape[1]
        if int8:
            acc = jax.lax.dot_general(
                hq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * sx * s_ref[:] + b_ref[:]
        else:
            y = (
                jnp.dot(hq, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
        return y.astype(x.dtype).reshape(g, sp, n)

    if int8:
        hq, sx = _quant_rows(h32)
    else:
        hq, sx = h32.astype(x.dtype), None
    if fuse_qkv:
        qkv = proj(wq_ref, sq_ref, bq_ref, hq, sx)  # [g, sp, 3d]
        q = qkv[:, :, :d]
        k = qkv[:, :, d : 2 * d]
        v = qkv[:, :, 2 * d :]
    else:
        q = proj(wq_ref, sq_ref, bq_ref, hq, sx)
        k = proj(wk_ref, sk_ref, bk_ref, hq, sx)
        v = proj(wv_ref, sv_ref, bv_ref, hq, sx)

    # static; with unpadded blocks (every current caller) the mask is moot —
    # kept for padded-sequence callers
    masked = valid_len < sp
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), dimension=1)
        keep = col < valid_len
    scale = 1.0 / (dh**0.5)
    if batched_sdpa:
        # one batched dot per head (batch dim = g): halves the unrolled op
        # count vs the per-(b, h) loop and runs softmax on [g, sp, sp].
        # "phased" emits the ops in three waves (all logits matmuls, then
        # all softmaxes, then all context matmuls) so Mosaic can pipeline
        # independent heads' MXU/VPU work instead of 12 serial
        # matmul→softmax→matmul dependency chains.
        phased = batched_sdpa == "phased"

        def _logits(h):
            sl = slice(h * dh, (h + 1) * dh)
            logits = jax.lax.dot_general(
                q[:, :, sl], k[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [g, sp, sp]
            if masked:
                logits = jnp.where(keep[None], logits, NEG_INF)
            return logits

        def _softmax(logits):
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            # reciprocal-multiply: one divide per row instead of per element
            return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))

        def _ctx(h, p):
            sl = slice(h * dh, (h + 1) * dh)
            return jax.lax.dot_general(
                p.astype(x.dtype), v[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [g, sp, dh]

        if phased:
            logits_heads = [_logits(h) for h in range(heads)]
            ps = [_softmax(l) for l in logits_heads]
            ctx_heads = [_ctx(h, p) for h, p in enumerate(ps)]
        else:
            ctx_heads = [_ctx(h, _softmax(_logits(h))) for h in range(heads)]
        ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(g * sp, d)
    elif sdpa_headpack and heads % 2 == 0:
        # VERDICT r5 #2(i) probe: pack two ADJACENT dh=64 heads into one
        # full-depth K=128 contraction via block-diagonal K/V assembly —
        # the decoder segment-matrix trick applied to the encoder SDPA.
        #   [Q_h1 | Q_h2] [sp, 2dh]  @  [[K_h1, 0], [0, K_h2]]^T [2dh, 2sp]
        #     = [Q_h1 K_h1^T | Q_h2 K_h2^T]   (zeros are additive identity)
        # and symmetrically for PV with [[V_h1, 0], [0, V_h2]] [2sp, 2dh].
        # Halves the SDPA op count and fills the MXU's K depth; the open
        # question this probe answers is whether that beats the assembly
        # cost and the doubled-N zero blocks (same systolic pass count by
        # the tile model — see docs/PERF.md round 5).
        zeros = jnp.zeros((sp, dh), x.dtype)

        def _sm(l):
            if masked:
                l = jnp.where(keep, l, NEG_INF)
            m = jnp.max(l, axis=-1, keepdims=True)
            pr = jnp.exp(l - m)
            return pr * (1.0 / jnp.sum(pr, axis=-1, keepdims=True))

        ctx_rows = []
        for b in range(g):
            outs = []
            for j in range(heads // 2):
                sl2 = slice(2 * j * dh, (2 * j + 2) * dh)
                q2 = q[b, :, sl2]  # [sp, 2dh]
                k2 = k[b, :, sl2]
                v2 = v[b, :, sl2]
                k_bd = jnp.concatenate(
                    [
                        jnp.concatenate([k2[:, :dh], zeros], axis=1),
                        jnp.concatenate([zeros, k2[:, dh:]], axis=1),
                    ],
                    axis=0,
                )  # [2sp, 2dh]
                logits2 = (
                    jax.lax.dot_general(
                        q2,
                        k_bd,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [sp, 2sp] = [head1 | head2] scores
                p12 = jnp.concatenate(
                    [_sm(logits2[:, :sp]), _sm(logits2[:, sp:])], axis=1
                )
                v_bd = jnp.concatenate(
                    [
                        jnp.concatenate([v2[:, :dh], zeros], axis=1),
                        jnp.concatenate([zeros, v2[:, dh:]], axis=1),
                    ],
                    axis=0,
                )  # [2sp, 2dh]
                outs.append(
                    jax.lax.dot_general(
                        p12.astype(x.dtype),
                        v_bd,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [sp, 2dh] = [ctx_h1 | ctx_h2]
            ctx_rows.append(jnp.concatenate(outs, axis=-1))
        ctx = jnp.stack(ctx_rows).reshape(g * sp, d)
    else:
        if sdpa_int8:
            # v quantized once per batch row, per OUTPUT column (weight-style:
            # the PV contraction runs over keys, so column scales factor out).
            # Scales run over VALID rows only: seq-pad garbage rows carry
            # arbitrary magnitudes that would coarsen every real value's step
            # (their probs are already softmax-zeroed, so zeroing here is free).
            v32 = v.astype(jnp.float32)
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, v32.shape, 1)
                v32 = jnp.where(row < valid_len, v32, 0.0)
            v_amax = jnp.maximum(
                jnp.max(jnp.abs(v32), axis=1, keepdims=True), 1e-8
            )  # [g, 1, d]
            v_scl = v_amax * (1.0 / 127.0)
            v_q = jnp.round(v32 * (127.0 / v_amax)).astype(jnp.int8)
        ctx_rows = []
        for b in range(g):
            outs = []
            for h in range(heads):
                sl = slice(h * dh, (h + 1) * dh)
                if sdpa_int8:
                    qq, sqr = _quant_rows(q[b, :, sl].astype(jnp.float32))
                    kq, skr = _quant_rows(k[b, :, sl].astype(jnp.float32))
                    acc = jax.lax.dot_general(
                        qq,
                        kq,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    logits = acc.astype(jnp.float32) * (sqr * scale) * skr.reshape(1, -1)
                else:
                    logits = (
                        jax.lax.dot_general(
                            q[b, :, sl],
                            k[b, :, sl],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        * scale
                    )
                if masked:
                    logits = jnp.where(keep, logits, NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
                if sdpa_int8:
                    pq, spr = _quant_rows(p)
                    acc = jax.lax.dot_general(
                        pq,
                        v_q[b, :, sl],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    outs.append(acc.astype(jnp.float32) * spr * v_scl[b, :, sl])
                else:
                    outs.append(
                        jax.lax.dot_general(
                            p.astype(x.dtype),
                            v[b, :, sl],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
            ctx_rows.append(jnp.concatenate(outs, axis=-1))
        ctx = jnp.stack(ctx_rows).reshape(g * sp, d)

    if int8:
        cq, csx = _quant_rows(ctx)
        acc = jax.lax.dot_general(
            cq, wo_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * csx * so_ref[:] + bo_ref[:]
    else:
        out = (
            jnp.dot(ctx.astype(x.dtype), wo_ref[:], preferred_element_type=jnp.float32)
            + bo_ref[:]
        )
    return x + out.astype(x.dtype).reshape(g, sp, d)


def _attn_layer_kernel(
    *args,
    eps: float,
    valid_len: int,
    heads: int,
    dh: int,
    int8: bool,
    batched_sdpa: bool = False,
    fuse_qkv: bool = False,
    sdpa_int8: bool = False,
    sdpa_headpack: bool = False,
):
    if fuse_qkv:
        (x_ref, wqkv_ref, wo_ref, sqkv_ref, so_ref, bqkv_ref, bo_ref,
         lns_ref, lnb_ref, o_ref) = args
        wq_ref, wk_ref, wv_ref = wqkv_ref, None, None
        sq_ref, sk_ref, sv_ref = sqkv_ref, None, None
        bq_ref, bk_ref, bv_ref = bqkv_ref, None, None
    else:
        (x_ref,
         wq_ref, wk_ref, wv_ref, wo_ref,
         sq_ref, sk_ref, sv_ref, so_ref,
         bq_ref, bk_ref, bv_ref, bo_ref,
         lns_ref, lnb_ref, o_ref) = args
    o_ref[:] = _attn_core(
        x_ref[:],
        wq_ref, wk_ref, wv_ref, wo_ref,
        sq_ref, sk_ref, sv_ref, so_ref,
        bq_ref, bk_ref, bv_ref, bo_ref,
        lns_ref, lnb_ref,
        eps=eps, valid_len=valid_len, heads=heads, dh=dh, int8=int8,
        batched_sdpa=batched_sdpa, fuse_qkv=fuse_qkv, sdpa_int8=sdpa_int8,
        sdpa_headpack=sdpa_headpack,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "eps", "interpret", "group", "batched_sdpa", "parallel_grid",
        "valid_len", "fuse_qkv", "sdpa_int8", "sdpa_headpack",
    ),
)
def fused_attn_layer(
    x: jax.Array,  # [B, S, D]
    p: dict,  # attn params: q/k/v/o denses (bf16 kernel or w_q+scale)
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    num_heads: int,
    eps: float = 1e-12,
    interpret: bool = False,
    group: int = 4,  # swept in-context on v5e: 4 (54.6 ms scan12) beats 8 (58.0)
    batched_sdpa: bool = False,
    parallel_grid: bool = False,  # mark the batch-block grid dim "parallel"
    valid_len: int | None = None,  # true token count when x is seq-padded
    fuse_qkv: bool = False,  # one [d, 3d] q‖k‖v matmul (bit-exact)
    sdpa_int8: bool = False,  # QK^T / PV on the int8 MXU path
    sdpa_headpack: bool = False,  # two dh=64 heads per K=128 contraction
) -> jax.Array:
    """x + Attention(LN(x)) in ONE kernel: no q/k/v/ctx HBM round-trips at
    all; projection matmuls on the int8 MXU path when params are quantized
    (``models.quantize.quantize_encoder(quantize_attn_proj=True)``).

    The sequence is NOT padded to a lane multiple: Pallas allows a block
    dim equal to the array dim, and Mosaic's internal tile padding (197→208
    sublanes) wastes 5.6% — versus the 30% the old explicit pad-to-256 paid
    on every projection matmul, plus two [B,S,D] pad/slice HBM round-trips
    per layer."""
    interpret = interpret or jax.default_backend() == "cpu"
    if sdpa_int8 and batched_sdpa:
        raise ValueError(
            "sdpa_int8 is implemented for the per-(batch, head) SDPA loop "
            "only; disable batched_sdpa (it would silently run bf16 SDPA)"
        )
    if sdpa_headpack and (sdpa_int8 or batched_sdpa):
        raise ValueError(
            "sdpa_headpack is exclusive with sdpa_int8/batched_sdpa "
            "(one SDPA formulation per kernel)"
        )
    b, s, d = x.shape
    dh = d // num_heads
    sp = s
    group = max(1, min(group, b))
    while b % group:
        group //= 2
    xp = x

    int8 = "w_q" in p["q"]
    if int8:
        ws = [p[k]["w_q"] for k in ("q", "k", "v", "o")]
        scales = [p[k]["scale"].astype(jnp.float32) for k in ("q", "k", "v", "o")]
    else:
        ws = [p[k]["kernel"].astype(x.dtype) for k in ("q", "k", "v", "o")]
        scales = [jnp.ones((d,), jnp.float32) for _ in range(4)]
    biases = [p[k]["bias"].astype(jnp.float32) for k in ("q", "k", "v", "o")]

    xs = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cw = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cv = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    if fuse_qkv:
        # concatenate q‖k‖v (cheap XLA op outside the kernel: ~1.7 MB int8)
        ws = [jnp.concatenate(ws[:3], axis=1), ws[3]]
        scales = [jnp.concatenate(scales[:3]), scales[3]]
        biases = [jnp.concatenate(biases[:3]), biases[3]]
        cw3 = pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM)
        cv3 = pl.BlockSpec((3 * d,), lambda i: (0,), memory_space=pltpu.VMEM)
        weight_specs = [cw3, cw, cv3, cv, cv3, cv, cv, cv]  # + ln scale/bias
    else:
        weight_specs = [cw] * 4 + [cv] * 10
    kernel = functools.partial(
        _attn_layer_kernel,
        eps=eps,
        valid_len=s if valid_len is None else valid_len,
        heads=num_heads,
        dh=dh,
        int8=int8,
        batched_sdpa=batched_sdpa,
        fuse_qkv=fuse_qkv,
        sdpa_int8=sdpa_int8,
        sdpa_headpack=sdpa_headpack,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[xs] + weight_specs,
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",) if parallel_grid else None,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * d * 4 + 2 * 2 * b * num_heads * sp * sp * dh,
            bytes_accessed=2 * b * sp * d * x.dtype.itemsize,
            transcendentals=b * num_heads * sp * sp,
        ),
    )(
        xp,
        *(
            [ws[0], ws[1], scales[0], scales[1], biases[0], biases[1]]
            if fuse_qkv
            else [*ws, *scales, *biases]
        ),
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
    )
    return out[:, :s, :]


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


# ---------------------------------------------------------------------------
# Merged encoder layer: attention block + MLP block in ONE kernel — the
# residual stream touches HBM once per layer instead of twice.
# ---------------------------------------------------------------------------


def _enc_layer_kernel(
    x_ref,
    wq_ref, wk_ref, wv_ref, wo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    bq_ref, bk_ref, bv_ref, bo_ref,
    l1s_ref, l1b_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    l2s_ref, l2b_ref,
    o_ref,
    *,
    eps: float,
    valid_len: int,
    heads: int,
    dh: int,
    int8: bool,
    gelu,
):
    x2 = _attn_core(
        x_ref[:],
        wq_ref, wk_ref, wv_ref, wo_ref,
        sq_ref, sk_ref, sv_ref, so_ref,
        bq_ref, bk_ref, bv_ref, bo_ref,
        l1s_ref, l1b_ref,
        eps=eps, valid_len=valid_len, heads=heads, dh=dh, int8=int8,
    )
    g, sp, d = x2.shape
    h32 = _ln32(x2, l2s_ref[:], l2b_ref[:], eps).reshape(g * sp, d)
    if int8:
        hq, sx = _quant_rows(h32)
        acc = jax.lax.dot_general(
            hq, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        h = acc.astype(jnp.float32) * sx * s1_ref[:] + b1_ref[:]
        h = gelu(h)
        hq2, sx2 = _quant_rows(h)
        acc2 = jax.lax.dot_general(
            hq2, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = acc2.astype(jnp.float32) * sx2 * s2_ref[:] + b2_ref[:]
    else:
        h = (
            jnp.dot(h32.astype(x2.dtype), w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[:]
        )
        h = gelu(h).astype(x2.dtype)
        out = (
            jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
        )
    o_ref[:] = x2 + out.astype(x2.dtype).reshape(g, sp, d)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "interpret", "group", "gelu_mode")
)
def fused_encoder_layer(
    x: jax.Array,  # [B, S, D]
    p: dict,  # layer params: attn{q,k,v,o}, ln1, ln2, mlp{fc1,fc2}
    num_heads: int,
    eps: float = 1e-12,
    interpret: bool = False,
    group: int = 2,
    gelu_mode: str = "erf",
) -> jax.Array:
    """One whole pre-LN ViT block — x += Attn(LN1(x)); x += MLP(LN2(x)) —
    as ONE kernel: the [B, S, D] residual stream reads/writes HBM once per
    layer instead of once per sub-block, and all weights sit VMEM-resident
    (int8 when quantized)."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, s, d = x.shape
    dh = d // num_heads
    group = max(1, min(group, b))
    while b % group:
        group //= 2

    attn = p["attn"]
    int8 = "w_q" in attn["q"]
    if int8:
        aws = [attn[k]["w_q"] for k in ("q", "k", "v", "o")]
        ascales = [attn[k]["scale"].astype(jnp.float32) for k in ("q", "k", "v", "o")]
    else:
        aws = [attn[k]["kernel"].astype(x.dtype) for k in ("q", "k", "v", "o")]
        ascales = [jnp.ones((d,), jnp.float32)] * 4
    abiases = [attn[k]["bias"].astype(jnp.float32) for k in ("q", "k", "v", "o")]
    fc1, fc2 = p["mlp"]["fc1"], p["mlp"]["fc2"]
    m_int8 = "w_q" in fc1
    assert m_int8 == int8, "attention and MLP must share the quantization mode"
    if int8:
        w1, s1 = fc1["w_q"], fc1["scale"].astype(jnp.float32)
        w2, s2 = fc2["w_q"], fc2["scale"].astype(jnp.float32)
    else:
        w1, s1 = fc1["kernel"].astype(x.dtype), jnp.ones((fc1["kernel"].shape[-1],), jnp.float32)
        w2, s2 = fc2["kernel"].astype(x.dtype), jnp.ones((d,), jnp.float32)
    i_dim = w1.shape[-1]

    xs = pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cw = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _enc_layer_kernel,
        eps=eps, valid_len=s, heads=num_heads, dh=dh, int8=int8,
        gelu=_gelu_fn(gelu_mode),
    )
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[xs]
        + [cw((d, d))] * 4
        + [cw((d,))] * 10
        + [cw((d, i_dim)), cw((i_dim,)), cw((i_dim,))]
        + [cw((i_dim, d)), cw((d,)), cw((d,))]
        + [cw((d,))] * 2,
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        *aws,
        *ascales,
        *abiases,
        p["ln1"]["scale"].astype(jnp.float32), p["ln1"]["bias"].astype(jnp.float32),
        w1, s1, fc1["bias"].astype(jnp.float32),
        w2, s2, fc2["bias"].astype(jnp.float32),
        p["ln2"]["scale"].astype(jnp.float32), p["ln2"]["bias"].astype(jnp.float32),
    )
