"""Multi-layer fused encoder stack: N ViT blocks per Pallas kernel.

Round-2 measurement (docs/PERF.md, scripts/perf_compose.py): the per-layer
serving kernels run at ~45% of int8 MXU peak *in context* — isolated-kernel
slopes (attn 1.27 + MLP 1.12 ms) undercount the real 12-layer stacked-weight
scan (54.7 ms, i.e. ~4.56 ms/layer) by ~2.2 ms/layer.  The loss sits at the
kernel boundaries: every pallas_call serializes its prologue (weight + first
x-block DMA) against the previous call's epilogue, 24 times per dispatch.

This kernel removes those boundaries by running ``lpc`` whole encoder layers
(attention + MLP, pre-LN ViT block semantics, int8 W8A8 or bf16) inside ONE
``pallas_call``:

- grid = (B/group,): each program carries its [group, S, D] residual block
  through all ``lpc`` layers entirely in VMEM — the intermediate hidden
  states between fused layers never touch HBM,
- the ``lpc`` layers' weights are blocks of the parameter-stacked [L, ...]
  arrays (block index ``c`` on the stacked axis), VMEM-resident across the
  whole grid (constant-per-call index maps → fetched once per call),
- layer loop inside the kernel is a static Python unroll over ``lpc``
  (static weight-slab indices — Mosaic cannot relayout dynamic slabs).

``lpc`` trades VMEM for boundary elimination: int8 weights are ~7.1 MB per
layer (attn 2.36 + MLP 4.72), so lpc=12 (the whole encoder in one kernel)
wants ~85 MB of resident weights + ~20 MB working set.  The sweep script
(scripts/perf_encoder_stack.py) picks the largest ``lpc`` the hardware
compiles and runs fastest; the config plumbs it via
``EncoderConfig.stack_layers_per_call``.

Reference path this accelerates: the black-box per-crop ViT encoder forward
inside ``manga_ocr`` (``/root/reference/src/ui/main_window.py:9801``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.ops.kernel_utils import gelu_fn as _gelu_fn
from manga_ocr_tpu.ops.kernel_utils import ln32 as _ln32
from manga_ocr_tpu.ops.kernel_utils import pick_group
from manga_ocr_tpu.ops.kernel_utils import quant_rows as _quant_rows




def _one_layer(
    x,  # [g, sp, d] compute-dtype residual stream (in VMEM registers)
    j: int,  # static layer index within this call's slab
    refs: dict,  # name -> Ref over the [lpc, ...] weight slabs
    *,
    eps: float,
    heads: int,
    dh: int,
    int8: bool,
    gelu,
):
    """x += Attn(LN1(x)); x += MLP(LN2(x)) for one layer, slab row ``j``."""
    g, sp, d = x.shape
    scale = 1.0 / (dh**0.5)

    def proj(h_rows, sx, name):
        """rows [g*sp, d_in] (int8 or dtype) -> [g, sp, d_out]."""
        w = refs[name][j]
        if int8:
            acc = jax.lax.dot_general(
                h_rows, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * sx * refs[f"{name}_s"][j] + refs[f"{name}_b"][j]
        else:
            y = (
                jnp.dot(h_rows, w, preferred_element_type=jnp.float32)
                + refs[f"{name}_b"][j]
            )
        return y

    # ---- attention half ----------------------------------------------------
    h32 = _ln32(x, refs["ln1_s"][j], refs["ln1_b"][j], eps).reshape(g * sp, d)
    if int8:
        hq, sx = _quant_rows(h32)
    else:
        hq, sx = h32.astype(x.dtype), None
    q = proj(hq, sx, "wq").astype(x.dtype).reshape(g, sp, d)
    k = proj(hq, sx, "wk").astype(x.dtype).reshape(g, sp, d)
    v = proj(hq, sx, "wv").astype(x.dtype).reshape(g, sp, d)

    ctx_rows = []
    for b in range(g):
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            logits = (
                jax.lax.dot_general(
                    q[b, :, sl], k[b, :, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    p.astype(x.dtype), v[b, :, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        ctx_rows.append(jnp.concatenate(outs, axis=-1))
    ctx = jnp.stack(ctx_rows).reshape(g * sp, d)

    if int8:
        cq, csx = _quant_rows(ctx)
        out = proj(cq, csx, "wo")
    else:
        out = proj(ctx.astype(x.dtype), None, "wo")
    x = x + out.astype(x.dtype).reshape(g, sp, d)

    # ---- MLP half ----------------------------------------------------------
    h32 = _ln32(x, refs["ln2_s"][j], refs["ln2_b"][j], eps).reshape(g * sp, d)
    if int8:
        hq, sx = _quant_rows(h32)
        h = proj(hq, sx, "w1")
        h = gelu(h)
        hq2, sx2 = _quant_rows(h)
        out = proj(hq2, sx2, "w2")
    else:
        h = proj(h32.astype(x.dtype), None, "w1")
        h = gelu(h).astype(x.dtype)
        out = proj(h, None, "w2")
    return x + out.astype(x.dtype).reshape(g, sp, d)


def _stack_kernel(*args, lpc: int, eps, heads, dh, int8, gelu, names):
    x_ref = args[0]
    o_ref = args[-1]
    refs = dict(zip(names, args[1:-1]))
    x = x_ref[:]
    for j in range(lpc):
        x = _one_layer(
            x, j, refs, eps=eps, heads=heads, dh=dh, int8=int8, gelu=gelu
        )
    o_ref[:] = x


@functools.partial(
    jax.jit,
    static_argnames=(
        "names", "num_heads", "eps", "interpret", "group", "gelu_mode", "lpc",
        "int8", "vmem_mb",
    ),
)
def _stack_call(
    x: jax.Array,  # [B, S, D]
    slabs: tuple,  # weight slab arrays in `names` order, leading dim = lpc
    names: tuple,
    num_heads: int,
    eps: float,
    lpc: int,
    int8: bool,
    interpret: bool = False,
    group: int = 4,
    gelu_mode: str = "erf",
    vmem_mb: int = 128,
):
    b, s, d = x.shape
    dh = d // num_heads
    group = pick_group(b, group)
    xs = pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, _n=len(shape): tuple(0 for _ in range(_n)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [xs] + [const_spec(a.shape) for a in slabs]
    kernel = functools.partial(
        _stack_kernel,
        lpc=lpc, eps=eps, heads=num_heads, dh=dh, int8=int8,
        gelu=_gelu_fn(gelu_mode), names=names,
    )
    nflops = 2 * b * s * d * d * 4 + 2 * b * s * d * 3072 * 2  # per layer approx
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=lpc * (nflops + 2 * 2 * b * num_heads * s * s * dh),
            bytes_accessed=2 * b * s * d * x.dtype.itemsize
            + sum(a.size * a.dtype.itemsize for a in slabs),
            transcendentals=lpc * b * num_heads * s * s,
        ),
    )(x, *slabs)


def _dense_slab(p: dict, sl: slice, dtype):
    """(weight, scale, bias) slab triplet for a stacked dense param."""
    if "w_q" in p:
        return (
            p["w_q"][sl],
            p["scale"][sl].astype(jnp.float32),
            p["bias"][sl].astype(jnp.float32),
        )
    k = p["kernel"][sl].astype(dtype)
    return (
        k,
        jnp.ones(k.shape[:1] + k.shape[-1:], jnp.float32),
        p["bias"][sl].astype(jnp.float32),
    )


def encoder_stack(
    x: jax.Array,  # [B, S, D]
    layers: dict,  # parameter-stacked layer tree (vit.init_params["layers"])
    num_heads: int,
    eps: float = 1e-12,
    lpc: int = 12,
    interpret: bool = False,
    group: int = 4,
    gelu_mode: str = "erf",
    vmem_mb: int = 128,
) -> jax.Array:
    """Run all encoder layers as ceil(L / lpc) multi-layer Pallas calls."""
    interpret = interpret or jax.default_backend() == "cpu"
    num_layers = layers["ln1"]["scale"].shape[0]
    int8 = "w_q" in layers["attn"]["q"]
    names = (
        "wq", "wq_s", "wq_b", "wk", "wk_s", "wk_b",
        "wv", "wv_s", "wv_b", "wo", "wo_s", "wo_b",
        "ln1_s", "ln1_b",
        "w1", "w1_s", "w1_b", "w2", "w2_s", "w2_b",
        "ln2_s", "ln2_b",
    )
    for c0 in range(0, num_layers, lpc):
        sl = slice(c0, min(c0 + lpc, num_layers))
        n = sl.stop - sl.start
        attn = layers["attn"]
        slabs = (
            *_dense_slab(attn["q"], sl, x.dtype),
            *_dense_slab(attn["k"], sl, x.dtype),
            *_dense_slab(attn["v"], sl, x.dtype),
            *_dense_slab(attn["o"], sl, x.dtype),
            layers["ln1"]["scale"][sl].astype(jnp.float32),
            layers["ln1"]["bias"][sl].astype(jnp.float32),
            *_dense_slab(layers["mlp"]["fc1"], sl, x.dtype),
            *_dense_slab(layers["mlp"]["fc2"], sl, x.dtype),
            layers["ln2"]["scale"][sl].astype(jnp.float32),
            layers["ln2"]["bias"][sl].astype(jnp.float32),
        )
        x = _stack_call(
            x, slabs, names, num_heads, eps, n, int8,
            interpret=interpret, group=group, gelu_mode=gelu_mode,
            vmem_mb=vmem_mb,
        )
    return x
