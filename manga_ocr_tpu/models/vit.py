"""ViT image encoder (TPU-native, pure-functional JAX).

Numerically equivalent to the HF ``ViTModel`` the reference's black-box
``manga_ocr`` engine wraps (invoked at
``/root/reference/src/ui/main_window.py:9801``), but designed TPU-first:

- the patch embedding is a reshape + one big matmul (stride == kernel, so the
  conv *is* a matmul — pure MXU work, no im2col),
- the 12 transformer blocks are parameter-stacked and driven by ``lax.scan``
  (one compiled block body instead of 12 unrolled ones),
- layer norm / softmax statistics run in float32 while matmuls run in the
  compute dtype (bf16 on TPU) with f32 accumulation.

Pre-LN blocks: x += MHA(LN(x)); x += MLP(LN(x)); final LN at the top.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models.config import EncoderConfig
from manga_ocr_tpu.ops.common import dense, dense_any, gelu, layer_norm, mha


def patch_embed(params: dict, pixel_values: jax.Array, cfg: EncoderConfig) -> jax.Array:
    """[B, H, W, C] -> [B, N, D] via reshape + matmul (MXU-only patch conv)."""
    b, h, w, c = pixel_values.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = pixel_values.reshape(b, gh, p, gw, p, c)
    # -> [B, gh, gw, p, p, c]: flatten per-patch pixels in (row, col, chan)
    # order to match an HWIO conv kernel flattened the same way.
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    kernel = params["kernel"].reshape(p * p * c, cfg.hidden_size)
    return dense(x, kernel, params["bias"])


def _attention(h: jax.Array, lp: dict, cfg: EncoderConfig, fused: bool) -> jax.Array:
    if cfg.attn_kernel == "packed":
        from manga_ocr_tpu.ops.flash_attention import mha_packed

        return mha_packed(h, h, lp["attn"], cfg.num_heads)
    if fused:
        from manga_ocr_tpu.ops.flash_attention import mha_fused

        return mha_fused(h, h, lp["attn"], cfg.num_heads)
    return mha(h, h, lp["attn"], cfg.num_heads)


def _mlp(x: jax.Array, lp: dict, cfg: EncoderConfig) -> jax.Array:
    """LN → fc1 → GELU → fc2 → +residual (the block's second half)."""
    if cfg.mlp_kernel == "fused":
        from manga_ocr_tpu.ops.fused_mlp import fused_mlp_block

        fc1, fc2 = lp["mlp"]["fc1"], lp["mlp"]["fc2"]
        w1 = (fc1["w_q"], fc1["scale"]) if "w_q" in fc1 else fc1["kernel"]
        w2 = (fc2["w_q"], fc2["scale"]) if "w_q" in fc2 else fc2["kernel"]
        return fused_mlp_block(
            x,
            lp["ln2"]["scale"],
            lp["ln2"]["bias"],
            w1,
            fc1["bias"],
            w2,
            fc2["bias"],
            eps=cfg.layer_norm_eps,
            gelu_mode=cfg.gelu_mode,
            parallel_grid=cfg.parallel_grid,
            subtiles=cfg.mlp_subtiles,
            tile_m=cfg.mlp_tile_m,
        )
    h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    h = dense_any(h, lp["mlp"]["fc1"])
    h = gelu(h)
    h = dense_any(h, lp["mlp"]["fc2"])
    return x + h


def encoder_block(
    x: jax.Array, lp: dict, cfg: EncoderConfig, fused: bool = False
) -> jax.Array:
    """One pre-LN ViT block."""
    if cfg.attn_kernel == "merged_layer":
        # whole block (attn + MLP) in one kernel; cfg.mlp_kernel is ignored
        from manga_ocr_tpu.ops.flash_attention import fused_encoder_layer

        return fused_encoder_layer(
            x, lp, cfg.num_heads, eps=cfg.layer_norm_eps, gelu_mode=cfg.gelu_mode
        )
    if cfg.attn_kernel == "fused_layer":
        from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

        x = fused_attn_layer(
            x,
            lp["attn"],
            lp["ln1"]["scale"],
            lp["ln1"]["bias"],
            cfg.num_heads,
            eps=cfg.layer_norm_eps,
            parallel_grid=cfg.parallel_grid,
            batched_sdpa=cfg.batched_sdpa,
            fuse_qkv=cfg.attn_fuse_qkv,
            sdpa_int8=cfg.attn_sdpa_int8,
            sdpa_headpack=cfg.attn_sdpa_headpack,
            group=cfg.attn_group,
            # x may be seq-padded past seq_len (cfg.seq_pad_to): mask the
            # padded key columns out of the softmax
            valid_len=min(cfg.seq_len, x.shape[1]),
        )
        return _mlp(x, lp, cfg)
    h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    x = x + _attention(h, lp, cfg, fused)
    return _mlp(x, lp, cfg)


def _default_fused() -> bool:
    """Whether to use the Pallas fused-attention kernel by default.

    Currently off: measured on v5e, the per-(batch,head) grid kernel is
    ~40% slower than XLA's attention at manga-ocr shapes (1536 tiny
    programs underutilize the MXU).  The kernel + parity tests stay for
    iteration; flip per-call via ``encode(..., fused_attention=True)``."""
    return False


def encode(
    params: dict,
    pixel_values: jax.Array,
    cfg: EncoderConfig,
    dtype: jnp.dtype | None = None,
    fused_attention: bool | None = None,
    unroll_layers: bool = False,
    raw_padded: bool = False,
) -> jax.Array:
    """Full encoder forward: [B, H, W, C] normalized pixels -> [B, S, D]
    hidden states (S = num_patches + 1 CLS token).

    ``raw_padded``: return the post-stack hidden states BEFORE the final
    LayerNorm and before slicing off the ``seq_pad_to`` alignment rows —
    for the fuse_cross_kv decode path, which applies the final LN and the
    cross-k/v projections inside the decode mega-kernel (padded rows are
    finite row-local garbage; the consumer masks them by valid length).

    ``dtype``: compute dtype; defaults to the input's dtype (bf16 pixels →
    bf16 encoder).  Round-1 hardcoded float32 here, silently upcasting the
    whole serving encoder — worth ~2x.

    ``unroll_layers``: run the blocks unrolled instead of under ``lax.scan``.
    Measured end-to-end neutral on v5e (1362 vs 1371 crops/s) with a 3x
    longer compile — kept as an experiment flag, default off."""
    fused = _default_fused() if fused_attention is None else fused_attention
    if dtype is None:
        dtype = pixel_values.dtype
        if not jnp.issubdtype(dtype, jnp.floating):
            dtype = jnp.float32
    x = patch_embed(params["patch_embed"], pixel_values.astype(dtype), cfg)
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    # 8-aligned token dim through the fused stack (cfg.seq_pad_to, serving
    # sets 200): one pad here + one slice at the end replace a real
    # [B,197,D]⇄[B·197,D] relayout around EVERY MLP kernel (~0.61 ms/layer
    # profiler-measured at B=256).  Padded rows are row-local garbage —
    # attention masks their key columns (valid_len) — and are sliced off.
    s_true = x.shape[1]
    seq_padded = cfg.attn_kernel == "fused_layer" and cfg.seq_pad_to > s_true
    if seq_padded:
        x = jnp.pad(x, ((0, 0), (0, cfg.seq_pad_to - s_true), (0, 0)))

    if cfg.attn_kernel == "stacked":
        # multi-layer resident-weight kernel: the whole stack (or VMEM-sized
        # slabs of it) runs inside Pallas; no lax.scan, no per-layer
        # kernel-boundary serialization (ops/encoder_stack.py)
        from manga_ocr_tpu.ops.encoder_stack import encoder_stack

        x = encoder_stack(
            x,
            params["layers"],
            cfg.num_heads,
            eps=cfg.layer_norm_eps,
            lpc=cfg.stack_lpc,
            gelu_mode=cfg.gelu_mode,
        )
    elif unroll_layers:
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            x = encoder_block(x, lp, cfg, fused)
    else:
        def body(carry, lp):
            return encoder_block(carry, lp, cfg, fused), None

        x, _ = jax.lax.scan(body, x, params["layers"])

    if raw_padded:
        return x
    if seq_padded:
        x = x[:, :s_true]
    return layer_norm(
        x, params["final_ln"]["scale"], params["final_ln"]["bias"], cfg.layer_norm_eps
    )


def init_params(cfg: EncoderConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random init with HF-like scales (for tests / benchmarks without a
    checkpoint)."""
    ks = jax.random.split(key, 8)
    d, i, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p = cfg.patch_size

    def w(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def ln(_):
        return {"scale": jnp.ones((l, d), dtype), "bias": jnp.zeros((l, d), dtype)}

    def proj(key, din, dout):
        return {"kernel": w(key, (l, din, dout)), "bias": jnp.zeros((l, dout), dtype)}

    kk = jax.random.split(ks[4], 6)
    return {
        "patch_embed": {
            "kernel": w(ks[0], (p, p, cfg.num_channels, d)),
            "bias": jnp.zeros((d,), dtype),
        },
        "cls_token": w(ks[1], (1, 1, d)),
        "pos_embed": w(ks[2], (1, cfg.seq_len, d)),
        "layers": {
            "ln1": ln(None),
            "attn": {
                "q": proj(kk[0], d, d),
                "k": proj(kk[1], d, d),
                "v": proj(kk[2], d, d),
                "o": proj(kk[3], d, d),
            },
            "ln2": ln(None),
            "mlp": {"fc1": proj(kk[4], d, i), "fc2": proj(kk[5], i, d)},
        },
        "final_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
