"""BERT-style autoregressive text decoder with cross-attention + KV cache.

Numerically equivalent to the HF ``BertLMHeadModel`` decoder inside the
reference's black-box manga-ocr engine (``/root/reference/src/ui/
main_window.py:9801``), re-designed TPU-first:

- a *preallocated, static-shape* per-layer KV cache updated in place via
  ``dynamic_update_slice`` — no dynamic shapes anywhere, so the whole
  greedy loop compiles to a single XLA while-loop,
- cross-attention K/V are projected from the encoder output **once** before
  the decode loop and reused by every step (the dominant per-step matmul
  saving for a 2-layer decoder),
- layer norm / softmax in float32; matmuls in compute dtype with f32
  accumulation.

Post-LN blocks (BERT): x = LN(x + SelfAttn(x)); x = LN(x + CrossAttn(x));
x = LN(x + MLP(x)).  LM head: dense+gelu+LN transform, then vocab projection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models.config import DecoderConfig
from manga_ocr_tpu.ops.common import (
    NEG_INF,
    attention_scores,
    dense,
    gelu,
    layer_norm,
    merge_heads,
    mha,
    split_heads,
)


class KVCache(NamedTuple):
    """Static-shape self-attention cache: a tuple of per-layer buffers (see
    ``init_cache`` for the layout and the tuple-vs-stacked rationale)."""

    k: tuple  # L x [B, H, max_len, dh] (XLA) or L x [max_len, B, D] (fused)
    v: tuple


class CrossKV(NamedTuple):
    """Per-layer cross-attention K/V projected from encoder output.

    Layout [L, B, H, dh, S]: encoder positions on the minor (lane) axis.
    Measured fastest for the per-step einsums on v5e (~25% over
    [B, S, H, dh] / [B, H, S, dh]) — the contraction axes land on
    hardware-friendly dims for both the score and context products.

    Optional int8 form (``k_scale``/``v_scale`` set): every decode step
    re-reads the whole cross-K/V from HBM (~310 MB/step at B=256 — the
    decode bandwidth floor), so storing it int8 halves the dominant decode
    traffic; the dequant multiplies land AFTER the contractions (per-S for
    scores, per-dh for context) and XLA fuses the int8→bf16 cast into the
    einsum reads.  K quantizes over dh per (b, h, s); V over S per (b, h, d).
    """

    k: jax.Array  # [L, B, H, dh, S_enc] (bf16, or int8 when k_scale is set)
    v: jax.Array  # [L, B, H, dh, S_enc]
    k_scale: jax.Array | None = None  # [L, B, H, S_enc] f32
    v_scale: jax.Array | None = None  # [L, B, H, dh] f32


class CrossKVPacked(NamedTuple):
    """Cross-attention K/V in the fused-kernel layout: heads merged, straight
    from the projections (no head transpose at all).

    k/v: [L, B, S, D] (int8 when scales set); k_scale [L, B, S] f32
    (per-token row quantization over D); v_scale [L, B, D] f32 (per-channel
    over S).  The dequant multiplies land after the segment contractions in
    ``ops.decode_layer.fused_cross_attn_step``."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None


def init_cache(
    cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.float32
) -> KVCache:
    """Cache layout follows the step kernel: the XLA path reads
    [L, B, H, T, dh]; the fused step kernel uses the packed [L, T, B, D]
    layout so the per-step K/V insert is one contiguous 2-D [B, D] store at
    sublane index ``step`` (Mosaic cannot lower the strided 4-D store the
    XLA layout would need).

    The per-layer buffers are a TUPLE (not a stacked [L, ...] array): the
    decode loop then updates each layer's cache buffer directly, with no
    per-step ``cache[l]`` slice / ``.at[l].set`` ops — every XLA op in the
    step body costs ~12 us of launch overhead (docs/PERF.md).
    """
    if cfg.step_kernel == "fused_layer":
        shape = (max_len, batch, cfg.hidden_size)
    else:
        shape = (batch, cfg.num_heads, max_len, cfg.head_dim)
    zeros = lambda: tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers))
    return KVCache(zeros(), zeros())


def embed(
    params: dict, tokens: jax.Array, position_offset, cfg: DecoderConfig
) -> jax.Array:
    """BERT embeddings: word + absolute position + token-type(0), then LN.

    ``tokens``: [B, S] int32; ``position_offset``: scalar (0 for full-sequence
    forward, current step for incremental decode).
    """
    s = tokens.shape[-1]
    we = params["tok_embed"][tokens]
    positions = position_offset + jnp.arange(s)
    pe = params["pos_embed"][positions]
    x = we + pe + params["tok_type"]
    return layer_norm(
        x, params["emb_ln"]["scale"], params["emb_ln"]["bias"], cfg.layer_norm_eps
    )


def precompute_cross_kv(
    params: dict, enc_out: jax.Array, cfg: DecoderConfig, int8: bool | None = None
) -> CrossKV:
    """Project encoder hidden states to per-layer cross-attention K/V once.

    One [B,S,H,dh]→[B,H,dh,S] relayout per layer here (amortized over every
    decode step) buys the fastest per-step einsum layout — see ``CrossKV``.
    ``int8`` (default ``cfg.cross_kv_int8``) stores the result quantized."""
    if int8 is None:
        int8 = cfg.cross_kv_int8
    b, s, _ = enc_out.shape
    ks, vs = [], []
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda x: x[l], params["layers"]["cross_attn"])
        k = dense(enc_out, lp["k"]["kernel"], lp["k"]["bias"])
        v = dense(enc_out, lp["v"]["kernel"], lp["v"]["bias"])
        k = k.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 3, 1)
        v = v.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 3, 1)
        ks.append(k)
        vs.append(v)
    k_all, v_all = jnp.stack(ks), jnp.stack(vs)
    if not int8:
        return CrossKV(k_all, v_all)
    # K: quantize over dh (axis -2), per (l, b, h, s) — dequant after the
    # score contraction; V: over S (axis -1), per (l, b, h, d).
    k32, v32 = k_all.astype(jnp.float32), v_all.astype(jnp.float32)
    k_scale = jnp.maximum(jnp.max(jnp.abs(k32), axis=-2), 1e-8) / 127.0
    v_scale = jnp.maximum(jnp.max(jnp.abs(v32), axis=-1), 1e-8) / 127.0
    k_q = jnp.clip(jnp.round(k32 / k_scale[..., None, :]), -127, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(v32 / v_scale[..., None]), -127, 127).astype(jnp.int8)
    return CrossKV(k_q, v_q, k_scale, v_scale)


def precompute_cross_kv_packed(
    params: dict, enc_out: jax.Array, cfg: DecoderConfig, int8: bool | None = None
) -> CrossKVPacked:
    """Cross-K/V in the fused-kernel packed layout [L, B, S, D] — straight
    from the dense projections, no head relayout at all.

    K quantizes per (l, b, s) row over D; V per (l, b, d) channel over S —
    see ``CrossKVPacked``."""
    if int8 is None:
        int8 = cfg.cross_kv_int8
    # All 2L projections consume the same enc_out: run them as ONE wide
    # [D, 2L*D] matmul (bit-exact — ``dense`` is column-independent, so
    # concatenating output columns changes nothing per column) instead of
    # 2L serial [D, D] ops.  Shaves tail ops between the encoder scan and
    # the decode kernel.
    ca = params["layers"]["cross_attn"]
    wk, wv = ca["k"]["kernel"], ca["v"]["kernel"]  # [L, D, Dk]
    bk, bv = ca["k"]["bias"], ca["v"]["bias"]  # [L, Dk]
    n_l, d_in, d_out = wk.shape
    w_all = jnp.swapaxes(jnp.concatenate([wk, wv], axis=0), 0, 1)
    w_all = w_all.reshape(d_in, 2 * n_l * d_out)
    b_all = jnp.concatenate([bk, bv], axis=0).reshape(2 * n_l * d_out)
    y = dense(enc_out, w_all, b_all)  # [B, S, 2L*Dk]
    y = y.reshape(*enc_out.shape[:-1], 2 * n_l, d_out)
    kv = jnp.moveaxis(y, -2, 0)  # [2L, B, S, Dk]
    k_all, v_all = kv[:n_l], kv[n_l:]  # [L, B, S, D]
    if not int8:
        return CrossKVPacked(k_all, v_all)
    k32, v32 = k_all.astype(jnp.float32), v_all.astype(jnp.float32)
    k_scale = jnp.maximum(jnp.max(jnp.abs(k32), axis=-1), 1e-8) / 127.0  # [L,B,S]
    v_scale = jnp.maximum(jnp.max(jnp.abs(v32), axis=-2), 1e-8) / 127.0  # [L,B,D]
    k_q = jnp.clip(jnp.round(k32 / k_scale[..., None]), -127, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(v32 / v_scale[..., None, :]), -127, 127).astype(jnp.int8)
    return CrossKVPacked(k_q, v_q, k_scale, v_scale)


def _post_ln_block(x, residual, ln, eps):
    return layer_norm(x + residual, ln["scale"], ln["bias"], eps)


def forward_full(
    params: dict,
    tokens: jax.Array,
    enc_out: jax.Array,
    cfg: DecoderConfig,
    attention_mask: jax.Array | None = None,
) -> jax.Array:
    """Teacher-forcing forward over a full sequence -> logits [B, S, V].

    Causal self-attention; full cross-attention over encoder states.  Used by
    parity tests and (later) training; the serving path is the incremental
    decode below.
    """
    b, s = tokens.shape
    x = embed(params, tokens, 0, cfg).astype(enc_out.dtype)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    if attention_mask is not None:
        causal = jnp.logical_and(causal, attention_mask[:, None, None, :])

    def body(carry, lp):
        x = carry
        sa = mha(x, x, lp["self_attn"], cfg.num_heads, mask=causal)
        x = _post_ln_block(sa, x, lp["self_ln"], cfg.layer_norm_eps)
        ca = mha(x, enc_out, lp["cross_attn"], cfg.num_heads)
        x = _post_ln_block(ca, x, lp["cross_ln"], cfg.layer_norm_eps)
        h = gelu(dense(x, lp["mlp"]["fc1"]["kernel"], lp["mlp"]["fc1"]["bias"]))
        h = dense(h, lp["mlp"]["fc2"]["kernel"], lp["mlp"]["fc2"]["bias"])
        x = _post_ln_block(h, x, lp["mlp_ln"], cfg.layer_norm_eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return lm_head(params, x, cfg)


def lm_head(params: dict, x: jax.Array, cfg: DecoderConfig) -> jax.Array:
    """Prediction head: dense + gelu + LN transform, then vocab projection.
    Returns float32 logits."""
    t = params["head"]["transform"]
    x = gelu(dense(x, t["dense"]["kernel"], t["dense"]["bias"]))
    x = layer_norm(x, t["ln"]["scale"], t["ln"]["bias"], cfg.layer_norm_eps)
    p = params["head"]["proj"]
    logits = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return logits + p["bias"].astype(jnp.float32)


def decode_step(
    params: dict,
    token: jax.Array,  # [B] int32 — the most recent token
    step: jax.Array,  # scalar int32 — its position in the sequence
    cache: KVCache,
    cross_kv: CrossKV,
    cfg: DecoderConfig,
) -> tuple[jax.Array, KVCache]:
    """One incremental decode step -> (logits [B, V] f32, updated cache).

    Serving-optimized: hidden state stays 2-D [B, D]; layers are a static
    Python loop (the decoder is 2 layers — stacked-scan per-step overhead
    costs more than it saves); attention works directly on the cache/cross
    layouts with einsums, no head-transpose materialization."""
    x, cache = decode_hidden(params, token, step, cache, cross_kv, cfg)
    return lm_head(params, x, cfg), cache


def decode_step_greedy(
    params: dict,
    token: jax.Array,
    step: jax.Array,
    cache: KVCache,
    cross_kv: CrossKV,
    cfg: DecoderConfig,
) -> tuple[jax.Array, KVCache]:
    """One greedy decode step -> (next token ids [B] int32, updated cache).

    With ``cfg.head_kernel == "fused"`` the LM head runs as one Pallas
    kernel (transform+GELU+LN+tiled vocab matmul+argmax, ``ops.fused_head``)
    — the [B, V] float32 logits never round-trip HBM."""
    x, cache = decode_hidden(params, token, step, cache, cross_kv, cfg)
    if cfg.head_kernel == "fused":
        from manga_ocr_tpu.ops.fused_head import fused_greedy_head

        t = params["head"]["transform"]
        p = params["head"]["proj"]
        nxt = fused_greedy_head(
            x,
            t["dense"]["kernel"],
            t["dense"]["bias"],
            t["ln"]["scale"],
            t["ln"]["bias"],
            p["kernel"],
            p["bias"],
            eps=cfg.layer_norm_eps,
        )
        return nxt, cache
    logits = lm_head(params, x, cfg)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def decode_hidden(
    params: dict,
    token: jax.Array,
    step: jax.Array,
    cache: KVCache,
    cross_kv: CrossKV,
    cfg: DecoderConfig,
) -> tuple[jax.Array, KVCache]:
    """Decode step up to (excluding) the LM head -> (hidden [B, D], cache)."""
    if cfg.step_kernel == "fused_layer":
        return _decode_hidden_fused(params, token, step, cache, cross_kv, cfg)
    h_, dh = cfg.num_heads, cfg.head_dim
    x = embed(params, token[:, None], step, cfg)[:, 0, :].astype(cache.k[0].dtype)
    b = x.shape[0]
    max_len = cache.k[0].shape[-2]
    valid = (jnp.arange(max_len) <= step)[None, None, :]  # [1,1,T]
    ck_all, cv_all = cache.k, cache.v  # per-layer tuples

    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda t: t[l], params["layers"])
        # -- causal self-attention against the running cache ----------------
        # q/k/v as ONE [D, 3D] matmul: the concat is loop-invariant (XLA
        # hoists it out of the decode while-loop) and saves two of the ~50
        # per-step op launches whose fixed cost dominates decode time.
        sa = lp["self_attn"]
        wqkv = jnp.concatenate(
            [sa[n]["kernel"] for n in ("q", "k", "v")], axis=1
        )
        bqkv = jnp.concatenate([sa[n]["bias"] for n in ("q", "k", "v")])
        qkv = dense(x, wqkv, bqkv)
        d_ = h_ * dh
        q = qkv[:, :d_].reshape(b, h_, dh)
        k_new = qkv[:, d_ : 2 * d_].reshape(b, h_, 1, dh)
        v_new = qkv[:, 2 * d_ :].reshape(b, h_, 1, dh)
        ck = jax.lax.dynamic_update_slice_in_dim(ck_all[l], k_new, step, axis=-2)
        cv = jax.lax.dynamic_update_slice_in_dim(cv_all[l], v_new, step, axis=-2)
        ck_all = ck_all[:l] + (ck,) + ck_all[l + 1 :]
        cv_all = cv_all[:l] + (cv,) + cv_all[l + 1 :]
        scores = jnp.einsum(
            "bhd,bhtd->bht", q, ck, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        probs = jax.nn.softmax(jnp.where(valid, scores, NEG_INF), axis=-1)
        ctx = jnp.einsum(
            "bht,bhtd->bhd", probs.astype(cv.dtype), cv,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(b, h_ * dh)
        out = dense(ctx, sa["o"]["kernel"], sa["o"]["bias"])
        x = _post_ln_block(out, x, lp["self_ln"], cfg.layer_norm_eps)
        # -- cross-attention over precomputed encoder K/V ([B,H,dh,S]) -------
        ca = lp["cross_attn"]
        q = dense(x, ca["q"]["kernel"], ca["q"]["bias"]).reshape(b, h_, dh)
        ck_l, cv_l = cross_kv.k[l], cross_kv.v[l]
        if cross_kv.k_scale is not None:
            # int8 K/V: the int8->compute cast fuses into the einsum reads
            # (halved HBM traffic); dequant scales apply post-contraction.
            cs = jnp.einsum(
                "bhd,bhds->bhs",
                q,
                ck_l.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * cross_kv.k_scale[l]
        else:
            cs = jnp.einsum(
                "bhd,bhds->bhs", q, ck_l, preferred_element_type=jnp.float32
            )
        cs = cs / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        cp = jax.nn.softmax(cs, axis=-1)
        cctx = jnp.einsum(
            "bhs,bhds->bhd",
            cp.astype(x.dtype),
            cv_l.astype(x.dtype) if cross_kv.v_scale is not None else cv_l,
            preferred_element_type=jnp.float32,
        )
        if cross_kv.v_scale is not None:
            cctx = cctx * cross_kv.v_scale[l]
        cctx = cctx.astype(x.dtype).reshape(b, h_ * dh)
        out = dense(cctx, ca["o"]["kernel"], ca["o"]["bias"])
        x = _post_ln_block(out, x, lp["cross_ln"], cfg.layer_norm_eps)
        # -- MLP ---------------------------------------------------------------
        if cfg.step_mlp_kernel == "fused":
            # post-LN block LN(x + MLP(x)): the fused kernel computes
            # x + MLP(x) (pre_ln off), LN applied after.
            from manga_ocr_tpu.ops.fused_mlp import fused_mlp_block

            y = fused_mlp_block(
                x,
                jnp.ones((x.shape[-1],), jnp.float32),
                jnp.zeros((x.shape[-1],), jnp.float32),
                lp["mlp"]["fc1"]["kernel"],
                lp["mlp"]["fc1"]["bias"],
                lp["mlp"]["fc2"]["kernel"],
                lp["mlp"]["fc2"]["bias"],
                pre_ln=False,
            )
            x = layer_norm(
                y, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"], cfg.layer_norm_eps
            )
        else:
            hdn = gelu(dense(x, lp["mlp"]["fc1"]["kernel"], lp["mlp"]["fc1"]["bias"]))
            hdn = dense(hdn, lp["mlp"]["fc2"]["kernel"], lp["mlp"]["fc2"]["bias"])
            x = _post_ln_block(hdn, x, lp["mlp_ln"], cfg.layer_norm_eps)

    return x, KVCache(ck_all, cv_all)


def _decode_hidden_fused(
    params: dict,
    token: jax.Array,
    step: jax.Array,
    cache: KVCache,
    cross_kv: CrossKV,
    cfg: DecoderConfig,
) -> tuple[jax.Array, KVCache]:
    """decode_hidden via the fused step kernels (``ops.decode_layer``):
    2 Pallas attention kernels + 1 fused MLP kernel per decoder layer
    instead of ~25 XLA ops, collapsing the per-op launch/fetch overhead
    that dominates the measured step cost (docs/PERF.md decode probes).
    Expects the packed cache layout and ``CrossKVPacked`` (both selected
    automatically by ``cfg.step_kernel`` in ``model.greedy_decode``)."""
    from manga_ocr_tpu.ops.decode_layer import (
        fused_cross_attn_step,
        fused_self_attn_step,
    )
    from manga_ocr_tpu.ops.fused_mlp import fused_mlp_block

    x = embed(params, token[:, None], step, cfg)[:, 0, :].astype(cache.k[0].dtype)
    s_enc = cross_kv.k.shape[-2]
    eps = cfg.layer_norm_eps

    ck_all, cv_all = cache.k, cache.v  # per-layer tuples of [T, B, D]
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda t: t[l], params["layers"])
        x, ck_new, cv_new = fused_self_attn_step(
            x, lp["self_attn"], lp["self_ln"], ck_all[l], cv_all[l], step,
            num_heads=cfg.num_heads, eps=eps,
        )
        ck_all = ck_all[:l] + (ck_new,) + ck_all[l + 1 :]
        cv_all = cv_all[:l] + (cv_new,) + cv_all[l + 1 :]
        x = fused_cross_attn_step(
            x, lp["cross_attn"], lp["cross_ln"],
            cross_kv.k[l], cross_kv.v[l],
            None if cross_kv.k_scale is None else cross_kv.k_scale[l],
            None if cross_kv.v_scale is None else cross_kv.v_scale[l],
            num_heads=cfg.num_heads, eps=eps, s_valid=s_enc,
        )
        fc1, fc2 = lp["mlp"]["fc1"], lp["mlp"]["fc2"]
        w1 = (fc1["w_q"], fc1["scale"]) if "w_q" in fc1 else fc1["kernel"]
        w2 = (fc2["w_q"], fc2["scale"]) if "w_q" in fc2 else fc2["kernel"]
        x = fused_mlp_block(
            x,
            lp["mlp_ln"]["scale"],
            lp["mlp_ln"]["bias"],
            w1,
            fc1["bias"],
            w2,
            fc2["bias"],
            eps=eps,
            pre_ln=False,
            post_ln=True,
        )

    return x, KVCache(ck_all, cv_all)


def init_params(cfg: DecoderConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random init (HF-like scales) for tests / benchmarks."""
    ks = jax.random.split(key, 16)
    d, i, l, v = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size

    def w(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def ln(stacked=True):
        shape = (l, d) if stacked else (d,)
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    def proj(key, din, dout):
        return {"kernel": w(key, (l, din, dout)), "bias": jnp.zeros((l, dout), dtype)}

    def attn(key):
        kk = jax.random.split(key, 4)
        return {
            "q": proj(kk[0], d, d),
            "k": proj(kk[1], d, d),
            "v": proj(kk[2], d, d),
            "o": proj(kk[3], d, d),
        }

    return {
        "tok_embed": w(ks[0], (v, d)),
        "pos_embed": w(ks[1], (cfg.max_position_embeddings, d)),
        "tok_type": w(ks[2], (d,)),
        "emb_ln": ln(stacked=False),
        "layers": {
            "self_attn": attn(ks[3]),
            "self_ln": ln(),
            "cross_attn": attn(ks[4]),
            "cross_ln": ln(),
            "mlp": {"fc1": proj(ks[5], d, i), "fc2": proj(ks[6], i, d)},
            "mlp_ln": ln(),
        },
        "head": {
            "transform": {
                "dense": {"kernel": w(ks[7], (d, d)), "bias": jnp.zeros((d,), dtype)},
                "ln": ln(stacked=False),
            },
            "proj": {"kernel": w(ks[8], (d, v)), "bias": jnp.zeros((v,), dtype)},
        },
    }
