"""The full manga-ocr model: ViT encoder + BERT decoder + greedy decode.

This is the TPU-native replacement for the reference's single-crop
``self.manga_ocr_reader(pil_img)`` call (``/root/reference/src/ui/
main_window.py:9801``), generalized to *batched* operation: the whole
decode — encoder forward, cross-K/V precompute, and the token-by-token
greedy loop with done-masking — is one jittable function with static
shapes, so every bubble crop of a page decodes in a single TPU dispatch.

Early exit: the ``lax.while_loop`` condition is ``any(~done) & (step <
max_len)``, so a batch of short texts stops as soon as every row has
emitted EOS instead of always paying for ``max_length`` steps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import decoder as dec
from manga_ocr_tpu.models import vit
from manga_ocr_tpu.models.config import MangaOCRConfig


class GreedyResult(NamedTuple):
    tokens: jax.Array  # [B, max_len] int32, starts with BOS, PAD after EOS
    lengths: jax.Array  # [B] int32 — number of valid tokens incl. BOS and EOS


class _LoopState(NamedTuple):
    step: jax.Array  # scalar int32, position of the token generated last
    tokens: jax.Array  # [B, max_len]
    last: jax.Array  # [B] most recent token ids
    done: jax.Array  # [B] bool
    lengths: jax.Array  # [B] int32
    cache: dec.KVCache


def encode(params: dict, pixel_values: jax.Array, cfg: MangaOCRConfig) -> jax.Array:
    return vit.encode(params["encoder"], pixel_values, cfg.encoder)


def greedy_decode(
    params: dict,
    enc_out: jax.Array,
    cfg: MangaOCRConfig,
    max_length: int | None = None,
    chunk_size: int = 8,
    stop_lengths: jax.Array | None = None,
) -> GreedyResult:
    """Greedy autoregressive decode for a batch of encoder outputs.

    Chunked loop structure: a static-trip ``fori_loop`` decodes
    ``chunk_size`` tokens per chunk, and a ``while_loop`` over *chunks*
    provides done-masked early exit.  Rationale: a data-dependent
    ``while_loop`` condition costs ~1 ms per evaluation on the target
    runtime (per-iteration continuation sync), so checking every token made
    the condition — not the math — the dominant decode cost; checking every
    ``chunk_size`` tokens amortizes it while still stopping early for
    short texts (typical manga bubbles: 5–30 chars vs max_length 300).

    ``stop_lengths`` ([B] int32): benchmark instrument — rows behave as if
    EOS fired at that length, so early-exit behavior can be measured under
    a realistic length distribution even with random weights (which never
    emit EOS).  None in production (EOS comes from the model).
    """
    dcfg = cfg.decoder
    max_len = max_length or cfg.max_length
    b = enc_out.shape[0]
    dtype = enc_out.dtype

    n_chunks = -(-(max_len - 1) // chunk_size)
    padded_len = 1 + n_chunks * chunk_size  # inner loop never goes OOB

    if dcfg.step_kernel == "fused_loop":
        # the ENTIRE greedy loop as ONE Pallas kernel (ops/decode_loop.py):
        # batch-blocked grid, cross-KV slabs + self-cache VMEM-resident,
        # weights fetched once — token-parity-tested vs this XLA path.
        # ``stop_lengths`` passes straight through (same semantics), so the
        # realistic-length bench instrument measures the PRODUCTION path.
        from manga_ocr_tpu.ops.decode_loop import greedy_decode_loop

        # bf16 slabs: they feed batched MXU matmuls and are fetched once per
        # dispatch, so int8 storage would only add per-step dequant casts
        cross_packed = dec.precompute_cross_kv_packed(
            params["decoder"], enc_out, dcfg, int8=False
        )
        tokens, lengths = greedy_decode_loop(
            params["decoder"], cross_packed, dcfg, steps=max_len - 1,
            dtype=dtype, stop_lengths=stop_lengths,
        )
        return GreedyResult(tokens[:, :max_len], jnp.minimum(lengths, max_len))

    if dcfg.step_kernel == "fused_layer":
        # packed layouts for the fused step kernels (ops/decode_layer.py)
        cross_kv = dec.precompute_cross_kv_packed(params["decoder"], enc_out, dcfg)
    else:
        cross_kv = dec.precompute_cross_kv(params["decoder"], enc_out, dcfg)
    cache = dec.init_cache(dcfg, b, padded_len, dtype)
    tokens = jnp.full((b, padded_len), dcfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(dcfg.bos_token_id)

    init = _LoopState(
        step=jnp.int32(0),
        tokens=tokens,
        last=jnp.full((b,), dcfg.bos_token_id, jnp.int32),
        done=jnp.zeros((b,), bool),
        lengths=jnp.ones((b,), jnp.int32),
        cache=cache,
    )

    def one_step(_, s: _LoopState) -> _LoopState:
        nxt, cache = dec.decode_step_greedy(
            params["decoder"], s.last, s.step, s.cache, cross_kv, dcfg
        )
        nxt = jnp.where(s.done, dcfg.pad_token_id, nxt)
        newly_done = nxt == dcfg.eos_token_id
        if stop_lengths is not None:  # bench-only forced early exit
            newly_done = jnp.logical_or(newly_done, s.step + 2 >= stop_lengths)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            s.tokens, nxt[:, None], s.step + 1, axis=1
        )
        lengths = s.lengths + jnp.where(s.done, 0, 1)
        return _LoopState(
            step=s.step + 1,
            tokens=tokens,
            last=nxt,
            done=jnp.logical_or(s.done, newly_done),
            lengths=lengths,
            cache=cache,
        )

    def chunk_cond(s: _LoopState):
        return jnp.logical_and(
            s.step < max_len - 1, jnp.logical_not(jnp.all(s.done))
        )

    def chunk_body(s: _LoopState):
        return jax.lax.fori_loop(0, chunk_size, one_step, s)

    final = jax.lax.while_loop(chunk_cond, chunk_body, init)
    # Rows may have decoded a few tokens past max_len-1 inside the last
    # chunk; clamp bookkeeping to the contract.
    tokens = final.tokens[:, :max_len]
    lengths = jnp.minimum(final.lengths, max_len)
    return GreedyResult(tokens, lengths)


def ocr_forward(
    params: dict,
    pixel_values: jax.Array,
    cfg: MangaOCRConfig,
    max_length: int | None = None,
    chunk_size: int = 8,
) -> GreedyResult:
    """pixels [B, H, W, C] (normalized) -> greedy token ids.  Jittable."""
    dcfg = cfg.decoder
    if dcfg.step_kernel == "fused_loop" and dcfg.fuse_cross_kv:
        # fused path: the decode mega-kernel applies the encoder's final LN
        # and computes the cross-K/V slabs itself, straight from the raw
        # (possibly seq-padded) encoder output — no XLA tail between the
        # two programs (ops/decode_loop.py fuse_kv)
        from manga_ocr_tpu.ops.decode_loop import greedy_decode_loop

        ecfg = cfg.encoder
        enc_raw = vit.encode(params["encoder"], pixel_values, ecfg, raw_padded=True)
        s_valid = ecfg.seq_len  # patches + CLS (the one definition)
        max_len = max_length or cfg.max_length
        tokens, lengths = greedy_decode_loop(
            params["decoder"], None, dcfg, steps=max_len - 1,
            dtype=enc_raw.dtype, enc_raw=enc_raw, s_valid=s_valid,
            enc_final_ln=params["encoder"]["final_ln"],
        )
        return GreedyResult(tokens[:, :max_len], jnp.minimum(lengths, max_len))
    enc_out = encode(params, pixel_values, cfg)
    return greedy_decode(params, enc_out, cfg, max_length, chunk_size=chunk_size)


def make_jitted_ocr(
    cfg: MangaOCRConfig,
    max_length: int | None = None,
    donate=False,
    chunk_size: int = 8,
):
    """Build the jitted batched OCR function (compile once per batch shape).

    ``chunk_size``: decode early-exit granularity — each chunk boundary
    costs a ~1 ms loop-condition sync on the target runtime, so short
    expected texts want small chunks and fixed-length workloads want
    ``chunk_size == max_length``."""
    fn = functools.partial(
        ocr_forward, cfg=cfg, max_length=max_length, chunk_size=chunk_size
    )
    return jax.jit(fn, donate_argnums=(1,) if donate else ())


def init_params(cfg: MangaOCRConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ke, kd = jax.random.split(key)
    return {
        "encoder": vit.init_params(cfg.encoder, ke, dtype),
        "decoder": dec.init_params(cfg.decoder, kd, dtype),
    }


def cast_params(params: dict, dtype) -> dict:
    """Cast all floating-point leaves (e.g. to bf16 for TPU serving)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
