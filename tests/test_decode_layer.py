"""Parity of the fused whole-layer decode-step kernel (ops/decode_layer.py)
against the XLA reference decode path, on CPU in interpreter mode.

Covers: single-step logits + cache parity (float weights), greedy-token
agreement of the int8-quantized fused path end-to-end, and chunked
early-exit decode through the fused path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import decoder as dec
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.quantize import quantize_decoder


@pytest.fixture(scope="module")
def cfg():
    return MangaOCRConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return mdl.init_params(cfg, jax.random.PRNGKey(0))


def _fused_dcfg(cfg, **kw):
    return dataclasses.replace(cfg.decoder, step_kernel="fused_layer", **kw)


def _enc_out(cfg, params, n=3, seed=1):
    s = cfg.encoder.image_size
    px = jax.random.normal(jax.random.PRNGKey(seed), (n, s, s, 3), jnp.float32)
    return mdl.encode(params, px, cfg)


def _stack(cache_side):
    """Per-layer cache tuple -> stacked [L, ...] numpy array."""
    return np.stack([np.asarray(a) for a in cache_side])


def _to_xla_layout(cache_side):
    """Fused packed cache (L x [T, B, D]) -> XLA layout [L, B, H, T, dh]."""
    a = _stack(cache_side)
    L, T, B, D = a.shape
    cfg = MangaOCRConfig.tiny().decoder
    h, dh = cfg.num_heads, cfg.head_dim
    return a.transpose(0, 2, 1, 3).reshape(L, B, T, h, dh).transpose(0, 1, 3, 2, 4)


def test_fused_step_matches_xla(cfg, params):
    enc_out = _enc_out(cfg, params)
    dcfg = cfg.decoder
    b = enc_out.shape[0]
    cross = dec.precompute_cross_kv(params["decoder"], enc_out, dcfg)
    tok = jnp.array([3, 7, 11][:b], jnp.int32)

    # advance steps on each path and compare last-step logits + caches
    fus_dcfg = _fused_dcfg(cfg)
    cross_p = dec.precompute_cross_kv_packed(params["decoder"], enc_out, fus_dcfg)
    ref_cache = dec.init_cache(dcfg, b, 8, enc_out.dtype)
    fus_cache = dec.init_cache(fus_dcfg, b, 8, enc_out.dtype)
    for step in range(3):
        ref_logits, ref_cache = dec.decode_step(
            params["decoder"], tok, jnp.int32(step), ref_cache, cross, dcfg
        )
        fus_logits, fus_cache = dec.decode_step(
            params["decoder"], tok, jnp.int32(step), fus_cache, cross_p, fus_dcfg
        )
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    np.testing.assert_allclose(
        np.asarray(fus_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        _to_xla_layout(fus_cache.k), _stack(ref_cache.k), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        _to_xla_layout(fus_cache.v), _stack(ref_cache.v), atol=2e-4, rtol=1e-3
    )


def test_fused_step_int8_cross_kv_matches(cfg, params):
    """Fused kernel with int8 cross-KV (the serving layout) stays close to
    the XLA int8 cross-KV path."""
    enc_out = _enc_out(cfg, params, seed=5)
    dcfg = dataclasses.replace(cfg.decoder, cross_kv_int8=True)
    b = enc_out.shape[0]
    cross = dec.precompute_cross_kv(params["decoder"], enc_out, dcfg)
    fus_dcfg = _fused_dcfg(cfg, cross_kv_int8=True)
    cross_p = dec.precompute_cross_kv_packed(params["decoder"], enc_out, fus_dcfg)
    tok = jnp.full((b,), dcfg.bos_token_id, jnp.int32)
    ref_logits, ref_cache = dec.decode_step(
        params["decoder"], tok, jnp.int32(0),
        dec.init_cache(dcfg, b, 8, enc_out.dtype), cross, dcfg
    )
    fus_logits, fus_cache = dec.decode_step(
        params["decoder"], tok, jnp.int32(0),
        dec.init_cache(fus_dcfg, b, 8, enc_out.dtype), cross_p, fus_dcfg
    )
    # both paths quantize the cross K/V to int8 but at different scale
    # granularities (per-(b,h,s) vs per-(b,s) rows) — compare within the
    # combined quantization-noise bound
    np.testing.assert_allclose(
        np.asarray(fus_logits), np.asarray(ref_logits), atol=0.08, rtol=0.02
    )
    np.testing.assert_allclose(
        _to_xla_layout(fus_cache.k), _stack(ref_cache.k), atol=2e-4, rtol=1e-3
    )


def test_int8_fused_greedy_tokens_match(cfg, params):
    """End-to-end greedy decode: int8-quantized decoder through the fused
    whole-layer kernel emits the same tokens as the f32 XLA path."""
    s = cfg.encoder.image_size
    px = jax.random.normal(jax.random.PRNGKey(3), (4, s, s, 3), jnp.float32)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)

    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    scfg = dataclasses.replace(
        cfg, decoder=_fused_dcfg(cfg, cross_kv_int8=True)
    )
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_fused_head_greedy_tokens_match(cfg, params):
    """head_kernel="fused" (in-loop Pallas greedy head) emits the same
    tokens as the XLA logits+argmax head."""
    s = cfg.encoder.image_size
    px = jax.random.normal(jax.random.PRNGKey(9), (4, s, s, 3), jnp.float32)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    # tiny vocab (100) is not a multiple of the head kernel's vocab tile;
    # pad the projection to the tile like the serving path requires
    from manga_ocr_tpu.ops.fused_head import VOCAB_TILE

    v = cfg.decoder.vocab_size
    vp = -(-v // VOCAB_TILE) * VOCAB_TILE
    pparams = jax.tree.map(lambda a: a, params)
    proj = pparams["decoder"]["head"]["proj"]
    pad = vp - v
    proj["kernel"] = jnp.pad(proj["kernel"], ((0, 0), (0, pad)))
    proj["bias"] = jnp.pad(proj["bias"], ((0, pad),), constant_values=-1e9)
    hcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, head_kernel="fused")
    )
    got = mdl.ocr_forward(pparams, px, hcfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_fused_chunked_early_exit(cfg, params):
    """Chunked greedy decode (early-exit machinery) works through the fused
    path: forced stop lengths are honored identically."""
    enc_out = _enc_out(cfg, params, n=4, seed=7)
    stops = jnp.array([3, 5, 9, 2], jnp.int32)
    ref = mdl.greedy_decode(params, enc_out, cfg, max_length=12, chunk_size=4,
                            stop_lengths=stops)
    scfg = dataclasses.replace(cfg, decoder=_fused_dcfg(cfg))
    got = mdl.greedy_decode(params, enc_out, scfg, max_length=12, chunk_size=4,
                            stop_lengths=stops)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))
