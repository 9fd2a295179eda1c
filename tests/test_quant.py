"""int8 quantization parity tests (error-bounded vs float path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import vit
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.quantize import quantize_encoder
from manga_ocr_tpu.ops.quant import dense_int8, quantize_weight_per_col


def test_quantized_dense_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32) * 0.01)
    ref = np.asarray(x @ w + b)
    w_q, scale = quantize_weight_per_col(w)
    got = np.asarray(dense_int8(x, w_q, scale, b))
    # int8 dynamic-activation quantization: relative error ~1%
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 0.05
    assert np.mean(np.abs(got - ref) / denom) < 0.01


def test_weight_roundtrip_bounds():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    w_q, scale = quantize_weight_per_col(w)
    back = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    assert np.max(np.abs(back - np.asarray(w))) <= np.max(np.asarray(scale)) * 0.51


def test_quantized_encoder_close_to_float():
    cfg = MangaOCRConfig.tiny().encoder
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    q_params = dict(params)
    q_params["layers"] = quantize_encoder(params)["layers"]
    rng = np.random.default_rng(2)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit.encode(params, px, cfg, fused_attention=False))
    got = np.asarray(vit.encode(q_params, px, cfg, fused_attention=False))
    # LN at the end keeps scales comparable; allow small absolute error
    assert np.mean(np.abs(got - ref)) < 0.05
    assert np.max(np.abs(got - ref)) < 0.6


def test_quantized_attn_proj_also_works():
    cfg = MangaOCRConfig.tiny().encoder
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    q_params = dict(params)
    q_params["layers"] = quantize_encoder(params, quantize_attn_proj=True)["layers"]
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = vit.encode(q_params, px, cfg, fused_attention=False)
    assert np.isfinite(np.asarray(out)).all()
