"""Fused-attention Pallas kernel parity (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.ops import common
from manga_ocr_tpu.ops.flash_attention import fused_attention, mha_fused


def _qkv(b=2, h=3, s=197, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
    return mk(), mk(), mk()


def test_fused_attention_matches_reference():
    q, k, v = _qkv()
    ref = common.attention_scores(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_aligned_seq():
    q, k, v = _qkv(s=256)
    ref = common.attention_scores(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_bf16():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(s=64))
    ref = common.attention_scores(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_mha_fused_matches_mha():
    rng = np.random.default_rng(1)
    d, heads, s, b = 48, 4, 33, 2
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))

    def proj(key):
        return {
            "kernel": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        }

    p = {k: proj(k) for k in ("q", "k", "v", "o")}
    ref = common.mha(x, x, p, heads)
    got = mha_fused(x, x, p, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_encoder_fused_flag_parity():
    """Full encoder with fused attention (interpret) == XLA attention."""
    from manga_ocr_tpu.models import vit
    from manga_ocr_tpu.models.config import MangaOCRConfig

    # monkeypatch the fused path to interpreter mode for CPU execution
    import manga_ocr_tpu.ops.flash_attention as fa

    orig = fa.fused_attention
    fa_interp = lambda q, k, v, interpret=False: orig(q, k, v, interpret=True)
    fa.fused_attention = fa_interp
    try:
        cfg = MangaOCRConfig.tiny().encoder
        params = vit.init_params(cfg, jax.random.PRNGKey(0))
        px = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
        )
        ref = vit.encode(params, px, cfg, fused_attention=False)
        got = vit.encode(params, px, cfg, fused_attention=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )
    finally:
        fa.fused_attention = orig


def test_batched_sdpa_matches_loop():
    """The batched_sdpa variant of the fused attention layer is exactly
    equivalent to the per-(b,h) loop formulation."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    d, heads = 64, 4
    mk = lambda k: {"kernel": jr.normal(k, (d, d)) * 0.1, "bias": jnp.zeros(d)}
    ks = jr.split(jr.PRNGKey(0), 4)
    p = {"q": mk(ks[0]), "k": mk(ks[1]), "v": mk(ks[2]), "o": mk(ks[3])}
    x = jr.normal(jr.PRNGKey(5), (2, 7, d))
    s, b = jnp.ones(d), jnp.zeros(d)
    ref = fused_attn_layer(x, p, s, b, heads)
    got = fused_attn_layer(x, p, s, b, heads, batched_sdpa=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
