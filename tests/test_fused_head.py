"""Fused greedy LM head parity (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import decoder as dec
from manga_ocr_tpu.models.config import DecoderConfig
from manga_ocr_tpu.ops.fused_head import VOCAB_TILE, fused_greedy_head


def test_fused_head_matches_lm_head_argmax():
    rng = np.random.default_rng(0)
    b, d, v = 8, 64, 2 * VOCAB_TILE
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    bt = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    lns = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.2 + 1.0)
    lnb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wp = jnp.asarray(rng.normal(size=(d, v)).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)

    params = {
        "head": {
            "transform": {
                "dense": {"kernel": wt, "bias": bt},
                "ln": {"scale": lns, "bias": lnb},
            },
            "proj": {"kernel": wp, "bias": bp},
        }
    }
    cfg = DecoderConfig(vocab_size=v, hidden_size=d, num_heads=4)
    ref_logits = dec.lm_head(params, x, cfg)
    ref = np.asarray(jnp.argmax(ref_logits, -1))
    got = np.asarray(
        fused_greedy_head(x, wt, bt, lns, lnb, wp, bp, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_fused_head_bf16():
    rng = np.random.default_rng(1)
    b, d, v = 8, 64, VOCAB_TILE
    mk = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = mk(b, d).astype(jnp.bfloat16)
    wt, bt = mk(d, d), mk(d)
    lns, lnb = mk(d, sc=0.2) + 1.0, mk(d)
    wp, bp = mk(d, v), mk(v)
    got = np.asarray(fused_greedy_head(x, wt, bt, lns, lnb, wp, bp, interpret=True))
    assert got.shape == (b,) and got.dtype == np.int32
    assert (got >= 0).all() and (got < v).all()
