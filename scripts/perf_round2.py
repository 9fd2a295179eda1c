"""Round-2 perf experiments: slope-timed encoder/MLP/attention variants.

Usage: python scripts/perf_round2.py [name ...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from perf_util import op_ms  # noqa: E402

from manga_ocr_tpu.ops import common  # noqa: E402

B, H, S, DH = 256, 12, 197, 64
D = H * DH
I = 4 * D
M = B * S  # 50432 tokens

X_TOK = jax.random.normal(jax.random.PRNGKey(0), (M, D), jnp.bfloat16)
X_SEQ = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)

W1 = jax.random.normal(jax.random.PRNGKey(2), (D, I), jnp.bfloat16) * 0.02
W2 = jax.random.normal(jax.random.PRNGKey(3), (I, D), jnp.bfloat16) * 0.02
B1 = jnp.zeros((I,), jnp.float32)
B2 = jnp.zeros((D,), jnp.float32)
LN_S = jnp.ones((D,), jnp.float32)
LN_B = jnp.zeros((D,), jnp.float32)


def quant_w(w):
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


W1Q, S1 = quant_w(W1)
W2Q, S2 = quant_w(W2)


def mk_attn_params(key):
    ks = jax.random.split(key, 4)
    mk = lambda k: {
        "kernel": (jax.random.normal(k, (D, D), jnp.float32) * 0.02).astype(jnp.bfloat16),
        "bias": jnp.zeros((D,), jnp.bfloat16),
    }
    return {"q": mk(ks[0]), "k": mk(ks[1]), "v": mk(ks[2]), "o": mk(ks[3])}


ATTN_P = mk_attn_params(jax.random.PRNGKey(7))

# -- MLP variants -------------------------------------------------------------


def _ln32(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-12) * s + b


def mlp_xla(x):
    h = _ln32(x, LN_S, LN_B).astype(jnp.bfloat16)
    h = jnp.dot(h, W1, preferred_element_type=jnp.float32) + B1
    h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
    o = jnp.dot(h, W2, preferred_element_type=jnp.float32) + B2
    return x + o.astype(jnp.bfloat16)


def _erf(x):
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    y = 1.0 - (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t
        + 0.254829592
    ) * t * jnp.exp(-x * x)
    return jnp.sign(x) * y


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_bf16_kernel(x_ref, w1_ref, w2_ref, lns_ref, lnb_ref, b1_ref, b2_ref, o_ref):
    x = x_ref[:]
    h = _ln32(x, lns_ref[:], lnb_ref[:]).astype(jnp.bfloat16)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu(h).astype(jnp.bfloat16)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = x + o.astype(jnp.bfloat16)


def make_mlp_bf16(tm):
    def body(x):
        xs = pl.BlockSpec((tm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _mlp_bf16_kernel,
            grid=(M // tm,),
            in_specs=[xs, const((D, I)), const((I, D)), const((D,)), const((D,)), const((I,)), const((D,))],
            out_specs=xs,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
        )(x, W1, W2, LN_S, LN_B, B1, B2)

    return body


def _mlp_int8_kernel(
    x_ref, w1_ref, w2_ref, s1_ref, s2_ref, lns_ref, lnb_ref, b1_ref, b2_ref, o_ref
):
    x = x_ref[:]
    h32 = _ln32(x, lns_ref[:], lnb_ref[:])
    amax = jnp.max(jnp.abs(h32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h32 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h = acc.astype(jnp.float32) * sx * s1_ref[:] + b1_ref[:]
    h = _gelu(h)
    amax2 = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    sx2 = jnp.maximum(amax2, 1e-8) * (1.0 / 127.0)
    hq2 = jnp.clip(jnp.round(h / sx2), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq2, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o = acc2.astype(jnp.float32) * sx2 * s2_ref[:] + b2_ref[:]
    o_ref[:] = x + o.astype(jnp.bfloat16)


def make_mlp_int8(tm):
    def body(x):
        xs = pl.BlockSpec((tm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _mlp_int8_kernel,
            grid=(M // tm,),
            in_specs=[
                xs,
                const((D, I)),
                const((I, D)),
                const((I,)),
                const((D,)),
                const((D,)),
                const((D,)),
                const((I,)),
                const((D,)),
            ],
            out_specs=xs,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
        )(x, W1Q, W2Q, S1, S2, LN_S, LN_B, B1, B2)

    return body


# -- attention variants -------------------------------------------------------


def mha_xla(x):
    return x + common.mha(x, x, ATTN_P, H)


def mha_packed(x):
    from manga_ocr_tpu.ops.flash_attention import mha_packed as mp

    return x + mp(x, x, ATTN_P, H)


def enc_layer_current(x):
    """Full current encoder block (attention + MLP, XLA)."""
    from manga_ocr_tpu.models.config import EncoderConfig
    from manga_ocr_tpu.models.vit import encoder_block

    cfg = EncoderConfig()
    lp = {
        "ln1": {"scale": LN_S.astype(jnp.bfloat16), "bias": LN_B.astype(jnp.bfloat16)},
        "attn": ATTN_P,
        "ln2": {"scale": LN_S.astype(jnp.bfloat16), "bias": LN_B.astype(jnp.bfloat16)},
        "mlp": {
            "fc1": {"kernel": W1, "bias": B1.astype(jnp.bfloat16)},
            "fc2": {"kernel": W2, "bias": B2.astype(jnp.bfloat16)},
        },
    }
    return encoder_block(x, lp, cfg)


VARIANTS = {
    "mlp_xla": (mlp_xla, X_TOK),
    "mlp_bf16_256": (make_mlp_bf16(256), X_TOK),
    "mlp_bf16_512": (make_mlp_bf16(512), X_TOK),
    "mlp_int8_256": (make_mlp_int8(256), X_TOK),
    "mlp_int8_512": (make_mlp_int8(512), X_TOK),
    "mha_xla": (mha_xla, X_SEQ),
    "mha_packed": (mha_packed, X_SEQ),
    "enc_layer_current": (enc_layer_current, X_SEQ),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        body, arg = VARIANTS[name]
        try:
            ms = op_ms(body, arg)
            print(f"{name:20s} {ms:8.3f} ms/op")
        except Exception as e:
            msg = str(e).split("\n")[0][:150]
            print(f"{name:20s} FAILED: {type(e).__name__}: {msg}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
