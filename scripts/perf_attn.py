"""Micro-benchmark: encoder attention variants on the real chip.

Measures ms/iteration of each variant by scanning the op N times inside one
jit (amortizes the tunnel's fixed per-dispatch cost) and forcing a host
readback.  Usage: python scripts/perf_attn.py [variant ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.ops import common
from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

B, H, S, DH = 256, 12, 197, 64
D = H * DH
N_INNER = 10
DTYPE = jnp.bfloat16


def _time(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # warm + readback
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    dt = (time.perf_counter() - t0) / iters / N_INNER * 1e3
    return dt


def make_attn_params(key):
    ks = jax.random.split(key, 8)
    mk = lambda k, din, dout: {
        "kernel": (jax.random.normal(k, (din, dout), jnp.float32) * 0.02).astype(DTYPE),
        "bias": jnp.zeros((dout,), DTYPE),
    }
    return {
        "q": mk(ks[0], D, D),
        "k": mk(ks[1], D, D),
        "v": mk(ks[2], D, D),
        "o": mk(ks[3], D, D),
    }


PARAMS = make_attn_params(jax.random.PRNGKey(0))
X = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), DTYPE)
QKV = tuple(
    jax.random.normal(jax.random.PRNGKey(i), (B, H, S, DH), DTYPE) for i in (2, 3, 4)
)


def scan_op(body):
    @jax.jit
    def run(x0):
        def step(x, _):
            return body(x), None

        x, _ = jax.lax.scan(step, x0, None, length=N_INNER)
        return jnp.sum(x.astype(jnp.float32))

    return run


# -- variants ---------------------------------------------------------------


def v_mha_xla(x):
    """Full MHA (projections + SDPA f32 logits + out-proj), current path."""
    return common.mha(x, x, PARAMS, H)


def v_core_xla_f32(q):
    return common.attention_scores(q, *QKV[1:])


def v_core_xla_bf16(q):
    """bf16 logits + bf16 softmax (halves logits traffic; accuracy TBD)."""
    k, v = QKV[1:]
    scale = 1.0 / np.sqrt(DH)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, DTYPE)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
    return out.astype(q.dtype)


def v_core_pallas_r1(q):
    from manga_ocr_tpu.ops.flash_attention import fused_attention

    return fused_attention(q, *QKV[1:])


def v_mha_pallas_packed(x):
    from manga_ocr_tpu.ops.flash_attention import mha_packed

    return mha_packed(x, x, PARAMS, H)


def v_core_jaxflash(q):
    """JAX's production TPU flash-attention kernel (pallas.ops.tpu).
    Seq padded to 256 (kernel wants 128-multiples); padded keys masked via
    segment ids."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    k, v = QKV[1:]
    sp = 256
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, sp - S), (0, 0)))
    seg = (jnp.arange(sp) < S).astype(jnp.int32)[None].repeat(B, 0)
    out = fa.flash_attention(
        pad(q), pad(k), pad(v),
        segment_ids=fa.SegmentIds(q=seg, kv=seg),
        causal=False, sm_scale=1.0 / np.sqrt(DH),
    )
    return out[:, :, :S, :]


def v_mha_jaxflash(x):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    q = common.split_heads(common.dense(x, PARAMS["q"]["kernel"], PARAMS["q"]["bias"]), H)
    k = common.split_heads(common.dense(x, PARAMS["k"]["kernel"], PARAMS["k"]["bias"]), H)
    v = common.split_heads(common.dense(x, PARAMS["v"]["kernel"], PARAMS["v"]["bias"]), H)
    ctx = fa.flash_attention(q, k, v, causal=False, sm_scale=1.0 / np.sqrt(DH))
    return common.dense(common.merge_heads(ctx), PARAMS["o"]["kernel"], PARAMS["o"]["bias"])


def v_mha_packed_g2(x):
    from manga_ocr_tpu.ops.flash_attention import mha_packed

    return mha_packed(x, x, PARAMS, H, group=2)


def v_core_xla_dpa(q):
    """jax.nn.dot_product_attention default path."""
    k, v = QKV[1:]
    qt = jnp.swapaxes(q, 1, 2)  # expects [B, S, H, dh]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = jax.nn.dot_product_attention(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


VARIANTS = {
    "mha_xla": (v_mha_xla, X),
    "core_xla_f32": (v_core_xla_f32, QKV[0]),
    "core_xla_bf16": (v_core_xla_bf16, QKV[0]),
    "core_pallas_r1": (v_core_pallas_r1, QKV[0]),
    "mha_pallas_packed": (v_mha_pallas_packed, X),
    "mha_packed_g2": (v_mha_packed_g2, X),
    "core_jaxflash": (v_core_jaxflash, QKV[0]),
    "mha_jaxflash": (v_mha_jaxflash, X),
    "core_xla_dpa": (v_core_xla_dpa, QKV[0]),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        body, arg = VARIANTS[name]
        try:
            ms = _time(scan_op(body), arg)
            print(f"{name:24s} {ms:8.3f} ms/iter")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
