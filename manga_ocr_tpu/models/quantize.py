"""Opt-in int8 quantization of the encoder's MLP (and optionally QKV/O).

Transforms a converted encoder param tree in place of the bf16 weights:
``quantize_encoder(params)`` returns a tree where each quantized dense has
``{"w_q": int8, "scale": f32, "bias": ...}`` instead of ``{"kernel",
"bias"}``; ``vit.encoder_block`` detects the quantized form and routes
through ``ops.quant.dense_int8``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from manga_ocr_tpu.ops.quant import quantize_weight_per_col


def _quantize_dense_stacked(p: dict) -> dict:
    """Quantize a stacked [L, K, N] dense param."""
    kernels = p["kernel"]

    def one(w):
        return quantize_weight_per_col(w)

    w_q, scale = jax.vmap(one)(jnp.asarray(kernels, jnp.float32))
    return {"w_q": w_q, "scale": scale, "bias": p["bias"]}


def quantize_encoder(
    encoder_params: dict, quantize_attn_proj: bool = False
) -> dict:
    """Return encoder params with int8 MLP (and optionally attention
    projections)."""
    out = dict(encoder_params)
    layers = dict(encoder_params["layers"])
    mlp = layers["mlp"]
    layers["mlp"] = {
        "fc1": _quantize_dense_stacked(mlp["fc1"]),
        "fc2": _quantize_dense_stacked(mlp["fc2"]),
    }
    if quantize_attn_proj:
        attn = dict(layers["attn"])
        for key in ("q", "k", "v", "o"):
            attn[key] = _quantize_dense_stacked(attn[key])
        layers["attn"] = attn
    out["layers"] = layers
    return out


def quantize_decoder(decoder_params: dict) -> dict:
    """Return decoder params with int8 projections for the fused decode-step
    kernel (``ops.decode_layer``): self q/k/v/o, cross q/o, and the MLP.

    Cross k/v kernels stay bf16 — they run once per dispatch in
    ``decoder.precompute_cross_kv``, not per step.  Embeddings and the LM
    head are untouched."""
    out = dict(decoder_params)
    layers = dict(decoder_params["layers"])
    sa = dict(layers["self_attn"])
    for key in ("q", "k", "v", "o"):
        sa[key] = _quantize_dense_stacked(sa[key])
    layers["self_attn"] = sa
    ca = dict(layers["cross_attn"])
    for key in ("q", "o"):
        ca[key] = _quantize_dense_stacked(ca[key])
    layers["cross_attn"] = ca
    mlp = layers["mlp"]
    layers["mlp"] = {
        "fc1": _quantize_dense_stacked(mlp["fc1"]),
        "fc2": _quantize_dense_stacked(mlp["fc2"]),
    }
    out["layers"] = layers
    return out


def is_quantized_dense(p: dict) -> bool:
    return "w_q" in p
