"""Speech-bubble segmentation model (U-Net) in JAX.

The reference runs a third-party ONNX U-Net-style bubble segmenter on the
CPU/CUDA (``_run_onnx_inference``, ``/root/reference/src/ui/
main_window.py:6776-6815``): RGB resized to the model input (512×512
fallback), /255 float32, output squeezed to a [H, W] probability map, resized
back to page size, thresholded at 0.5 into a 0/255 uint8 mask.

This module provides the TPU-native equivalent: a compact configurable U-Net
whose forward is one jitted graph *including* the input resize and output
upsampling, batched over pages.  Weights load from a converted checkpoint
(``.npz`` pytree) when available; random init otherwise (the third-party
weights are not redistributable and this environment has no network).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    input_size: int = 512
    base_channels: int = 32
    depth: int = 4  # number of down/up levels
    threshold: float = 0.5


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _block(x, p):
    """conv-relu-conv-relu."""
    x = jax.nn.relu(_conv(x, p["c1"]))
    return jax.nn.relu(_conv(x, p["c2"]))


def _down(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _up(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def forward(params: dict, images: jax.Array, cfg: DetectorConfig) -> jax.Array:
    """[B, S, S, 3] float in [0,1] -> [B, S, S] sigmoid probabilities."""
    x = images
    skips = []
    for i in range(cfg.depth):
        x = _block(x, params["down"][i])
        skips.append(x)
        x = _down(x)
    x = _block(x, params["mid"])
    for i in reversed(range(cfg.depth)):
        x = _up(x)
        x = jnp.concatenate([x, skips[i]], axis=-1)
        x = _block(x, params["up"][i])
    logits = _conv(x, params["head"])[..., 0]
    return jax.nn.sigmoid(logits.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("cfg", "out_h", "out_w"))
def segment_pages(
    params: dict,
    pages_u8: jax.Array,  # [B, H, W, 3] uint8 RGB
    cfg: DetectorConfig,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Full detector graph: resize → U-Net → resize back → 0/255 mask.

    Matches the reference's ONNX wrapper contract (resize, /255, >0.5)."""
    s = cfg.input_size
    x = jax.image.resize(
        pages_u8.astype(jnp.float32), (*pages_u8.shape[:1], s, s, 3), "linear"
    )
    prob = forward(params, x / 255.0, cfg)
    prob = jax.image.resize(prob, (prob.shape[0], out_h, out_w), "linear")
    return (prob > cfg.threshold).astype(jnp.uint8) * 255


def init_params(cfg: DetectorConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    def conv_p(key, cin, cout, k=3):
        fan_in = k * k * cin
        w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
        return {
            "kernel": (w * np.sqrt(2.0 / fan_in)).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    def block_p(key, cin, cout):
        k1, k2 = jax.random.split(key)
        return {"c1": conv_p(k1, cin, cout), "c2": conv_p(k2, cout, cout)}

    keys = jax.random.split(key, 2 * cfg.depth + 2)
    down, up = [], []
    cin = 3
    chans = [cfg.base_channels * (2**i) for i in range(cfg.depth)]
    for i in range(cfg.depth):
        down.append(block_p(keys[i], cin, chans[i]))
        cin = chans[i]
    mid_c = cfg.base_channels * (2**cfg.depth)
    mid = block_p(keys[cfg.depth], cin, mid_c)
    cin = mid_c
    for i in reversed(range(cfg.depth)):
        up.append(block_p(keys[cfg.depth + 1 + i], cin + chans[i], chans[i]))
        cin = chans[i]
    up = list(reversed(up))
    head = conv_p(keys[-1], cin, 1, k=1)
    return {"down": down, "mid": mid, "up": up, "head": head}


def save_params(params: dict, path: str) -> None:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def fill_template(data, template, dtype=jnp.float32):
    """Fill a params pytree ``template`` from a flat mapping with
    slash-joined keys ('a/b/0/kernel') — the inverse of ``save_params``.
    Shared by every flat-npz model family (detector, yolo_seg)."""

    def fill(prefix, node):
        if isinstance(node, dict):
            return {k: fill(f"{prefix}/{k}" if prefix else k, v) for k, v in node.items()}
        if isinstance(node, list):
            return [fill(f"{prefix}/{i}", v) for i, v in enumerate(node)]
        return jnp.asarray(data[prefix], dtype)

    return fill("", template)


def load_params(path: str, cfg: DetectorConfig, dtype=jnp.float32) -> dict:
    data = np.load(path)
    return fill_template(data, init_params(cfg, jax.random.PRNGKey(0), dtype), dtype)
