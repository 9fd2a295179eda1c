"""CRAFT text detector in JAX (TPU-native Latin/any-script text detection).

The reference's Latin OCR path delegates text detection to the EasyOCR pip
black box (engine dispatch at ``/root/reference/src/ui/main_window.py:
9805-9810``; lazy init ``:3469-3473``), whose detector is the public CRAFT
model (Character Region Awareness For Text detection): a VGG16-BN backbone
with U-Net-style skip connections producing two score maps — per-pixel
character *region* and character-*link* (affinity) — at half input
resolution.  This module implements that architecture natively so the
detection half of a Latin OCR engine runs as ONE batched XLA graph on TPU
instead of a per-image torch call.

Architecture (channel-scalable; defaults = the published CRAFT shapes so
real ``craft_mlt_25k``-style checkpoints convert via
``models/convert_latin.py``):

- backbone: VGG16-BN feature slices.  The public CRAFT basenet splits
  torchvision's ``vgg16_bn.features`` at indices (12, 19, 29, 39) — each
  slice therefore ends at a BatchNorm and the following slice *starts* with
  the ReLU, so the skip tensors the decoder consumes are PRE-activation.
  Replicated here (the converter maps those indices 1:1; flagged *verify
  against upstream* — no network access in this environment).
- slice5 ("fc6/fc7"): MaxPool(3, stride 1, pad 1) → dilated 3x3 conv
  (dilation 6, pad 6) to 2x channels → 1x1 conv.
- decoder: four ``double_conv`` blocks (1x1 conv + BN + ReLU, 3x3 conv +
  BN + ReLU), each consuming concat(upsampled previous, skip), with
  bilinear (half-pixel, align_corners=False) upsampling to the skip's
  resolution.
- head ``conv_cls``: 3x3/3x3/3x3/1x1/1x1 convs → 2 channels
  (region score, affinity score), raw (the official post-processing
  thresholds raw values; no sigmoid).

TPU-first notes: NHWC layout throughout, batched jitted forward over padded
page buckets (fixed shapes — one compile per bucket), BN folded into conv
kernel+bias at conversion time so inference is pure conv+bias.  Host-side
box extraction (data-dependent shapes) lives in
``detect/craft_boxes.py``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet RGB normalization the public CRAFT applies (normalizeMeanVariance)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class CraftConfig:
    """Channel-scalable CRAFT.  Defaults are the published model's shapes.

    ``vgg_channels``: output channels of vgg stages 1..5 plus the slice5
    ("fc") width — (64, 128, 256, 512, 512, 1024) in the real model.
    Decoder widths derive from the same tuple exactly as upstream:
    upconv_i mid/out channels halve from stage-5 width down to
    ``head_channels``.
    """

    vgg_channels: tuple = (64, 128, 256, 512, 512, 1024)
    head_channels: int = 32  # conv_cls working width (32 in the real model)
    # detection thresholds (the public defaults)
    text_threshold: float = 0.7
    link_threshold: float = 0.4
    low_text: float = 0.4


def _conv(x, p, stride=1, dilation=1):
    """3x3/1x1 conv with torch symmetric padding; kernel [kh,kw,I,O]."""
    k = p["kernel"].shape[0]
    pad = dilation * (k // 2)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool3s1(x):
    """MaxPool(kernel 3, stride 1, pad 1) — slice5's first op."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _relu(x):
    return jax.nn.relu(x)


def _upsample_to(x, hw):
    """Bilinear with torch's exact align_corners=False semantics: source
    position max(0, (i+0.5)·in/out − 0.5), upper tap clamped to the last
    row/column.  (``jax.image.resize`` renormalizes boundary kernels
    instead of clamping coordinates — ~1e-3 edge differences vs the torch
    checkpoints' decoder, so the gather formulation is used.)"""

    def taps(out_size: int, in_size: int):
        pos = jnp.maximum(
            (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size)
            - 0.5,
            0.0,
        )
        lo = jnp.floor(pos).astype(jnp.int32)
        frac = pos - lo
        hi = jnp.minimum(lo + 1, in_size - 1)
        return lo, hi, frac

    h, w = x.shape[1:3]
    lo, hi, f = taps(int(hw[0]), h)
    f = f[None, :, None, None].astype(x.dtype)
    x = x[:, lo] * (1 - f) + x[:, hi] * f
    lo, hi, f = taps(int(hw[1]), w)
    f = f[None, None, :, None].astype(x.dtype)
    x = x[:, :, lo] * (1 - f) + x[:, :, hi] * f
    return x


def normalize_images(images_u8: jax.Array) -> jax.Array:
    """uint8 RGB [B,H,W,3] -> CRAFT's normalized float input."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def craft_forward(params: dict, x: jax.Array) -> jax.Array:
    """Normalized images [B,H,W,3] (H,W multiples of 16) ->
    [B, H/2, W/2, 2] raw (region, affinity) score maps."""
    # --- backbone slices (outputs are PRE-ReLU; see module docstring) ---
    h = _relu(_conv(x, params["slice1"][0]))
    h = _relu(_conv(h, params["slice1"][1]))
    h = _maxpool2(h)
    h = _relu(_conv(h, params["slice1"][2]))
    s1 = _conv(h, params["slice1"][3])  # [B, H/2, W/2, c1*2] pre-relu

    h = _maxpool2(_relu(s1))
    h = _relu(_conv(h, params["slice2"][0]))
    s2 = _conv(h, params["slice2"][1])  # [B, H/4, W/4, c3] pre-relu

    h = _relu(_conv(_relu(s2), params["slice3"][0]))
    h = _maxpool2(h)
    h = _relu(_conv(h, params["slice3"][1]))
    s3 = _conv(h, params["slice3"][2])  # [B, H/8, W/8, c4] pre-relu

    h = _relu(_conv(_relu(s3), params["slice4"][0]))
    h = _maxpool2(h)
    h = _relu(_conv(h, params["slice4"][1]))
    s4 = _conv(h, params["slice4"][2])  # [B, H/16, W/16, c5] pre-relu

    h = _maxpool3s1(s4)
    h = _conv(h, params["slice5"][0], dilation=6)
    s5 = _conv(h, params["slice5"][1])  # [B, H/16, W/16, fc]

    # --- U decoder ---
    y = jnp.concatenate([s5, s4], axis=-1)
    y = _double_conv(y, params["upconv1"])
    y = _upsample_to(y, s3.shape[1:3])
    y = jnp.concatenate([y, s3], axis=-1)
    y = _double_conv(y, params["upconv2"])
    y = _upsample_to(y, s2.shape[1:3])
    y = jnp.concatenate([y, s2], axis=-1)
    y = _double_conv(y, params["upconv3"])
    y = _upsample_to(y, s1.shape[1:3])
    y = jnp.concatenate([y, s1], axis=-1)
    y = _double_conv(y, params["upconv4"])

    # --- classification head ---
    y = _relu(_conv(y, params["conv_cls"][0]))
    y = _relu(_conv(y, params["conv_cls"][1]))
    y = _relu(_conv(y, params["conv_cls"][2]))
    y = _relu(_conv(y, params["conv_cls"][3]))
    y = _conv(y, params["conv_cls"][4])  # [B, H/2, W/2, 2], raw
    return y


def _double_conv(x, p):
    """1x1 conv + (folded) BN + ReLU, 3x3 conv + (folded) BN + ReLU."""
    x = _relu(_conv(x, p["conv1"]))
    return _relu(_conv(x, p["conv2"]))


# ---------------------------------------------------------------------------
# Parameter init (random; real weights come from models/convert_latin.py)
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout) -> dict:
    scale = 1.0 / np.sqrt(kh * kw * cin)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(
            k1, (kh, kw, cin, cout), jnp.float32, -scale, scale
        ),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -scale, scale),
    }


def init_craft_params(cfg: CraftConfig, key) -> dict:
    c1, c2, c3, c4, c5, fc = cfg.vgg_channels
    hc = cfg.head_channels
    keys = iter(jax.random.split(key, 64))

    def conv(kh, cin, cout):
        return _init_conv(next(keys), kh, kh, cin, cout)

    params = {
        # slice layouts mirror craft_forward (conv channels per vgg16_bn)
        "slice1": [conv(3, 3, c1), conv(3, c1, c1), conv(3, c1, c2), conv(3, c2, c2)],
        "slice2": [conv(3, c2, c3), conv(3, c3, c3)],
        "slice3": [conv(3, c3, c3), conv(3, c3, c4), conv(3, c4, c4)],
        "slice4": [conv(3, c4, c4), conv(3, c4, c5), conv(3, c5, c5)],
        "slice5": [conv(3, c5, fc), conv(1, fc, fc)],
    }
    # decoder widths derive exactly like upstream: upconv1 mid = c5,
    # out = c5/2, then each block halves down to the head width
    o1 = max(c5 // 2, 1)
    o2 = max(o1 // 2, 1)
    o3 = max(o2 // 2, 1)
    for name, cin, mid, out in (
        ("upconv1", fc + c5, c5, o1),
        ("upconv2", o1 + c4, o1, o2),
        ("upconv3", o2 + c3, o2, o3),
        ("upconv4", o3 + c2, o3, hc),
    ):
        params[name] = {
            "conv1": _init_conv(next(keys), 1, 1, cin, mid),
            "conv2": _init_conv(next(keys), 3, 3, mid, out),
        }
    hc2 = max(hc // 2, 1)
    params["conv_cls"] = [
        _init_conv(next(keys), 3, 3, hc, hc),
        _init_conv(next(keys), 3, 3, hc, hc),
        _init_conv(next(keys), 3, 3, hc, hc2),
        _init_conv(next(keys), 1, 1, hc2, hc2),
        _init_conv(next(keys), 1, 1, hc2, 2),
    ]
    return params


def make_jitted_craft(cfg: CraftConfig):
    """jitted uint8 [B,H,W,3] -> (region, affinity) float maps [B,H/2,W/2]."""

    @jax.jit
    def run(params, images_u8):
        maps = craft_forward(params, normalize_images(images_u8))
        return maps[..., 0], maps[..., 1]

    return run
