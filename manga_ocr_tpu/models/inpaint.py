"""LaMa-style inpainting network (Fast Fourier Convolutions) in JAX.

The reference erases bubble text with the third-party lama-cleaner torch
package when available (``_run_lama_inpaint``, ``/root/reference/src/ui/
main_window.py:3590-3667``), falling back to cv2 inpainting.  This is the
TPU-native equivalent: a resolution-robust inpainting net whose residual
blocks use FFC (split local/global channel paths; the global path convolves
in the frequency domain via rFFT — global receptive field in one block,
exactly what large text-hole fill needs).

Contract matches the reference wrapper: ``(image, mask) -> image`` with
masked pixels replaced; batched and jitted; weights from the shared ``.npz``
pytree store (random-init until a converted checkpoint is provided —
conversion tracked in docs/PARITY.md).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class InpaintConfig:
    base_channels: int = 32
    num_blocks: int = 3  # FFC residual blocks (LaMa uses 9 at 4x downsample)
    downsamples: int = 2
    global_ratio: float = 0.5  # channel fraction on the spectral path


def _conv(x, p, stride=1, k_h=None):
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _conv_relu(x, p, stride=1):
    return jax.nn.relu(_conv(x, p, stride))


def spectral_transform(x: jax.Array, p: dict) -> jax.Array:
    """Global path: conv1x1 → rFFT2 → 1x1 conv over stacked (re, im) → iFFT."""
    x = _conv_relu(x, p["pre"])
    b, h, w, c = x.shape
    freq = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))  # [B,H,W//2+1,C]
    stacked = jnp.concatenate([freq.real, freq.imag], axis=-1)
    y = _conv_relu(stacked.astype(x.dtype), p["freq"])
    re, im = jnp.split(y.astype(jnp.float32), 2, axis=-1)
    out = jnp.fft.irfft2(jax.lax.complex(re, im), s=(h, w), axes=(1, 2))
    return _conv(out.astype(x.dtype), p["post"])


def ffc_block(x: jax.Array, p: dict, cfg: InpaintConfig) -> jax.Array:
    """Residual FFC: split channels into local/global, cross-connect."""
    c = x.shape[-1]
    cg = int(c * cfg.global_ratio)
    xl, xg = x[..., : c - cg], x[..., c - cg :]
    yl = _conv(xl, p["l2l"]) + _conv(xg, p["g2l"])
    yg = _conv(xl, p["l2g"]) + spectral_transform(xg, p["g2g"])
    y = jnp.concatenate([jax.nn.relu(yl), jax.nn.relu(yg)], axis=-1)
    y = _conv(y, p["merge"])
    return jax.nn.relu(x + y)


def forward(params: dict, images: jax.Array, masks: jax.Array, cfg: InpaintConfig):
    """images [B,H,W,3] float in [0,1]; masks [B,H,W] (1 = hole).
    Returns inpainted [B,H,W,3] in [0,1]."""
    m = masks[..., None].astype(images.dtype)
    x = jnp.concatenate([images * (1.0 - m), m], axis=-1)  # masked input + mask
    x = _conv_relu(x, params["stem"])
    skips = []
    for i in range(cfg.downsamples):
        skips.append(x)
        x = _conv_relu(x, params["down"][i], stride=2)
    for bp in params["blocks"]:
        x = ffc_block(x, bp, cfg)
    for i in reversed(range(cfg.downsamples)):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = _conv_relu(x, params["up"][i])
        x = x + skips[i] if x.shape == skips[i].shape else x
    out = jax.nn.sigmoid(_conv(x, params["head"]))
    # composite: keep known pixels exactly
    return images * (1.0 - m) + out * m


@functools.partial(jax.jit, static_argnames=("cfg",))
def inpaint_batch(params, images_u8, masks_u8, cfg: InpaintConfig):
    imgs = images_u8.astype(jnp.float32) / 255.0
    m = (masks_u8 > 0).astype(jnp.float32)
    out = forward(params, imgs, m, cfg)
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)


def init_params(cfg: InpaintConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    kiter = iter(jax.random.split(key, 512))
    c = cfg.base_channels
    cg = int(c * cfg.global_ratio)
    cl = c - cg

    def conv_p(cin, cout, k=3):
        fan = k * k * cin
        return {
            "kernel": (
                jax.random.normal(next(kiter), (k, k, cin, cout), jnp.float32)
                * math.sqrt(2.0 / fan)
            ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    def ffc_p():
        return {
            "l2l": conv_p(cl, cl),
            "g2l": conv_p(cg, cl),
            "l2g": conv_p(cl, cg),
            "g2g": {
                "pre": conv_p(cg, cg, 1),
                "freq": conv_p(2 * cg, 2 * cg, 1),
                "post": conv_p(cg, cg, 1),
            },
            "merge": conv_p(c, c, 1),
        }

    return {
        "stem": conv_p(4, c),
        "down": [conv_p(c, c) for _ in range(cfg.downsamples)],
        "blocks": [ffc_p() for _ in range(cfg.num_blocks)],
        "up": [conv_p(c, c) for _ in range(cfg.downsamples)],
        "head": conv_p(c, 3, 1),
    }


class LamaInpainter:
    """Reference-wrapper contract: ``(pil-or-bgr image, mask) -> np image``
    (the callable shape the reference builds at main_window.py:3578)."""

    def __init__(self, params: dict | None = None, cfg: InpaintConfig | None = None):
        self.cfg = cfg or InpaintConfig()
        self.params = params

    def __call__(self, image_bgr: np.ndarray, mask_u8: np.ndarray) -> np.ndarray:
        if self.params is None:
            raise RuntimeError("inpainter has no weights loaded")
        # pad to multiple of the downsample factor
        f = 2**self.cfg.downsamples
        h, w = image_bgr.shape[:2]
        ph = (f - h % f) % f
        pw = (f - w % f) % f
        img = np.pad(image_bgr, ((0, ph), (0, pw), (0, 0)), mode="edge")
        msk = np.pad(mask_u8, ((0, ph), (0, pw)), mode="constant")
        out = np.asarray(
            inpaint_batch(
                self.params, jnp.asarray(img[None]), jnp.asarray(msk[None]), self.cfg
            )
        )[0]
        return out[:h, :w]
