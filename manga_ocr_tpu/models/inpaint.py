"""LaMa inpainting generator (FFC-ResNet) in JAX — checkpoint-exact.

The reference erases bubble text with the third-party lama-cleaner torch
package when available (``_run_lama_inpaint``, ``/root/reference/src/ui/
main_window.py:3590-3667``), falling back to cv2 inpainting.  This module is
the TPU-native equivalent, structured 1:1 with the published LaMa
``FFCResNetGenerator`` so real checkpoints convert exactly
(``models/convert_lama.py``; parity test ``tests/test_convert_lama.py``):

- reflect-padded 7x7 stem over [masked_image, mask] (4 channels),
- ``downsamples`` stride-2 convs (the last splits into local/global paths),
- ``num_blocks`` FFC residual blocks: local 3x3 convs cross-connected with a
  SpectralTransform global path (1x1 → rFFT2(ortho) → 1x1 over interleaved
  re/im channels → iFFT, with a residual around the Fourier unit),
- transposed-conv (k3 s2 p1 op1) upsampling, reflect-padded 7x7 head,
  sigmoid output, composited so known pixels pass through exactly.

All BatchNorms are inference-folded into conv kernels/biases by the
converter; random init mirrors the folded layout.  Batched + jitted.
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
    base_channels: int = 64  # ngf
    num_blocks: int = 9  # FFC resnet blocks (big-lama uses 18)
    downsamples: int = 3
    global_ratio: float = 0.75  # global-path channel fraction in the blocks
    max_features: int = 1024

    def feats(self, i: int) -> int:
        return min(self.base_channels * (2**i), self.max_features)

    @property
    def deep_channels(self) -> int:
        return self.feats(self.downsamples)

    @property
    def cg(self) -> int:
        return int(self.deep_channels * self.global_ratio)

    @property
    def cl(self) -> int:
        return self.deep_channels - self.cg


def _conv(x, p, stride=1, pad="zero"):
    """Conv with torch-convention symmetric k//2 padding; ``pad`` selects
    zero (downsample convs) or reflect (stem/blocks/head, LaMa's default)."""
    k = p["kernel"].shape[0]
    r = k // 2
    if r and pad == "reflect":
        x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
        padding = ((0, 0), (0, 0))
    else:
        padding = ((r, r), (r, r))
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _deconv2x(x, p):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): expressed as
    an input-dilated conv with the converter-flipped kernel."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),  # [3, 3, I, O], spatially pre-flipped
        window_strides=(1, 1),
        padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _spectral(x, p):
    """LaMa SpectralTransform: 1x1 reduce → FourierUnit (with residual) →
    1x1 expand.  FFTs run in float32 with ortho normalization."""
    x = jax.nn.relu(_conv(x, p["conv1"]))
    b, h, w, c = x.shape
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    y = jnp.stack([f.real, f.imag], axis=-1).reshape(b, h, w // 2 + 1, 2 * c)
    y = jax.nn.relu(_conv(y.astype(x.dtype), p["fu"]))
    y = y.astype(jnp.float32).reshape(b, h, w // 2 + 1, c, 2)
    fu = jnp.fft.irfft2(
        jax.lax.complex(y[..., 0], y[..., 1]), s=(h, w), axes=(1, 2), norm="ortho"
    ).astype(x.dtype)
    return _conv(x + fu, p["conv2"])


def _ffc_bn_act(xl, xg, p):
    """One FFC + (folded) BN + ReLU: local/global cross-connections."""
    yl = _conv(xl, p["l2l"], pad="reflect") + _conv(xg, p["g2l"], pad="reflect")
    yg = _conv(xl, p["l2g"], pad="reflect") + _spectral(xg, p["g2g"])
    return jax.nn.relu(yl), jax.nn.relu(yg)


def ffc_block(xl, xg, p):
    """FFC residual block: two FFC_BN_ACT units + per-path residual."""
    yl, yg = _ffc_bn_act(xl, xg, p["conv1"])
    yl, yg = _ffc_bn_act(yl, yg, p["conv2"])
    return xl + yl, xg + yg


def forward(params: dict, images: jax.Array, masks: jax.Array, cfg: InpaintConfig):
    """images [B,H,W,3] float in [0,1]; masks [B,H,W] (1 = hole).
    Returns inpainted [B,H,W,3] in [0,1]."""
    m = masks[..., None].astype(images.dtype)
    x = jnp.concatenate([images * (1.0 - m), m], axis=-1)
    x = jax.nn.relu(_conv(x, params["stem"], pad="reflect"))
    for i, dp in enumerate(params["down"]):
        if "l2g" in dp:  # final downsample splits local/global
            xl = jax.nn.relu(_conv(x, dp["l2l"], stride=2))
            xg = jax.nn.relu(_conv(x, dp["l2g"], stride=2))
        else:
            x = jax.nn.relu(_conv(x, dp["l2l"], stride=2))
    for bp in params["blocks"]:
        xl, xg = ffc_block(xl, xg, bp)
    x = jnp.concatenate([xl, xg], axis=-1)
    for up in params["up"]:
        x = jax.nn.relu(_deconv2x(x, up))
    out = jax.nn.sigmoid(_conv(x, params["head"], pad="reflect").astype(jnp.float32))
    out = out.astype(images.dtype)
    # composite: keep known pixels exactly
    return images * (1.0 - m) + out * m


@functools.partial(jax.jit, static_argnames=("cfg",))
def inpaint_batch(params, images_u8, masks_u8, cfg: InpaintConfig):
    imgs = images_u8.astype(jnp.float32) / 255.0
    m = (masks_u8 > 0).astype(jnp.float32)
    out = forward(params, imgs, m, cfg)
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)


def init_params(cfg: InpaintConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    kiter = iter(jax.random.split(key, 1024))

    def conv_p(cin, cout, k=3):
        fan = k * k * cin
        return {
            "kernel": (
                jax.random.normal(next(kiter), (k, k, cin, cout), jnp.float32)
                * math.sqrt(2.0 / fan)
            ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    cl, cg = cfg.cl, cfg.cg

    def ffc_unit():
        return {
            "l2l": conv_p(cl, cl),
            "g2l": conv_p(cg, cl),
            "l2g": conv_p(cl, cg),
            "g2g": {
                "conv1": conv_p(cg, cg // 2, 1),
                "fu": conv_p(cg, cg, 1),  # over interleaved (re, im) channels
                "conv2": conv_p(cg // 2, cg, 1),
            },
        }

    down = []
    for i in range(cfg.downsamples):
        cin, cout = cfg.feats(i), cfg.feats(i + 1)
        if i == cfg.downsamples - 1:
            down.append({"l2l": conv_p(cin, cl), "l2g": conv_p(cin, cg)})
        else:
            down.append({"l2l": conv_p(cin, cout)})
    return {
        "stem": conv_p(4, cfg.feats(0), 7),
        "down": down,
        "blocks": [
            {"conv1": ffc_unit(), "conv2": ffc_unit()} for _ in range(cfg.num_blocks)
        ],
        "up": [
            conv_p(cfg.feats(i + 1), cfg.feats(i))
            for i in reversed(range(cfg.downsamples))
        ],
        "head": conv_p(cfg.feats(0), 3, 7),
    }


class LamaInpainter:
    """Reference-wrapper contract: ``(bgr image, mask) -> np image``
    (the callable shape the reference builds at main_window.py:3578)."""

    def __init__(
        self,
        params: dict | None = None,
        cfg: InpaintConfig | None = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — inpaint batches large
        enough to split are sharded on the data axis (params replicated
        once, lazily); smaller batches dispatch single-device (padding one
        region to dp_size regions would pay n_devices× compute for the
        identical result)."""
        self.cfg = cfg or InpaintConfig()
        self.mesh = mesh
        self.params = params
        self._params_repl = None

    def _dispatch(self, imgs: np.ndarray, msks: np.ndarray) -> np.ndarray:
        """[N,H,W,3]/[N,H,W] uint8 (already factor-padded) -> [N,H,W,3]."""
        if self.mesh is not None:
            from manga_ocr_tpu.parallel import mesh as meshlib

            if imgs.shape[0] >= meshlib.dp_size(self.mesh):
                if self._params_repl is None:
                    self._params_repl = meshlib.dp_replicate(self.params, self.mesh)
                n = imgs.shape[0]
                out = np.asarray(
                    inpaint_batch(
                        self._params_repl,
                        meshlib.dp_shard_batch(imgs, self.mesh),
                        meshlib.dp_shard_batch(msks, self.mesh),
                        self.cfg,
                    )
                )
                return out[:n]
        return np.asarray(
            inpaint_batch(self.params, jnp.asarray(imgs), jnp.asarray(msks), self.cfg)
        )

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
        return self._dispatch(img[None], msk[None])[0][:h, :w]

    def inpaint_many(
        self, images_bgr: list[np.ndarray], masks_u8: list[np.ndarray]
    ) -> list[np.ndarray]:
        """Batched multi-region inpainting: regions grouped by factor-padded
        shape, ONE device dispatch per shape group (the reference re-runs
        LaMa per area per redraw — ``/root/reference/src/ui/
        main_window.py:6981-7006`` — an O(areas) model-call loop)."""
        if self.params is None:
            raise RuntimeError("inpainter has no weights loaded")
        f = 2**self.cfg.downsamples
        prepped = []
        for img, msk in zip(images_bgr, masks_u8):
            h, w = img.shape[:2]
            ph, pw = (f - h % f) % f, (f - w % f) % f
            prepped.append(
                (
                    np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge"),
                    np.pad(msk, ((0, ph), (0, pw)), mode="constant"),
                    h,
                    w,
                )
            )
        by_shape: dict[tuple, list[int]] = {}
        for i, (img, _, _, _) in enumerate(prepped):
            by_shape.setdefault(img.shape[:2], []).append(i)
        out: list[np.ndarray | None] = [None] * len(prepped)
        for _, idxs in sorted(by_shape.items()):
            imgs = np.stack([prepped[i][0] for i in idxs])
            msks = np.stack([prepped[i][1] for i in idxs])
            res = self._dispatch(imgs, msks)
            for row, i in enumerate(idxs):
                h, w = prepped[i][2], prepped[i][3]
                out[i] = res[row][:h, :w]
        return out  # type: ignore[return-value]
