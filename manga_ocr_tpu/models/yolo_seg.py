"""YOLO-family instance-segmentation detector in JAX (second bubble detector).

The reference's second detector family is Ultralytics YOLOv8-seg run as a
torch black box (``_run_yolov8_inference``, ``/root/reference/src/ui/
main_window.py:6817-6841``): per-instance masks are OR-ed into one
full-image 0/255 bubble mask.  This module implements the architecture
natively (config-scalable n/s/m widths):

- backbone: Conv(stride 2) stem, C2f stages (residual bottlenecks), SPPF,
- neck: top-down + bottom-up PAN over P3/P4/P5 (C2f without shortcuts),
- heads: anchor-free decoupled branches per level — box (DFL over reg_max
  bins), class, and mask coefficients — plus a proto net on P3 (conv,
  2x2-stride-2 transposed conv, conv, conv) producing mask bases,
- inference: batched jitted forward; box decode + NMS + proto⊗coeff mask
  assembly on the host (data-dependent shapes).

The module structure, channel rules (box c2 = max(16, P3//4, 4*reg_max);
cls c3 = max(P3, min(nc, 100)); coeff c4 = max(P3//4, num_masks)) and
stride-2 padding (symmetric k//2, torch convention) correspond 1:1 to the
deployed YOLOv8-seg checkpoints, so real weights convert exactly
(``models/convert_yolo.py`` folds BatchNorm into conv kernel+bias; parity
test: ``tests/test_convert_yolo.py``).  Weights load from an ``.npz``
pytree (``save/load_params`` pattern shared with ``models/detector.py``).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloSegConfig:
    input_size: int = 640
    num_classes: int = 1  # speech-bubble
    width: tuple = (16, 32, 64, 128, 256)  # stem..P5 channels (n-scale)
    depth: tuple = (1, 2, 2, 1)  # C2f bottleneck counts per stage
    reg_max: int = 16
    num_masks: int = 32
    conf_threshold: float = 0.25
    iou_threshold: float = 0.7
    mask_threshold: float = 0.5


def silu(x):
    return x * jax.nn.sigmoid(x)


def _conv(x, p, stride=1):
    """Conv with torch's symmetric k//2 padding (NOT XLA "SAME": for
    stride 2 XLA pads asymmetrically, which would shift every feature map
    half a pixel vs the torch checkpoints)."""
    k = p["kernel"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _conv_silu(x, p, stride=1):
    return silu(_conv(x, p, stride))


def _conv_transpose2x2(x, p):
    """torch ConvTranspose2d(k=2, s=2, p=0): exact scatter formulation —
    out[2i+u, 2j+v, o] = sum_c x[i,j,c] * W[u,v,c,o] + b."""
    b, h, w, c = x.shape
    k = p["kernel"].astype(x.dtype)  # [2, 2, C, O]
    y = jnp.einsum("bhwc,uvco->bhuwvo", x, k)
    y = y.reshape(b, h * 2, w * 2, k.shape[-1])
    return y + p["bias"].astype(x.dtype)


def _bottleneck(x, p, shortcut=True):
    y = _conv_silu(x, p["cv1"])
    y = _conv_silu(y, p["cv2"])
    return x + y if shortcut and x.shape == y.shape else y


def _c2f(x, p, shortcut=True):
    """YOLOv8 C2f; backbone stages use residual bottlenecks, neck stages
    pass shortcut=False (the checkpoints' structure)."""
    y = _conv_silu(x, p["cv1"])
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for bp in p["m"]:
        outs.append(_bottleneck(outs[-1], bp, shortcut))
    return _conv_silu(jnp.concatenate(outs, axis=-1), p["cv2"])


def _sppf(x, p):
    y = _conv_silu(x, p["cv1"])
    pools = [y]
    for _ in range(3):
        pools.append(
            jax.lax.reduce_window(
                pools[-1], -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"
            )
        )
    return _conv_silu(jnp.concatenate(pools, axis=-1), p["cv2"])


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


def forward(params: dict, images: jax.Array, cfg: YoloSegConfig):
    """[B, S, S, 3] float in [0,1] -> (preds [B, N, no], protos [B, s/4, s/4, nm]).

    ``no = 4*reg_max + nc + nm``; N = sum of P3/P4/P5 grid cells."""
    w = cfg.width
    x = _conv_silu(images, params["stem"], stride=2)  # /2
    x = _conv_silu(x, params["down1"], stride=2)  # /4
    x = _c2f(x, params["c2f1"])
    x = _conv_silu(x, params["down2"], stride=2)  # /8
    p3 = _c2f(x, params["c2f2"])
    x = _conv_silu(p3, params["down3"], stride=2)  # /16
    p4 = _c2f(x, params["c2f3"])
    x = _conv_silu(p4, params["down4"], stride=2)  # /32
    p5 = _sppf(_c2f(x, params["c2f4"]), params["sppf"])

    # top-down (neck C2f: shortcut=False, matching the checkpoints)
    u4 = _c2f(jnp.concatenate([_upsample2(p5), p4], -1), params["n_td4"], False)
    u3 = _c2f(jnp.concatenate([_upsample2(u4), p3], -1), params["n_td3"], False)
    # bottom-up
    d4 = _c2f(
        jnp.concatenate([_conv_silu(u3, params["n_bu3"], stride=2), u4], -1),
        params["n_bu4"],
        False,
    )
    d5 = _c2f(
        jnp.concatenate([_conv_silu(d4, params["n_bu4c"], stride=2), p5], -1),
        params["n_bu5"],
        False,
    )

    # Proto: conv -> 2x2/s2 transposed conv -> conv -> conv (all SiLU)
    pr = params["proto"]
    protos = _conv_silu(u3, pr["cv1"])
    protos = _conv_transpose2x2(protos, pr["up"])
    protos = _conv_silu(protos, pr["cv2"])
    protos = _conv_silu(protos, pr["cv3"])  # [B, s/4, s/4, nm]

    def _branch(feat, bp):
        y = _conv_silu(feat, bp["c1"])
        y = _conv_silu(y, bp["c2"])
        return _conv(y, bp["out"])  # plain conv (bias, no BN/act)

    preds = []
    hp = params["heads"]
    for i, feat in enumerate((u3, d4, d5)):
        box = _branch(feat, hp["box"][i])
        cls = _branch(feat, hp["cls"][i])
        cf = _branch(feat, hp["coeff"][i])
        y = jnp.concatenate([box, cls, cf], axis=-1)
        b, gh, gw, no = y.shape
        preds.append(y.reshape(b, gh * gw, no))
    return jnp.concatenate(preds, axis=1), protos


@functools.partial(jax.jit, static_argnames=("cfg",))
def infer(params: dict, images_u8: jax.Array, cfg: YoloSegConfig):
    """uint8 RGB [B, H, W, 3] -> raw (preds, protos) at cfg.input_size."""
    s = cfg.input_size
    x = jax.image.resize(
        images_u8.astype(jnp.float32) / 255.0, (*images_u8.shape[:1], s, s, 3), "linear"
    )
    return forward(params, x, cfg)


# ---------------------------------------------------------------------------
# Host post-processing: decode, NMS, mask assembly
# ---------------------------------------------------------------------------


def _grid_anchors(size: int, strides=(8, 16, 32)) -> tuple[np.ndarray, np.ndarray]:
    pts, strs = [], []
    for st in strides:
        g = size // st
        yy, xx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        pts.append(np.stack([(xx + 0.5) * st, (yy + 0.5) * st], -1).reshape(-1, 2))
        strs.append(np.full((g * g,), st, np.float32))
    return np.concatenate(pts).astype(np.float32), np.concatenate(strs)


def _nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> list[int]:
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_thr]
    return keep


def postprocess(
    preds: np.ndarray,  # [N, no] for ONE image
    protos: np.ndarray,  # [s/4, s/4, nm]
    cfg: YoloSegConfig,
    out_h: int,
    out_w: int,
) -> list[dict]:
    """Decode one image's raw outputs into instances:
    [{"box": [x1,y1,x2,y2] in output coords, "score", "mask" (bool [out])}]."""
    no = 4 * cfg.reg_max + cfg.num_classes + cfg.num_masks
    assert preds.shape[-1] == no
    rm = cfg.reg_max
    box_logits = preds[:, : 4 * rm].reshape(-1, 4, rm)
    cls_logits = preds[:, 4 * rm : 4 * rm + cfg.num_classes]
    coeffs = preds[:, 4 * rm + cfg.num_classes :]

    scores = 1.0 / (1.0 + np.exp(-cls_logits.max(axis=-1)))
    keep0 = scores >= cfg.conf_threshold
    if not keep0.any():
        return []
    anchors, strides = _grid_anchors(cfg.input_size)
    box_logits, scores, coeffs = box_logits[keep0], scores[keep0], coeffs[keep0]
    anchors, strides = anchors[keep0], strides[keep0]

    # DFL: softmax expectation over reg_max bins -> l,t,r,b distances
    e = np.exp(box_logits - box_logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    dist = (p * np.arange(rm)).sum(-1) * strides[:, None]  # [n,4]
    x1y1 = anchors - dist[:, :2]
    x2y2 = anchors + dist[:, 2:]
    boxes = np.concatenate([x1y1, x2y2], -1)

    keep = _nms(boxes, scores, cfg.iou_threshold)
    boxes, scores, coeffs = boxes[keep], scores[keep], coeffs[keep]

    # masks: sigmoid(protos @ coeff), crop to box, resize to page
    ph, pw, nm = protos.shape
    flat = protos.reshape(-1, nm)
    sx, sy = out_w / cfg.input_size, out_h / cfg.input_size
    instances = []
    for box, score, c in zip(boxes, scores, coeffs):
        m = 1.0 / (1.0 + np.exp(-(flat @ c))).reshape(ph, pw)
        # crop to box in proto coords
        bx = box / cfg.input_size * np.array([pw, ph, pw, ph])
        x1, y1, x2, y2 = np.clip(bx, 0, [pw, ph, pw, ph]).astype(int)
        crop_mask = np.zeros_like(m)
        crop_mask[y1:y2, x1:x2] = m[y1:y2, x1:x2]
        # nearest upsample to output size
        yi = np.clip((np.arange(out_h) * ph // out_h), 0, ph - 1)
        xi = np.clip((np.arange(out_w) * pw // out_w), 0, pw - 1)
        full = crop_mask[yi][:, xi] > cfg.mask_threshold
        out_box = box * np.array([sx, sy, sx, sy])
        instances.append({"box": out_box, "score": float(score), "mask": full})
    return instances


def combined_bubble_mask(instances: list[dict], out_h: int, out_w: int) -> np.ndarray:
    """OR all instance masks into one 0/255 mask (the reference contract)."""
    mask = np.zeros((out_h, out_w), np.uint8)
    for inst in instances:
        mask[inst["mask"]] = 255
    return mask


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(cfg: YoloSegConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    kiter = iter(jax.random.split(key, 256))

    def conv_p(cin, cout, k=3):
        fan = k * k * cin
        return {
            "kernel": (
                jax.random.normal(next(kiter), (k, k, cin, cout), jnp.float32)
                * math.sqrt(2.0 / fan)
            ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    def c2f_p(cin, cout, n):
        half = cout // 2
        return {
            "cv1": conv_p(cin, cout, 1),
            "m": [
                {"cv1": conv_p(half, half), "cv2": conv_p(half, half)}
                for _ in range(n)
            ],
            "cv2": conv_p(cout + half * n, cout, 1),
        }

    w = cfg.width
    d = cfg.depth
    nm, nc, rm = cfg.num_masks, cfg.num_classes, cfg.reg_max
    # Checkpoint channel rules (Detect/Segment head defaults)
    c2 = max(16, w[2] // 4, 4 * rm)  # box branch
    c3 = max(w[2], min(nc, 100))  # cls branch
    c4 = max(w[2] // 4, nm)  # mask-coeff branch
    cp = w[2]  # proto hidden channels (256 x width multiplier == P3 width)

    def branch_p(cin, mid, cout):
        return {"c1": conv_p(cin, mid), "c2": conv_p(mid, mid), "out": conv_p(mid, cout, 1)}

    return {
        "stem": conv_p(3, w[0]),
        "down1": conv_p(w[0], w[1]),
        "c2f1": c2f_p(w[1], w[1], d[0]),
        "down2": conv_p(w[1], w[2]),
        "c2f2": c2f_p(w[2], w[2], d[1]),
        "down3": conv_p(w[2], w[3]),
        "c2f3": c2f_p(w[3], w[3], d[2]),
        "down4": conv_p(w[3], w[4]),
        "c2f4": c2f_p(w[4], w[4], d[3]),
        "sppf": {"cv1": conv_p(w[4], w[4] // 2, 1), "cv2": conv_p(w[4] * 2, w[4], 1)},
        "n_td4": c2f_p(w[4] + w[3], w[3], d[0]),
        "n_td3": c2f_p(w[3] + w[2], w[2], d[0]),
        "n_bu3": conv_p(w[2], w[2]),
        "n_bu4": c2f_p(w[2] + w[3], w[3], d[0]),
        "n_bu4c": conv_p(w[3], w[3]),
        "n_bu5": c2f_p(w[3] + w[4], w[4], d[0]),
        "proto": {
            "cv1": conv_p(w[2], cp),
            "up": {
                "kernel": (
                    jax.random.normal(next(kiter), (2, 2, cp, cp), jnp.float32) * 0.05
                ).astype(dtype),
                "bias": jnp.zeros((cp,), dtype),
            },
            "cv2": conv_p(cp, cp),
            "cv3": conv_p(cp, nm, 1),
        },
        "heads": {
            "box": [branch_p(w[2 + i], c2, 4 * rm) for i in range(3)],
            "cls": [branch_p(w[2 + i], c3, nc) for i in range(3)],
            "coeff": [branch_p(w[2 + i], c4, nm) for i in range(3)],
        },
    }


def save_params(params: dict, path: str) -> None:
    from manga_ocr_tpu.models.detector import save_params as _save

    _save(params, path)


def load_params(path: str, cfg: YoloSegConfig, dtype=jnp.float32) -> dict:
    """Load a flat-npz pytree saved by ``save_params`` (template-driven)."""
    from manga_ocr_tpu.models.detector import fill_template

    data = np.load(path)
    return fill_template(data, init_params(cfg, jax.random.PRNGKey(0), dtype), dtype)


class YoloBubbleDetector:
    """Reference-contract wrapper: page BGR -> OR-ed 0/255 bubble mask."""

    def __init__(self, params: dict, cfg: YoloSegConfig | None = None):
        self.cfg = cfg or YoloSegConfig()
        self.params = params

    def detect_bubble_mask(self, page_bgr: np.ndarray) -> np.ndarray:
        h, w = page_bgr.shape[:2]
        rgb = jnp.asarray(page_bgr[None, ..., ::-1])
        preds, protos = infer(self.params, rgb, self.cfg)
        instances = postprocess(
            np.asarray(preds[0], np.float32),
            np.asarray(protos[0], np.float32),
            self.cfg,
            h,
            w,
        )
        return combined_bubble_mask(instances, h, w)
