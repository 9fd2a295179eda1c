"""ONNX graph -> JAX executor (the ONNX bubble-detector converter).

The reference runs its primary DL bubble segmenter as an onnxruntime
session (``_run_onnx_inference``, ``/root/reference/src/ui/
main_window.py:6776-6815``: resize to the model-declared input, /255
float32 NCHW, output squeezed to [H, W], >0.5 → 0/255 mask).  Without
onnxruntime in this environment, this module executes the parsed graph
(``models/onnx_lite``) directly in JAX, covering the conv-net op set
U-Net-style segmenters use.  The whole thing jits into one XLA program,
batched over pages — the TPU-native replacement for the CPU session.

Tensors stay in ONNX's NCHW layout (no relayout churn; XLA re-lays
internally).  Parity: ``tests/test_convert_onnx.py`` checks op math against
torch and round-trips a tiny U-Net through the writer/reader/executor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.models.onnx_lite import Graph, load_model


def _attr(node, name, default=None):
    a = node.attrs.get(name)
    if a is None:
        return default
    return a.value if hasattr(a, "value") else a  # parsed Attribute or raw


def _pads4(node):
    pads = _attr(node, "pads", [0, 0, 0, 0])
    if _attr(node, "auto_pad", b"NOTSET") not in (b"NOTSET", "NOTSET", None):
        raise NotImplementedError("auto_pad not supported; export with explicit pads")
    # ONNX: [x1_begin, x2_begin, x1_end, x2_end]
    return (int(pads[0]), int(pads[2])), (int(pads[1]), int(pads[3]))


def _op_conv(node, vals):
    x, w = vals[node.inputs[0]], vals[node.inputs[1]]
    strides = tuple(int(s) for s in _attr(node, "strides", [1, 1]))
    dil = tuple(int(d) for d in _attr(node, "dilations", [1, 1]))
    groups = int(_attr(node, "group", 1))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=_pads4(node),
        rhs_dilation=dil,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if len(node.inputs) > 2:
        y = y + vals[node.inputs[2]].astype(x.dtype)[None, :, None, None]
    return y


def _op_conv_transpose(node, vals):
    x, w = vals[node.inputs[0]], vals[node.inputs[1]]  # w: [I, O/g, kh, kw]
    strides = tuple(int(s) for s in _attr(node, "strides", [1, 1]))
    (pt, pb), (pl, pr) = _pads4(node)
    opad = tuple(int(v) for v in _attr(node, "output_padding", [0, 0]))
    if int(_attr(node, "group", 1)) != 1:
        raise NotImplementedError("grouped ConvTranspose")
    kh, kw = w.shape[2], w.shape[3]
    # input-dilated conv with the spatially flipped, IO-swapped kernel
    wf = jnp.flip(jnp.flip(w, 2), 3).transpose(1, 0, 2, 3)  # [O, I, kh, kw]
    y = jax.lax.conv_general_dilated(
        x,
        wf.astype(x.dtype),
        window_strides=(1, 1),
        padding=(
            (kh - 1 - pt, kh - 1 - pb + opad[0]),
            (kw - 1 - pl, kw - 1 - pr + opad[1]),
        ),
        lhs_dilation=strides,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if len(node.inputs) > 2:
        y = y + vals[node.inputs[2]].astype(x.dtype)[None, :, None, None]
    return y


def _op_batchnorm(node, vals):
    x = vals[node.inputs[0]]
    s, b, mean, var = (vals[node.inputs[i]].astype(jnp.float32) for i in (1, 2, 3, 4))
    eps = float(_attr(node, "epsilon", 1e-5))
    scale = s * jax.lax.rsqrt(var + eps)
    y = x.astype(jnp.float32) * scale[None, :, None, None] + (
        b - mean * scale
    )[None, :, None, None]
    return y.astype(x.dtype)


def _op_pool(node, vals, kind):
    x = vals[node.inputs[0]]
    ks = tuple(int(k) for k in _attr(node, "kernel_shape"))
    strides = tuple(int(s) for s in _attr(node, "strides", ks))
    (pt, pb), (pl, pr) = _pads4(node)
    window = (1, 1) + ks
    stride = (1, 1) + strides
    pads = ((0, 0), (0, 0), (pt, pb), (pl, pr))
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, stride, pads)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, stride, pads)
    if int(_attr(node, "count_include_pad", 0)):
        return summed / float(ks[0] * ks[1])
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, stride, pads)
    return summed / counts


def _resize_hw(x, out_h, out_w, mode):
    b, c, h, w = x.shape
    method = "nearest" if mode in (b"nearest", "nearest") else "linear"
    return jax.image.resize(x, (b, c, int(out_h), int(out_w)), method)


def _op_resize(node, vals):
    x = vals[node.inputs[0]]
    mode = _attr(node, "mode", b"nearest")
    sizes = scales = None
    # opset>=11: inputs = X, roi, scales, sizes ; opset 10: X, scales
    for name in node.inputs[1:]:
        if not name:
            continue
        arr = np.asarray(vals[name])
        if arr.size == 0:
            continue
        if arr.dtype in (np.int64, np.int32):
            sizes = arr
        elif arr.size == 4:
            scales = arr
    if sizes is not None:
        return _resize_hw(x, sizes[-2], sizes[-1], mode)
    if scales is not None:
        return _resize_hw(x, round(x.shape[2] * scales[2]), round(x.shape[3] * scales[3]), mode)
    raise ValueError("Resize without scales/sizes")


def _op_upsample(node, vals):
    x = vals[node.inputs[0]]
    scales = _attr(node, "scales")
    if scales is None:
        scales = np.asarray(vals[node.inputs[1]])
    return _resize_hw(
        x,
        round(x.shape[2] * float(scales[2])),
        round(x.shape[3] * float(scales[3])),
        _attr(node, "mode", b"nearest"),
    )


def _op_pad(node, vals):
    x = vals[node.inputs[0]]
    pads = _attr(node, "pads")
    if pads is None:
        pads = np.asarray(vals[node.inputs[1]]).tolist()
    mode = _attr(node, "mode", b"constant")
    n = x.ndim
    cfg = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    if mode in (b"constant", "constant"):
        cval = 0.0
        if len(node.inputs) > 2 and node.inputs[2]:
            cval = float(np.asarray(vals[node.inputs[2]]))
        return jnp.pad(x, cfg, constant_values=cval)
    return jnp.pad(x, cfg, mode="reflect" if mode in (b"reflect", "reflect") else "edge")


def run_graph(graph: Graph, feeds: dict) -> list:
    """Execute the graph on the given input arrays; returns output list."""
    vals: dict = {}
    for name, arr in graph.initializers.items():
        vals[name] = jnp.asarray(arr) if arr.dtype != np.int64 else arr
    vals.update(feeds)
    for node in graph.nodes:
        op = node.op_type
        if op == "Conv":
            out = _op_conv(node, vals)
        elif op == "ConvTranspose":
            out = _op_conv_transpose(node, vals)
        elif op == "BatchNormalization":
            out = _op_batchnorm(node, vals)
        elif op == "Relu":
            out = jax.nn.relu(vals[node.inputs[0]])
        elif op == "LeakyRelu":
            out = jax.nn.leaky_relu(
                vals[node.inputs[0]], float(_attr(node, "alpha", 0.01))
            )
        elif op == "Sigmoid":
            out = jax.nn.sigmoid(vals[node.inputs[0]])
        elif op == "Tanh":
            out = jnp.tanh(vals[node.inputs[0]])
        elif op == "Clip":
            lo = float(np.asarray(vals[node.inputs[1]])) if len(node.inputs) > 1 and node.inputs[1] else _attr(node, "min", -np.inf)
            hi = float(np.asarray(vals[node.inputs[2]])) if len(node.inputs) > 2 and node.inputs[2] else _attr(node, "max", np.inf)
            out = jnp.clip(vals[node.inputs[0]], lo, hi)
        elif op == "MaxPool":
            out = _op_pool(node, vals, "max")
        elif op == "AveragePool":
            out = _op_pool(node, vals, "avg")
        elif op == "GlobalAveragePool":
            out = jnp.mean(vals[node.inputs[0]], axis=(2, 3), keepdims=True)
        elif op == "Concat":
            axis = int(_attr(node, "axis", 1))
            out = jnp.concatenate([vals[i] for i in node.inputs], axis=axis)
        elif op == "Add":
            out = vals[node.inputs[0]] + vals[node.inputs[1]]
        elif op == "Mul":
            out = vals[node.inputs[0]] * vals[node.inputs[1]]
        elif op == "Resize":
            out = _op_resize(node, vals)
        elif op == "Upsample":
            out = _op_upsample(node, vals)
        elif op == "Pad":
            out = _op_pad(node, vals)
        elif op in ("Identity", "Cast", "Dropout"):
            out = vals[node.inputs[0]]
        elif op == "Constant":
            t = _attr(node, "value")
            out = jnp.asarray(t.array) if hasattr(t, "array") else jnp.asarray(t)
        elif op == "Reshape":
            shape = np.asarray(vals[node.inputs[1]]).tolist()
            x = vals[node.inputs[0]]
            shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
            out = jnp.reshape(x, shape)
        elif op == "Transpose":
            out = jnp.transpose(
                vals[node.inputs[0]], _attr(node, "perm")
            )
        elif op == "Squeeze":
            axes = _attr(node, "axes")
            if axes is None and len(node.inputs) > 1:
                axes = np.asarray(vals[node.inputs[1]]).tolist()
            out = jnp.squeeze(vals[node.inputs[0]], tuple(int(a) for a in (axes or [])) or None)
        else:
            raise NotImplementedError(f"ONNX op not supported: {op}")
        for o in node.outputs:
            if o:
                vals[o] = out
    return [vals[vi.name] for vi in graph.outputs]


class OnnxBubbleDetector:
    """Reference ONNX-wrapper contract on top of the JAX executor:
    page BGR uint8 -> 0/255 bubble mask at page size (threshold 0.5)."""

    def __init__(self, graph: Graph, input_size: int | None = None):
        self.graph = graph
        # the image input is the first graph input that is NOT an
        # initializer (exporters with keep_initializers_as_inputs=True list
        # every weight tensor in graph.inputs too)
        data_inputs = [
            vi for vi in graph.inputs if vi.name not in graph.initializers
        ]
        vi = data_inputs[0] if data_inputs else None
        self.input_name = vi.name if vi is not None else "input"
        dh = dw = None
        if vi is not None and len(vi.shape) == 4:
            h, w = vi.shape[2], vi.shape[3]
            if h and w:
                dh, dw = int(h), int(w)  # may be non-square
        if input_size:
            dh = dw = int(input_size)
        self.in_h = dh or 512  # reference fallback
        self.in_w = dw or 512
        self.input_size = self.in_h  # kept for back-compat with callers
        self._jitted = jax.jit(lambda feeds: run_graph(self.graph, feeds))

    @staticmethod
    def from_file(path: str, input_size: int | None = None) -> "OnnxBubbleDetector":
        return OnnxBubbleDetector(load_model(path), input_size)

    def detect_bubble_mask(self, page_bgr: np.ndarray) -> np.ndarray:
        h, w = page_bgr.shape[:2]
        from PIL import Image

        rgb = np.asarray(
            Image.fromarray(page_bgr[..., ::-1]).resize(
                (self.in_w, self.in_h), Image.BILINEAR
            ),
            np.float32,
        )
        x = jnp.asarray(rgb.transpose(2, 0, 1)[None] / 255.0)
        out = np.asarray(self._jitted({self.input_name: x})[0], np.float32)
        prob = out.squeeze()
        if prob.ndim != 2:
            prob = prob.reshape(prob.shape[-2], prob.shape[-1])
        mask = (
            np.asarray(
                Image.fromarray((prob * 255).astype(np.uint8)).resize(
                    (w, h), Image.BILINEAR
                ),
                np.float32,
            )
            / 255.0
        )
        return (mask > 0.5).astype(np.uint8) * 255
