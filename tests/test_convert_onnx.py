"""ONNX converter parity: wire-format round-trip + executor math vs torch.

A tiny U-Net (conv/BN/relu, maxpool, convtranspose, nearest-Resize, concat,
sigmoid) is built in torch; an equivalent ONNX graph is authored with the
onnx_lite writer from the SAME weights, saved, re-parsed, and executed with
the JAX executor — output must match torch eval forward.  This covers the
reference's ONNX bubble-detector contract (``main_window.py:6776-6815``)
without onnx/onnxruntime in the environment.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from manga_ocr_tpu.models import onnx_lite as ol  # noqa: E402
from manga_ocr_tpu.models.convert_onnx import OnnxBubbleDetector, run_graph  # noqa: E402


class TinyUNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1)
        self.b1 = nn.BatchNorm2d(8, eps=1e-5)
        self.pool = nn.MaxPool2d(2)
        self.c2 = nn.Conv2d(8, 16, 3, padding=1)
        self.up = nn.ConvTranspose2d(16, 8, 2, 2)
        self.c3 = nn.Conv2d(16, 8, 3, padding=1)
        self.head = nn.Conv2d(8, 1, 1)

    def forward(self, x):
        a = torch.relu(self.b1(self.c1(x)))
        b = torch.relu(self.c2(self.pool(a)))
        u = self.up(b)
        m = torch.cat([u, a], 1)
        return torch.sigmoid(self.head(torch.relu(self.c3(m))))


def _np(t):
    return t.detach().numpy()


def build_graph(m: TinyUNet) -> ol.Graph:
    g = ol.Graph()
    init = g.initializers
    init["c1.w"], init["c1.b"] = _np(m.c1.weight), _np(m.c1.bias)
    init["bn.s"], init["bn.b"] = _np(m.b1.weight), _np(m.b1.bias)
    init["bn.m"], init["bn.v"] = _np(m.b1.running_mean), _np(m.b1.running_var)
    init["c2.w"], init["c2.b"] = _np(m.c2.weight), _np(m.c2.bias)
    init["up.w"], init["up.b"] = _np(m.up.weight), _np(m.up.bias)
    init["c3.w"], init["c3.b"] = _np(m.c3.weight), _np(m.c3.bias)
    init["h.w"], init["h.b"] = _np(m.head.weight), _np(m.head.bias)
    pads = [1, 1, 1, 1]
    g.nodes = [
        ol.Node("Conv", "c1", ["input", "c1.w", "c1.b"], ["x1"], {"pads": pads}),
        ol.Node(
            "BatchNormalization",
            "bn",
            ["x1", "bn.s", "bn.b", "bn.m", "bn.v"],
            ["x2"],
            {"epsilon": 1e-5},
        ),
        ol.Node("Relu", "r1", ["x2"], ["a"]),
        ol.Node(
            "MaxPool", "p", ["a"], ["x3"], {"kernel_shape": [2, 2], "strides": [2, 2]}
        ),
        ol.Node("Conv", "c2", ["x3", "c2.w", "c2.b"], ["x4"], {"pads": pads}),
        ol.Node("Relu", "r2", ["x4"], ["b"]),
        ol.Node(
            "ConvTranspose",
            "up",
            ["b", "up.w", "up.b"],
            ["u"],
            {"strides": [2, 2]},
        ),
        ol.Node("Concat", "cat", ["u", "a"], ["m"], {"axis": 1}),
        ol.Node("Conv", "c3", ["m", "c3.w", "c3.b"], ["x5"], {"pads": pads}),
        ol.Node("Relu", "r3", ["x5"], ["x6"]),
        ol.Node("Conv", "head", ["x6", "h.w", "h.b"], ["x7"], {}),
        ol.Node("Sigmoid", "sig", ["x7"], ["prob"]),
    ]
    g.inputs = [ol.ValueInfo("input", [1, 3, 32, 32])]
    g.outputs = [ol.ValueInfo("prob", [1, 1, 32, 32])]
    return g


@pytest.fixture(scope="module")
def model():
    torch.manual_seed(0)
    m = TinyUNet()
    with torch.no_grad():
        m.b1.running_mean.copy_(torch.randn(8) * 0.1)
        m.b1.running_var.copy_(torch.rand(8) * 0.5 + 0.5)
    m.eval()
    return m


def test_roundtrip_and_executor_match_torch(model, tmp_path):
    g = build_graph(model)
    path = str(tmp_path / "tiny_unet.onnx")
    ol.save_model(g, path)
    g2 = ol.load_model(path)
    assert len(g2.nodes) == len(g.nodes)
    assert set(g2.initializers) == set(g.initializers)
    assert [n.op_type for n in g2.nodes] == [n.op_type for n in g.nodes]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    import jax.numpy as jnp

    got = np.asarray(run_graph(g2, {"input": jnp.asarray(x)})[0])
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_detector_contract(model, tmp_path):
    """Full reference contract: page -> resize -> /255 NCHW -> graph ->
    squeeze -> resize back -> 0/255 threshold mask."""
    g = build_graph(model)
    path = str(tmp_path / "tiny_unet.onnx")
    ol.save_model(g, path)
    det = OnnxBubbleDetector.from_file(path)
    assert det.input_size == 32  # declared in the model's input shape
    page = np.random.default_rng(1).integers(0, 255, size=(70, 50, 3)).astype(np.uint8)
    mask = det.detect_bubble_mask(page)
    assert mask.shape == (70, 50)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})


def test_resize_and_upsample_ops(model):
    """Resize(sizes/scales) and legacy Upsample lower to jax.image.resize."""
    import jax.numpy as jnp

    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    g = ol.Graph()
    g.initializers["sizes"] = np.asarray([1, 1, 8, 8], np.int64)
    g.nodes = [ol.Node("Resize", "r", ["input", "", "", "sizes"], ["out"], {"mode": b"nearest"})]
    g.inputs = [ol.ValueInfo("input", [1, 1, 4, 4])]
    g.outputs = [ol.ValueInfo("out", [1, 1, 8, 8])]
    out = np.asarray(run_graph(g, {"input": jnp.asarray(x)})[0])
    ref = torch.nn.functional.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(out, ref)

    g.nodes = [ol.Node("Upsample", "u", ["input"], ["out"], {"mode": b"nearest", "scales": [1.0, 1.0, 2.0, 2.0]})]
    out2 = np.asarray(run_graph(g, {"input": jnp.asarray(x)})[0])
    np.testing.assert_allclose(out2, ref)


def test_bubble_detector_from_onnx_checkpoint(model, tmp_path):
    """detect/detector.BubbleDetector.from_checkpoint accepts .onnx files
    and produces detections through the standard pipeline path."""
    g = build_graph(model)
    path = str(tmp_path / "det.onnx")
    ol.save_model(g, path)
    from manga_ocr_tpu.detect.detector import BubbleDetector

    det = BubbleDetector.from_checkpoint(path)
    page = np.full((64, 48, 3), 255, np.uint8)
    mask = det.detect_bubble_mask(page)
    assert mask.shape == (64, 48)
    dets = det.detect_pages([page, page])
    assert len(dets) == 2


def test_tensor_parse_negative_varints():
    """Negative values in varint-encoded int64_data/int32_data must be
    two's-complement corrected (e.g. a Reshape shape initializer [-1, 256])
    — previously only the attribute parser applied the fix."""
    from manga_ocr_tpu.models import onnx_lite as ol

    buf = bytearray()
    ol._write_field(buf, 1, 0, 2)  # dims: 2
    ol._write_field(buf, 2, 0, 7)  # data_type INT64
    packed = bytearray()
    ol._write_varint(packed, (-1) & ((1 << 64) - 1))
    ol._write_varint(packed, 256)
    ol._write_field(buf, 7, 2, bytes(packed))
    ol._write_field(buf, 8, 2, b"shape")
    t = ol._parse_tensor(bytes(buf))
    assert t.array.tolist() == [-1, 256]


def test_negative_int_attribute_roundtrips():
    """A negative scalar int attribute (axis=-1 — ubiquitous in ONNX) must
    serialize as 64-bit two's complement (regression: the raw negative
    value made _write_varint loop forever)."""
    from manga_ocr_tpu.models import onnx_lite as ol

    data = ol._ser_attribute("axis", -1)
    a = ol._parse_attribute(bytes(data))
    assert a.name == "axis" and a.i == -1


def test_fp16_int32_data_is_bit_reinterpreted():
    """fp16 initializers in int32_data are uint16 BIT PATTERNS (0x3C00 ==
    1.0), not values (regression: value-cast produced 15360.0)."""
    from manga_ocr_tpu.models import onnx_lite as ol

    buf = bytearray()
    ol._write_field(buf, 1, 0, 2)   # dims: 2
    ol._write_field(buf, 2, 0, ol.DT_FLOAT16)
    ol._write_field(buf, 5, 0, 0x3C00)  # int32_data: fp16 1.0
    ol._write_field(buf, 5, 0, 0xC000)  # int32_data: fp16 -2.0
    ol._write_field(buf, 8, 2, b"w")
    t = ol._parse_tensor(bytes(buf))
    assert t.array.dtype == np.float16
    assert t.array.tolist() == [1.0, -2.0]
