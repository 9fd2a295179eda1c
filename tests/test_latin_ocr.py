"""Golden parity + contract tests for the TPU-native Latin OCR stack.

Torch twins are built with the EXACT public parameter names
(``basenet.slice1.0.weight`` … ``conv_cls.8.bias``;
``FeatureExtraction.ConvNet.0.weight`` … ``Prediction.bias``) at scaled-down
channels, weights AND BatchNorm running stats randomized, converted via
``models/convert_latin.py``, and the JAX forward asserted against the torch
forward (eval mode) — the proven ``test_convert_yolo`` pattern.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.detect import craft_boxes  # noqa: E402
from manga_ocr_tpu.engine.latin import TpuLatinEngine  # noqa: E402
from manga_ocr_tpu.models import craft as craft_mod  # noqa: E402
from manga_ocr_tpu.models import crnn as crnn_mod  # noqa: E402
from manga_ocr_tpu.models.convert_latin import (  # noqa: E402
    convert_craft_state_dict,
    convert_crnn_state_dict,
)

# ---------------------------------------------------------------------------
# torch twins
# ---------------------------------------------------------------------------

CRAFT_CFG = craft_mod.CraftConfig(vgg_channels=(4, 8, 16, 32, 32, 64), head_channels=8)
CRNN_CFG = crnn_mod.CrnnConfig(num_classes=13, output_channel=32, hidden_size=16)


def _seq(named_modules):
    s = nn.Sequential()
    for name, mod in named_modules:
        s.add_module(name, mod)
    return s


def _cbr(cin, cout):  # conv + BN + ReLU triple (vgg16_bn block unit)
    return [nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True)]


class TorchCraft(nn.Module):
    """Twin of the public CRAFT: vgg16_bn slices split at (12, 19, 29, 39)
    — original feature indices as child names, slices end at BatchNorm."""

    def __init__(self, cfg: craft_mod.CraftConfig):
        super().__init__()
        c1, c2, c3, c4, c5, fc = cfg.vgg_channels
        hc = cfg.head_channels
        feats = (
            _cbr(3, c1) + _cbr(c1, c1) + [nn.MaxPool2d(2)]  # 0..6
            + _cbr(c1, c2) + _cbr(c2, c2) + [nn.MaxPool2d(2)]  # 7..13
            + _cbr(c2, c3) + _cbr(c3, c3) + _cbr(c3, c3) + [nn.MaxPool2d(2)]  # 14..23
            + _cbr(c3, c4) + _cbr(c4, c4) + _cbr(c4, c4) + [nn.MaxPool2d(2)]  # 24..33
            + _cbr(c4, c5) + _cbr(c5, c5) + _cbr(c5, c5) + [nn.MaxPool2d(2)]  # 34..43
        )
        basenet = nn.Module()
        basenet.slice1 = _seq((str(i), feats[i]) for i in range(12))
        basenet.slice2 = _seq((str(i), feats[i]) for i in range(12, 19))
        basenet.slice3 = _seq((str(i), feats[i]) for i in range(19, 29))
        basenet.slice4 = _seq((str(i), feats[i]) for i in range(29, 39))
        basenet.slice5 = _seq(
            [
                ("0", nn.MaxPool2d(3, 1, 1)),
                ("1", nn.Conv2d(c5, fc, 3, padding=6, dilation=6)),
                ("2", nn.Conv2d(fc, fc, 1)),
            ]
        )
        self.basenet = basenet
        o1, o2, o3 = max(c5 // 2, 1), max(c5 // 4, 1), max(c5 // 8, 1)

        def double_conv(cin, mid, cout):
            m = nn.Module()
            m.conv = nn.Sequential(
                nn.Conv2d(cin, mid, 1),
                nn.BatchNorm2d(mid),
                nn.ReLU(True),
                nn.Conv2d(mid, cout, 3, padding=1),
                nn.BatchNorm2d(cout),
                nn.ReLU(True),
            )
            return m

        self.upconv1 = double_conv(fc + c5, c5, o1)
        self.upconv2 = double_conv(o1 + c4, o1, o2)
        self.upconv3 = double_conv(o2 + c3, o2, o3)
        self.upconv4 = double_conv(o3 + c2, o3, hc)
        hc2 = max(hc // 2, 1)
        self.conv_cls = nn.Sequential(
            nn.Conv2d(hc, hc, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(hc, hc, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(hc, hc2, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(hc2, hc2, 1), nn.ReLU(True),
            nn.Conv2d(hc2, 2, 1),
        )

    def forward(self, x):
        s1 = self.basenet.slice1(x)
        s2 = self.basenet.slice2(s1)
        s3 = self.basenet.slice3(s2)
        s4 = self.basenet.slice4(s3)
        s5 = self.basenet.slice5(s4)
        up = lambda y, ref: nn.functional.interpolate(
            y, size=ref.shape[2:], mode="bilinear", align_corners=False
        )
        y = self.upconv1.conv(torch.cat([s5, s4], 1))
        y = self.upconv2.conv(torch.cat([up(y, s3), s3], 1))
        y = self.upconv3.conv(torch.cat([up(y, s2), s2], 1))
        y = self.upconv4.conv(torch.cat([up(y, s1), s1], 1))
        return self.conv_cls(y)  # [B, 2, H/2, W/2]


class TorchBiLSTM(nn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.rnn = nn.LSTM(cin, hidden, bidirectional=True, batch_first=True)
        self.linear = nn.Linear(hidden * 2, cout)

    def forward(self, x):
        out, _ = self.rnn(x)
        return self.linear(out)


class TorchCrnn(nn.Module):
    """Twin of the None-VGG-BiLSTM-CTC recognizer (module names preserved)."""

    def __init__(self, cfg: crnn_mod.CrnnConfig):
        super().__init__()
        c1, c2, c3, c4 = cfg.stage_channels
        hs = cfg.hidden_size
        fe = nn.Module()
        fe.ConvNet = nn.Sequential(
            nn.Conv2d(1, c1, 3, 1, 1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(c1, c2, 3, 1, 1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(c2, c3, 3, 1, 1), nn.ReLU(True),
            nn.Conv2d(c3, c3, 3, 1, 1), nn.ReLU(True), nn.MaxPool2d((2, 1)),
            nn.Conv2d(c3, c4, 3, 1, 1, bias=False), nn.BatchNorm2d(c4), nn.ReLU(True),
            nn.Conv2d(c4, c4, 3, 1, 1, bias=False), nn.BatchNorm2d(c4), nn.ReLU(True),
            nn.MaxPool2d((2, 1)),
            nn.Conv2d(c4, c4, 2, 1, 0), nn.ReLU(True),
        )
        self.FeatureExtraction = fe
        self.AdaptiveAvgPool = nn.AdaptiveAvgPool2d((None, 1))
        self.SequenceModeling = nn.Sequential(
            TorchBiLSTM(c4, hs, hs), TorchBiLSTM(hs, hs, hs)
        )
        self.Prediction = nn.Linear(hs, cfg.num_classes)

    def forward(self, x):
        v = self.FeatureExtraction.ConvNet(x)  # [B, C, H', W']
        v = self.AdaptiveAvgPool(v.permute(0, 3, 1, 2))  # [B, W', C, 1]
        v = v.squeeze(3)  # [B, W', C]
        return self.Prediction(self.SequenceModeling(v))


def _randomize_bn(module, gen):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.3, 0.3, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.3, 0.3, generator=gen)


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_craft_parity_vs_torch_twin():
    gen = torch.Generator().manual_seed(0)
    twin = TorchCraft(CRAFT_CFG).eval()
    _randomize_bn(twin, gen)
    params = convert_craft_state_dict(twin.state_dict())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(craft_mod.craft_forward(params, jnp.asarray(x)))
    # BN folding reorders float ops through ~20 conv layers (same bound as
    # the yolo/lama converter tests)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-3)


def test_craft_random_init_shapes():
    params = craft_mod.init_craft_params(CRAFT_CFG, jax.random.PRNGKey(0))
    run = craft_mod.make_jitted_craft(CRAFT_CFG)
    img = np.zeros((1, 32, 32, 3), np.uint8)
    region, affinity = run(params, img)
    assert region.shape == (1, 16, 16) and affinity.shape == (1, 16, 16)


def test_crnn_parity_vs_torch_twin():
    gen = torch.Generator().manual_seed(1)
    twin = TorchCrnn(CRNN_CFG).eval()
    _randomize_bn(twin, gen)
    params = convert_crnn_state_dict(twin.state_dict())
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 32, 44, 1)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(crnn_mod.crnn_forward(params, jnp.asarray(x)))
    assert got.shape == ref.shape  # [3, 44/4-1=10, 13]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_lstm_direction_parity():
    """The reverse direction must align outputs like torch (re-reversed)."""
    gen = torch.Generator().manual_seed(2)
    rnn = nn.LSTM(6, 5, bidirectional=True, batch_first=True).eval()
    sd = {f"rnn.{k}": v for k, v in rnn.state_dict().items()}
    from manga_ocr_tpu.models.convert_latin import _lstm_dir

    fwd = _lstm_dir(sd, "rnn", reverse=False)
    bwd = _lstm_dir(sd, "rnn", reverse=True)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, 6)).astype(np.float32)
    with torch.no_grad():
        ref, _ = rnn(torch.from_numpy(x))
    got_f = np.asarray(crnn_mod._lstm_scan(fwd, jnp.asarray(x), reverse=False))
    got_b = np.asarray(crnn_mod._lstm_scan(bwd, jnp.asarray(x), reverse=True))
    np.testing.assert_allclose(got_f, ref[..., :5].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_b, ref[..., 5:].numpy(), rtol=1e-5, atol=1e-5)


def test_checkpoint_roundtrip_through_files(tmp_path):
    """torch.save → from_checkpoints: the full production load path."""
    torch.save(TorchCraft(CRAFT_CFG).eval().state_dict(), tmp_path / "craft.pth")
    torch.save(TorchCrnn(CRNN_CFG).eval().state_dict(), tmp_path / "crnn.pth")
    eng = TpuLatinEngine.from_checkpoints(
        str(tmp_path / "craft.pth"),
        str(tmp_path / "crnn.pth"),
        charset="0123456789ab",  # 12 chars + blank = 13 classes
        craft_cfg=CRAFT_CFG,
        det_buckets=(32, 64),
        rec_width_buckets=(32, 64),
    )
    out = eng.perform_ocr(np.zeros((40, 40, 3), np.uint8))
    assert isinstance(out, str) and not out.startswith("[ERROR")


# ---------------------------------------------------------------------------
# box extraction / decode / engine contract
# ---------------------------------------------------------------------------


def test_label_components_basic():
    m = np.zeros((6, 8), bool)
    m[1:3, 1:3] = True  # component A
    m[4, 4:7] = True  # component B
    m[0, 7] = True  # component C
    labels, n = craft_boxes.label_components(m)
    assert n == 3
    assert labels[1, 1] == labels[2, 2] != 0
    assert labels[4, 4] == labels[4, 6] != labels[1, 1]


def test_label_components_u_shape_merges():
    """U-shaped region: left and right arms must union when the base joins."""
    m = np.zeros((5, 5), bool)
    m[0:4, 0] = True
    m[0:4, 4] = True
    m[4, :] = True
    _, n = craft_boxes.label_components(m)
    assert n == 1


def test_extract_boxes_thresholds():
    region = np.zeros((16, 16), np.float32)
    affinity = np.zeros((16, 16), np.float32)
    region[2:6, 2:10] = 0.9  # strong text blob
    region[10:13, 10:14] = 0.45  # above low_text but below text_threshold
    boxes = craft_boxes.extract_boxes(region, affinity, min_area=4)
    assert len(boxes) == 1
    x, y, w, h = boxes[0]
    # image coords are 2x map coords, with the size-dependent margin
    assert x <= 4 and y <= 4 and x + w >= 20 and y + h >= 12


def test_extract_boxes_affinity_links_components():
    region = np.zeros((16, 32), np.float32)
    affinity = np.zeros((16, 32), np.float32)
    region[4:8, 2:8] = 0.9
    region[4:8, 12:18] = 0.9
    boxes = craft_boxes.extract_boxes(region, affinity, min_area=4)
    assert len(boxes) == 2
    affinity[4:8, 7:13] = 0.6  # link the two characters
    boxes = craft_boxes.extract_boxes(region, affinity, min_area=4)
    assert len(boxes) == 1


def test_ctc_greedy_collapse():
    # logits for sequence: blank, a, a, blank, b, b → "ab"
    K = 4
    seq = [0, 1, 1, 0, 2, 2]
    logits = np.full((1, len(seq), K), -5.0, np.float32)
    for t, k in enumerate(seq):
        logits[0, t, k] = 5.0
    assert crnn_mod.ctc_greedy(logits, None) == [[1, 2]]
    # length masking cuts the tail
    assert crnn_mod.ctc_greedy(logits, np.array([4])) == [[1]]


def test_group_lines():
    boxes = [(0, 0, 10, 10), (12, 1, 10, 9), (0, 30, 10, 10)]
    lines = craft_boxes.group_lines(boxes)
    assert len(lines) == 2
    assert lines[0] == [(0, 0, 10, 10), (12, 1, 10, 9)]


def test_engine_contract_random_weights():
    eng = TpuLatinEngine(
        craft_cfg=CRAFT_CFG,
        crnn_cfg=CRNN_CFG,
        charset="0123456789ab",
        det_buckets=(32, 64),
        rec_width_buckets=(32, 64),
    )
    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype(np.uint8)
    out = eng.perform_ocr(img)
    assert isinstance(out, str)
    assert not out.startswith("[ERROR")
    # grayscale input accepted (engine-surface parity with the other engines)
    assert isinstance(eng.perform_ocr(img[..., 0]), str)


def test_registry_gates_latin_on_checkpoints(tmp_path):
    from manga_ocr_tpu.engine.registry import make_default_registry

    reg = make_default_registry(settings={"tpu": {}})
    assert "Latin (TPU)" not in reg.available_engines()
    # configured but missing files → probe fails, engine not listed
    reg = make_default_registry(
        settings={
            "tpu": {
                "latin_craft_checkpoint": str(tmp_path / "nope.pth"),
                "latin_crnn_checkpoint": str(tmp_path / "nope2.pth"),
            }
        }
    )
    assert "Latin (TPU)" not in reg.available_engines()
    torch.save(TorchCraft(CRAFT_CFG).state_dict(), tmp_path / "c.pth")
    torch.save(TorchCrnn(CRNN_CFG).state_dict(), tmp_path / "r.pth")
    reg = make_default_registry(
        settings={
            "tpu": {
                "latin_craft_checkpoint": str(tmp_path / "c.pth"),
                "latin_crnn_checkpoint": str(tmp_path / "r.pth"),
            }
        }
    )
    assert "Latin (TPU)" in reg.available_engines()


def test_detect_boxes_batch_matches_single():
    """Bucketed multi-page detection == per-image detection, exactly."""
    eng = TpuLatinEngine(
        craft_cfg=CRAFT_CFG,
        crnn_cfg=CRNN_CFG,
        charset="0123456789ab",
        det_buckets=(32, 64),
        rec_width_buckets=(32, 64),
    )
    rng = np.random.default_rng(1)
    # two images in the 32-bucket, one in the 64-bucket, one oversized
    # (downscaled into the largest bucket)
    images = [
        rng.integers(0, 255, (24, 30, 3)).astype(np.uint8),
        rng.integers(0, 255, (30, 18, 3)).astype(np.uint8),
        rng.integers(0, 255, (50, 60, 3)).astype(np.uint8),
        rng.integers(0, 255, (90, 70, 3)).astype(np.uint8),
    ]
    batched = eng.detect_boxes_batch(images)
    singles = [eng.detect_boxes(img) for img in images]
    assert batched == singles
