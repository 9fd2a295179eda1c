"""Golden parity: ultralytics YOLOv8-seg state dict -> JAX pytree.

Builds a tiny torch twin with the EXACT ultralytics module structure and
parameter names (``model.0.conv.weight`` ... ``model.22.cv4.2.2.bias``),
randomizes weights AND BatchNorm running statistics, converts via
``convert_yolo_state_dict`` (BN folding), and asserts the JAX forward
matches the torch forward (eval mode) — the proven ``test_model_parity``
pattern applied to the detector (VERDICT round-1 item #3).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.models import yolo_seg as ys  # noqa: E402
from manga_ocr_tpu.models.convert_yolo import convert_yolo_torch  # noqa: E402

CFG = ys.YoloSegConfig(
    input_size=64, width=(4, 8, 16, 32, 64), depth=(1, 1, 1, 1), num_masks=8, reg_max=4
)


class TConv(nn.Module):
    """ultralytics Conv: conv(no bias) + BN(eps 1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)

    def forward(self, x):
        return nn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n, shortcut):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = TConv(c1, c1 // 2, 1)
        self.cv2 = TConv(c1 // 2 * 4, c2, 1)
        self.m = nn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TProto(nn.Module):
    def __init__(self, c1, cp, nm):
        super().__init__()
        self.cv1 = TConv(c1, cp, 3)
        self.upsample = nn.ConvTranspose2d(cp, cp, 2, 2, 0, bias=True)
        self.cv2 = TConv(cp, cp, 3)
        self.cv3 = TConv(cp, nm)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegment(nn.Module):
    def __init__(self, nc, nm, rm, ch, cp):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * rm)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        mk = lambda c, mid, out: nn.Sequential(
            TConv(c, mid, 3), TConv(mid, mid, 3), nn.Conv2d(mid, out, 1)
        )
        self.cv2 = nn.ModuleList(mk(c, c2, 4 * rm) for c in ch)
        self.cv3 = nn.ModuleList(mk(c, c3, nc) for c in ch)
        self.cv4 = nn.ModuleList(mk(c, c4, nm) for c in ch)
        self.proto = TProto(ch[0], cp, nm)


class TwinYolo(nn.Module):
    def __init__(self, cfg: ys.YoloSegConfig):
        super().__init__()
        w, d = cfg.width, cfg.depth
        self.model = nn.ModuleList(
            [
                TConv(3, w[0], 3, 2),  # 0 stem
                TConv(w[0], w[1], 3, 2),  # 1
                TC2f(w[1], w[1], d[0], True),  # 2
                TConv(w[1], w[2], 3, 2),  # 3
                TC2f(w[2], w[2], d[1], True),  # 4
                TConv(w[2], w[3], 3, 2),  # 5
                TC2f(w[3], w[3], d[2], True),  # 6
                TConv(w[3], w[4], 3, 2),  # 7
                TC2f(w[4], w[4], d[3], True),  # 8
                TSPPF(w[4], w[4]),  # 9
                nn.Upsample(scale_factor=2, mode="nearest"),  # 10
                nn.Identity(),  # 11 Concat
                TC2f(w[4] + w[3], w[3], d[0], False),  # 12
                nn.Upsample(scale_factor=2, mode="nearest"),  # 13
                nn.Identity(),  # 14 Concat
                TC2f(w[3] + w[2], w[2], d[0], False),  # 15
                TConv(w[2], w[2], 3, 2),  # 16
                nn.Identity(),  # 17 Concat
                TC2f(w[2] + w[3], w[3], d[0], False),  # 18
                TConv(w[3], w[3], 3, 2),  # 19
                nn.Identity(),  # 20 Concat
                TC2f(w[3] + w[4], w[4], d[0], False),  # 21
                TSegment(cfg.num_classes, cfg.num_masks, cfg.reg_max, w[2:], w[2]),  # 22
            ]
        )

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        u4 = m[12](torch.cat([m[10](p5), p4], 1))
        u3 = m[15](torch.cat([m[13](u4), p3], 1))
        d4 = m[18](torch.cat([m[16](u3), u4], 1))
        d5 = m[21](torch.cat([m[19](d4), p5], 1))
        seg = m[22]
        protos = seg.proto(u3)
        outs = []
        for i, f in enumerate((u3, d4, d5)):
            y = torch.cat([seg.cv2[i](f), seg.cv3[i](f), seg.cv4[i](f)], 1)
            outs.append(y.flatten(2).transpose(1, 2))
        return torch.cat(outs, 1), protos


def _randomize(module: nn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    for mod in module.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) * 0.5 + 0.5)


@pytest.fixture(scope="module")
def twin():
    t = TwinYolo(CFG)
    _randomize(t)
    t.eval()
    return t


def test_state_dict_names_match_ultralytics(twin):
    names = set(twin.state_dict().keys())
    for probe in (
        "model.0.conv.weight",
        "model.0.bn.running_mean",
        "model.2.m.0.cv1.conv.weight",
        "model.9.cv2.bn.weight",
        "model.22.proto.upsample.weight",
        "model.22.cv2.0.2.bias",
        "model.22.cv4.2.0.conv.weight",
    ):
        assert probe in names, probe


def test_converted_forward_matches_torch(twin):
    params = convert_yolo_torch(twin, CFG)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_preds, t_protos = twin(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    j_preds, j_protos = ys.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(img), CFG
    )
    np.testing.assert_allclose(
        np.asarray(j_preds), t_preds.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_protos),
        t_protos.numpy().transpose(0, 2, 3, 1),
        atol=2e-3,
        rtol=1e-3,
    )


def test_converted_params_fill_init_template(twin):
    """Converted pytree has exactly the init_params structure (so save/load
    and the serving path work unchanged)."""
    params = convert_yolo_torch(twin, CFG)
    template = ys.init_params(CFG, jax.random.PRNGKey(0))
    t_leaves = jax.tree.structure(template)
    p_leaves = jax.tree.structure(jax.tree.map(jnp.asarray, params))
    assert t_leaves == p_leaves
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(params)):
        assert np.asarray(a).shape == np.asarray(b).shape
