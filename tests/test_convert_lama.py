"""Golden parity: LaMa FFC-ResNet generator state dict -> JAX pytree.

Tiny torch twin with the exact saicinpainting module structure and names
(``model.1.ffc.convl2l.weight`` ... ``model.N.weight``), randomized weights
and BN running stats, converted with BN folding, forward equality asserted.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.models import inpaint as ip  # noqa: E402
from manga_ocr_tpu.models.convert_lama import convert_lama_torch  # noqa: E402

CFG = ip.InpaintConfig(
    base_channels=8, num_blocks=2, downsamples=2, global_ratio=0.5, max_features=64
)


class TFourierUnit(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_layer = nn.Conv2d(2 * c, 2 * c, 1, bias=False)
        self.bn = nn.BatchNorm2d(2 * c)
        self.relu = nn.ReLU()

    def forward(self, x):
        b, c, h, w = x.shape
        f = torch.fft.rfftn(x.float(), dim=(-2, -1), norm="ortho")
        f = torch.stack((f.real, f.imag), dim=-1)  # [B,C,H,W2,2]
        f = f.permute(0, 1, 4, 2, 3).contiguous().view(b, -1, h, w // 2 + 1)
        f = self.relu(self.bn(self.conv_layer(f)))
        f = f.view(b, -1, 2, h, w // 2 + 1).permute(0, 1, 3, 4, 2)
        f = torch.complex(f[..., 0], f[..., 1])
        return torch.fft.irfftn(f, s=(h, w), dim=(-2, -1), norm="ortho")


class TSpectralTransform(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.downsample = nn.Identity()
        self.conv1 = nn.Sequential(
            nn.Conv2d(cin, cout // 2, 1, bias=False),
            nn.BatchNorm2d(cout // 2),
            nn.ReLU(),
        )
        self.fu = TFourierUnit(cout // 2)
        self.conv2 = nn.Conv2d(cout // 2, cout, 1, bias=False)

    def forward(self, x):
        x = self.conv1(self.downsample(x))
        return self.conv2(x + self.fu(x))


class TFFC(nn.Module):
    def __init__(self, cin_l, cin_g, cout_l, cout_g, k, stride=1, pad_mode="reflect"):
        super().__init__()
        p = k // 2
        mk = lambda a, b: (
            nn.Conv2d(a, b, k, stride, p, bias=False, padding_mode=pad_mode)
            if a and b
            else nn.Identity()
        )
        self.convl2l = mk(cin_l, cout_l)
        self.convl2g = mk(cin_l, cout_g)
        self.convg2l = mk(cin_g, cout_l)
        self.convg2g = (
            TSpectralTransform(cin_g, cout_g) if cin_g and cout_g else nn.Identity()
        )

    def forward(self, xl, xg):
        yl = 0
        yg = 0
        if not isinstance(self.convl2l, nn.Identity):
            yl = yl + self.convl2l(xl)
        if xg is not None and not isinstance(self.convg2l, nn.Identity):
            yl = yl + self.convg2l(xg)
        if not isinstance(self.convl2g, nn.Identity):
            yg = yg + self.convl2g(xl)
        if xg is not None and not isinstance(self.convg2g, nn.Identity):
            yg = yg + self.convg2g(xg)
        return yl, yg


class TFFCBnAct(nn.Module):
    def __init__(self, cin_l, cin_g, cout_l, cout_g, k, stride=1, pad_mode="reflect"):
        super().__init__()
        self.ffc = TFFC(cin_l, cin_g, cout_l, cout_g, k, stride, pad_mode)
        self.bn_l = nn.BatchNorm2d(cout_l) if cout_l else nn.Identity()
        self.bn_g = nn.BatchNorm2d(cout_g) if cout_g else nn.Identity()
        self.act_l = nn.ReLU()
        self.act_g = nn.ReLU()

    def forward(self, xl, xg=None):
        yl, yg = self.ffc(xl, xg)
        yl = self.act_l(self.bn_l(yl)) if not isinstance(yl, int) else None
        yg = self.act_g(self.bn_g(yg)) if not isinstance(yg, int) else None
        return yl, yg


class TFFCResnetBlock(nn.Module):
    def __init__(self, cl, cg):
        super().__init__()
        self.conv1 = TFFCBnAct(cl, cg, cl, cg, 3)
        self.conv2 = TFFCBnAct(cl, cg, cl, cg, 3)

    def forward(self, xl, xg):
        il, ig = xl, xg
        xl, xg = self.conv1(xl, xg)
        xl, xg = self.conv2(xl, xg)
        return il + xl, ig + xg


class TwinLama(nn.Module):
    """FFCResNetGenerator twin producing identical state-dict names."""

    def __init__(self, cfg: ip.InpaintConfig):
        super().__init__()
        nd, nb = cfg.downsamples, cfg.num_blocks
        cl, cg = cfg.cl, cfg.cg
        mods = [
            nn.ReflectionPad2d(3),  # 0
            TFFCBnAct(4, 0, cfg.feats(0), 0, 7, pad_mode="zeros"),  # 1 (pad above)
        ]
        # NOTE: stem conv has padding 0 (pad module before it)
        mods[1].ffc.convl2l = nn.Conv2d(4, cfg.feats(0), 7, 1, 0, bias=False)
        for i in range(nd):
            cin, cout = cfg.feats(i), cfg.feats(i + 1)
            if i == nd - 1:
                m = TFFCBnAct(cin, 0, cl, cg, 3, stride=2, pad_mode="zeros")
                # ratio_gin=0: l2g exists, g2g/g2l identities
            else:
                m = TFFCBnAct(cin, 0, cout, 0, 3, stride=2, pad_mode="zeros")
            mods.append(m)
        for _ in range(nb):
            mods.append(TFFCResnetBlock(cl, cg))
        mods.append(nn.Identity())  # ConcatTupleLayer
        for i in reversed(range(nd)):
            mods.append(nn.ConvTranspose2d(cfg.feats(i + 1), cfg.feats(i), 3, 2, 1, 1))
            mods.append(nn.BatchNorm2d(cfg.feats(i)))
            mods.append(nn.ReLU())
        mods.append(nn.ReflectionPad2d(3))
        mods.append(nn.Conv2d(cfg.feats(0), 3, 7, padding=0))
        mods.append(nn.Sigmoid())
        self.model = nn.ModuleList(mods)
        self.cfg = cfg

    def forward(self, img, mask):
        cfg = self.cfg
        nd, nb = cfg.downsamples, cfg.num_blocks
        m = self.model
        x = torch.cat([img * (1 - mask), mask], 1)
        x, _ = m[1](m[0](x))
        for i in range(nd):
            if i == nd - 1:
                xl, xg = m[2 + i](x)
            else:
                x, _ = m[2 + i](x)
        for j in range(nb):
            xl, xg = m[2 + nd + j](xl, xg)
        x = torch.cat([xl, xg], 1)
        base = 3 + nd + nb
        for u in range(nd):
            x = m[base + 3 * u + 2](m[base + 3 * u + 1](m[base + 3 * u](x)))
        out = m[base + 3 * nd + 2](m[base + 3 * nd + 1](m[base + 3 * nd](x)))
        return img * (1 - mask) + out * mask


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
    t = TwinLama(CFG)
    _randomize(t)
    t.eval()
    return t


def test_state_dict_names_match_saicinpainting(twin):
    names = set(twin.state_dict().keys())
    nd, nb = CFG.downsamples, CFG.num_blocks
    for probe in (
        "model.1.ffc.convl2l.weight",
        "model.1.bn_l.running_var",
        f"model.{1 + nd}.ffc.convl2g.weight",
        f"model.{2 + nd}.conv1.ffc.convg2g.conv1.0.weight",
        f"model.{2 + nd}.conv1.ffc.convg2g.fu.conv_layer.weight",
        f"model.{2 + nd}.conv2.ffc.convg2g.conv2.weight",
        f"model.{3 + nd + nb}.weight",  # first ConvTranspose
        f"model.{3 + nd + nb + 3 * nd + 1}.bias",  # head conv
    ):
        assert probe in names, probe


def test_converted_forward_matches_torch(twin):
    params = convert_lama_torch(twin, CFG)
    rng = np.random.default_rng(0)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, 8:20, 10:22] = 1.0
    with torch.no_grad():
        t_out = twin(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask[:, None]),
        )
    j_out = ip.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(img), jnp.asarray(mask), CFG
    )
    np.testing.assert_allclose(
        np.asarray(j_out),
        t_out.numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
        rtol=1e-3,
    )


def test_converted_params_fill_init_template(twin):
    params = convert_lama_torch(twin, CFG)
    template = ip.init_params(CFG, jax.random.PRNGKey(0))
    assert jax.tree.structure(template) == jax.tree.structure(
        jax.tree.map(jnp.asarray, params)
    )
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(params)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_wrapper_prefix_normalization(twin):
    """Training checkpoints prefix keys with ``generator.`` — stripped."""
    sd = {f"generator.{k}": v.numpy() for k, v in twin.state_dict().items()}
    from manga_ocr_tpu.models.convert_lama import convert_lama_state_dict

    params = convert_lama_state_dict(sd, CFG)
    direct = convert_lama_torch(twin, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(a, b)
