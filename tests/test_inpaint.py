"""FFC inpainting network tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import inpaint as ip


@pytest.fixture(scope="module")
def cfg():
    return ip.InpaintConfig(base_channels=8, num_blocks=1, downsamples=1)


@pytest.fixture(scope="module")
def params(cfg):
    return ip.init_params(cfg, jax.random.PRNGKey(0))


def test_known_pixels_preserved(cfg, params):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(1, 32, 32, 3)).astype(np.uint8)
    mask = np.zeros((1, 32, 32), np.uint8)
    mask[0, 10:20, 10:20] = 255
    out = np.asarray(ip.inpaint_batch(params, jnp.asarray(img), jnp.asarray(mask), cfg))
    # outside the hole: exact passthrough
    np.testing.assert_array_equal(out[0, :5, :5], img[0, :5, :5])
    # inside the hole: something was generated (uint8, valid range)
    assert out.dtype == np.uint8


def test_spectral_transform_shapes(cfg, params):
    cg = cfg.cg
    x = jnp.zeros((1, 16, 16, cg), jnp.float32)
    p = params["blocks"][0]["conv1"]["g2g"]
    y = ip._spectral(x, p)
    assert y.shape == (1, 16, 16, cg)


def test_wrapper_pads_odd_sizes(cfg, params):
    inpainter = ip.LamaInpainter(params, cfg)
    img = np.full((33, 47, 3), 200, np.uint8)
    mask = np.zeros((33, 47), np.uint8)
    mask[5:12, 6:20] = 255
    out = inpainter(img, mask)
    assert out.shape == (33, 47, 3)
    np.testing.assert_array_equal(out[0, 0], img[0, 0])


def test_wrapper_without_weights_raises():
    with pytest.raises(RuntimeError):
        ip.LamaInpainter()(np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))


def test_dilate_fallback_does_not_wrap_edges(monkeypatch):
    """np.roll-based dilation must not leak a bottom-edge mask into the top
    of the page (regression: wraparound)."""
    from manga_ocr_tpu import native
    from manga_ocr_tpu.typeset import cleanup as cl

    monkeypatch.setattr(cl, "HAS_CV2", False)
    monkeypatch.setattr(native, "dilate_box", lambda m, r: None)
    mask = np.zeros((32, 32), np.uint8)
    mask[-1, 10:20] = 255  # bottom row
    out = cl.dilate(mask, radius=3)
    assert out[-1, 10:20].all() and out[-4, 10:20].all()  # dilated upward
    assert out[:3].sum() == 0  # nothing wrapped to the top
    assert out.shape == mask.shape
