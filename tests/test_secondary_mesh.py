"""Sharded dispatch for the secondary models (VERDICT r3 #8): the bubble
segmenter, CRAFT/CRNN Latin stack and LaMa inpainter each take a ``mesh``
and shard their batches over the data axis — outputs must match the
single-device path exactly (same jitted math, sharding annotations only).
Runs on the 8-device virtual CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def mesh():
    return meshlib.make_mesh(n_data=8, n_model=1)


def test_pad_batch_to_multiple():
    a = np.ones((3, 2), np.uint8)
    out = meshlib.pad_batch_to_multiple(a, 4)
    assert out.shape == (4, 2)
    assert (out[:3] == 1).all() and (out[3] == 0).all()
    assert meshlib.pad_batch_to_multiple(out, 4) is out  # already aligned


def test_bubble_detector_mesh_parity(mesh):
    from manga_ocr_tpu.detect.detector import BubbleDetector
    from manga_ocr_tpu.models import detector as seg

    cfg = seg.DetectorConfig(input_size=32, base_channels=4, depth=2)
    params = seg.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # 3 pages (not a multiple of 8: exercises the pad+slice path), 2 shapes
    pages = [
        rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(48, 48, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8),
    ]
    single = BubbleDetector(params, cfg).detect_bubble_masks(pages)
    sharded = BubbleDetector(params, cfg, mesh=mesh).detect_bubble_masks(pages)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


def test_lama_inpainter_mesh_parity(mesh):
    from manga_ocr_tpu.models.inpaint import InpaintConfig, LamaInpainter, init_params

    cfg = InpaintConfig(base_channels=4, num_blocks=1, downsamples=2)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 256, size=(24, 20, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(20, 28, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(24, 20, 3)).astype(np.uint8),
    ]
    msks = [
        (rng.random(im.shape[:2]) > 0.8).astype(np.uint8) * 255 for im in imgs
    ]
    plain = LamaInpainter(params, cfg)
    shard = LamaInpainter(params, cfg, mesh=mesh)
    # single-image contract
    np.testing.assert_allclose(
        plain(imgs[0], msks[0]), shard(imgs[0], msks[0]), atol=2e-5
    )
    # batched multi-region path groups by shape and preserves order
    a = plain.inpaint_many(imgs, msks)
    b = shard.inpaint_many(imgs, msks)
    assert len(a) == len(b) == 3
    for x, y, im in zip(a, b, imgs):
        assert x.shape == im.shape
        np.testing.assert_allclose(x, y, atol=2e-5)


def test_latin_engine_mesh_parity(mesh):
    from manga_ocr_tpu.engine.latin import TpuLatinEngine
    from manga_ocr_tpu.models import craft as craft_mod
    from manga_ocr_tpu.models import crnn as crnn_mod

    charset = "abc"
    craft_cfg = craft_mod.CraftConfig()
    crnn_cfg = crnn_mod.CrnnConfig(num_classes=len(charset) + 1)
    plain = TpuLatinEngine(
        charset=charset, craft_cfg=craft_cfg, crnn_cfg=crnn_cfg,
        det_buckets=(64,), rec_width_buckets=(32, 64),
    )
    shard = TpuLatinEngine(
        charset=charset, craft_cfg=craft_cfg, crnn_cfg=crnn_cfg,
        det_buckets=(64,), rec_width_buckets=(32, 64), mesh=mesh,
    )
    # same lazily-initialized weights on both engines
    shard._craft_params = plain.craft_params
    shard._crnn_params = plain.crnn_params

    rng = np.random.default_rng(2)
    images = [rng.integers(0, 256, size=(50, 60, 3)).astype(np.uint8) for _ in range(3)]
    assert plain.detect_boxes_batch(images) == shard.detect_boxes_batch(images)

    crops = [rng.integers(0, 256, size=(14, 30 + 8 * i)).astype(np.uint8) for i in range(3)]
    assert plain.recognize_lines(crops) == shard.recognize_lines(crops)
