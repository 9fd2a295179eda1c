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
    # 9 same-shape pages (>= dp_size 8, not a multiple: pad+slice on the
    # sharded path) + 1 odd-shape page (< dp_size: single-device fallback)
    pages = [
        rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8) for _ in range(9)
    ] + [rng.integers(0, 256, size=(48, 48, 3)).astype(np.uint8)]
    single = BubbleDetector(params, cfg).detect_bubble_masks(pages)
    det = BubbleDetector(params, cfg, mesh=mesh)
    sharded = det.detect_bubble_masks(pages)
    assert det._params_repl is not None  # the big group really sharded
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


def test_lama_inpainter_mesh_parity(mesh):
    from manga_ocr_tpu.models.inpaint import InpaintConfig, LamaInpainter, init_params

    cfg = InpaintConfig(base_channels=4, num_blocks=1, downsamples=2)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    # 9 same-shape regions (sharded path) + 1 odd shape (fallback)
    imgs = [
        rng.integers(0, 256, size=(24, 20, 3)).astype(np.uint8) for _ in range(9)
    ] + [rng.integers(0, 256, size=(20, 28, 3)).astype(np.uint8)]
    msks = [
        (rng.random(im.shape[:2]) > 0.8).astype(np.uint8) * 255 for im in imgs
    ]
    plain = LamaInpainter(params, cfg)
    shard = LamaInpainter(params, cfg, mesh=mesh)
    # single-image contract takes the small-batch single-device path
    np.testing.assert_allclose(
        plain(imgs[0], msks[0]), shard(imgs[0], msks[0]), atol=2e-5
    )
    assert shard._params_repl is None  # 1 region never sharded
    # batched multi-region path groups by shape and preserves order
    a = plain.inpaint_many(imgs, msks)
    b = shard.inpaint_many(imgs, msks)
    assert shard._params_repl is not None  # the 9-region group sharded
    assert len(a) == len(b) == 10
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
    # 9 same-size pages: one 64-bucket batch of 9 >= dp_size -> sharded
    images = [rng.integers(0, 256, size=(50, 60, 3)).astype(np.uint8) for _ in range(9)]
    assert plain.detect_boxes_batch(images) == shard.detect_boxes_batch(images)
    assert getattr(shard, "_craft_repl", None) is not None
    # single page takes the small-batch path, same boxes
    assert plain.detect_boxes(images[0]) == shard.detect_boxes(images[0])

    crops = [
        rng.integers(0, 256, size=(14, 28 + 2 * i)).astype(np.uint8) for i in range(9)
    ]
    assert plain.recognize_lines(crops) == shard.recognize_lines(crops)
    assert getattr(shard, "_crnn_repl", None) is not None
