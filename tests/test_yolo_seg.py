"""YOLO-seg detector tests (shapes, decode, NMS, mask contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import yolo_seg as ys


@pytest.fixture(scope="module")
def tiny_cfg():
    return ys.YoloSegConfig(
        input_size=64, width=(4, 8, 16, 32, 64), depth=(1, 1, 1, 1), num_masks=8
    )


@pytest.fixture(scope="module")
def params(tiny_cfg):
    return ys.init_params(tiny_cfg, jax.random.PRNGKey(0))


def test_forward_shapes(tiny_cfg, params):
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    preds, protos = ys.forward(params, imgs, tiny_cfg)
    n_cells = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    no = 4 * tiny_cfg.reg_max + tiny_cfg.num_classes + tiny_cfg.num_masks
    assert preds.shape == (2, n_cells, no)
    assert protos.shape == (2, 16, 16, tiny_cfg.num_masks)


def test_infer_resizes_any_input(tiny_cfg, params):
    pages = jnp.zeros((1, 100, 80, 3), jnp.uint8)
    preds, protos = ys.infer(params, pages, tiny_cfg)
    assert np.isfinite(np.asarray(preds)).all()


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = ys._nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_postprocess_decodes_planted_instance(tiny_cfg):
    """Craft raw predictions with one confident cell and check the decoded
    box/mask land where planted."""
    cfg = tiny_cfg
    anchors, strides = ys._grid_anchors(cfg.input_size)
    n = len(anchors)
    no = 4 * cfg.reg_max + cfg.num_classes + cfg.num_masks
    preds = np.full((n, no), -10.0, np.float32)  # all low confidence
    # pick the P3 cell nearest (32, 32)
    idx = int(np.argmin(np.abs(anchors[:, 0] - 32) + np.abs(anchors[:, 1] - 32)))
    # DFL logits peaked at bin 1 -> distance ~1*stride=8 on all sides
    box_logits = np.full((4, cfg.reg_max), -10.0, np.float32)
    box_logits[:, 1] = 10.0
    preds[idx, : 4 * cfg.reg_max] = box_logits.ravel()
    preds[idx, 4 * cfg.reg_max] = 8.0  # high class logit
    preds[idx, 4 * cfg.reg_max + cfg.num_classes :] = 5.0  # positive coeffs
    protos = np.full((16, 16, cfg.num_masks), 0.5, np.float32)

    out = ys.postprocess(preds, protos, cfg, out_h=64, out_w=64)
    assert len(out) == 1
    box = out[0]["box"]
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    assert abs(cx - 32) < 6 and abs(cy - 32) < 6
    assert 10 < (box[2] - box[0]) < 22  # ~16 px wide
    mask = out[0]["mask"]
    assert mask[32, 32]  # mask present inside the box
    assert not mask[5, 60]  # cropped outside the box


def test_combined_mask_contract(tiny_cfg):
    inst = [
        {"box": np.zeros(4), "score": 1.0, "mask": np.eye(8, dtype=bool)},
        {"box": np.zeros(4), "score": 1.0, "mask": np.flip(np.eye(8, dtype=bool), 0)},
    ]
    mask = ys.combined_bubble_mask(inst, 8, 8)
    assert mask.dtype == np.uint8 and set(np.unique(mask)) == {0, 255}
    assert mask[0, 0] == 255 and mask[7, 0] == 255


def test_detector_wrapper_end_to_end(tiny_cfg, params):
    det = ys.YoloBubbleDetector(params, tiny_cfg)
    page = np.random.default_rng(0).integers(0, 255, size=(90, 70, 3)).astype(np.uint8)
    mask = det.detect_bubble_mask(page)
    assert mask.shape == (90, 70) and mask.dtype == np.uint8


def test_yolo_params_save_load_roundtrip(tmp_path, tiny_cfg, params):
    import jax

    path = str(tmp_path / "yolo.npz")
    ys.save_params(params, path)
    loaded = ys.load_params(path, tiny_cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
