"""Latin-trainer CLI surface: native checkpoint round-trip, directory
dataset, and registry loading of a trained recognizer dir."""

import json
import os

import numpy as np
import pytest

import jax

from manga_ocr_tpu import train_latin as tl
from manga_ocr_tpu.models import crnn as crnn_mod

CHARSET = "0123456789"
CFG = crnn_mod.CrnnConfig(num_classes=len(CHARSET) + 1, output_channel=32, hidden_size=16)


def test_crnn_checkpoint_roundtrip(tmp_path):
    params = crnn_mod.init_crnn_params(CFG, jax.random.PRNGKey(0))
    out = tmp_path / "ckpt"
    tl.save_crnn_checkpoint(str(out), params, CFG, CHARSET)
    loaded, cfg, charset = tl.load_crnn_checkpoint(str(out))
    assert charset == CHARSET
    assert cfg == CFG
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # same logits through the forward
    x = np.random.default_rng(0).normal(size=(2, CFG.input_height, 64, 1))
    ya = crnn_mod.crnn_forward(params, x.astype(np.float32))
    yb = crnn_mod.crnn_forward(loaded, x.astype(np.float32))
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=0, atol=0)


def test_directory_line_dataset(tmp_path):
    from PIL import Image

    data = tmp_path / "lines"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i, text in enumerate(["123", "9", "0420"]):
        img = rng.integers(0, 255, (20, 60), np.uint8).astype(np.uint8)
        Image.fromarray(img, "L").save(data / f"{i:03d}.png")
        (data / f"{i:03d}.txt").write_text(text)
    # out-of-charset pair is skipped
    Image.fromarray(np.zeros((20, 60), np.uint8), "L").save(data / "bad.png")
    (data / "bad.txt").write_text("xyz")

    ds = tl.directory_line_dataset(
        str(data), CFG, CHARSET, batch_size=4, width=96, max_chars=6, seed=0
    )
    batch = next(ds)
    assert batch.images.shape == (4, CFG.input_height, 96, 1)
    assert batch.labels.shape == (4, 6)
    # labels are 1-based charset ids within range
    labs = np.asarray(batch.labels)
    assert labs.max() <= len(CHARSET) and labs.min() >= 0
    # at least one real label per row
    assert (np.asarray(batch.label_paddings) == 0).any(axis=1).all()


def test_directory_dataset_pads_with_serving_value(tmp_path):
    """Padded tail must match the serving distribution: recognize_lines
    zero-pads uint8 then normalizes, giving -1.0 (black) — not 0.0
    (mid-gray), which would shift fine-tuned models at inference
    (ADVICE r3)."""
    from PIL import Image

    data = tmp_path / "lines"
    data.mkdir()
    Image.fromarray(np.full((20, 24), 128, np.uint8), "L").save(data / "a.png")
    (data / "a.txt").write_text("12")
    ds = tl.directory_line_dataset(
        str(data), CFG, CHARSET, batch_size=1, width=96, max_chars=6, seed=0
    )
    batch = next(ds)
    img = np.asarray(batch.images)[0, :, :, 0]
    # the 24-col crop is widened to input_height aspect; the far tail is pad
    assert (img[:, -8:] == -1.0).all()
    # and the written region is the normalized crop, not pad
    assert not (img[:, :8] == -1.0).all()


def test_ctc_frame_guard():
    """width//4 - 1 frames must cover max_chars (ADVICE r3): generators
    raise, the CLI errors out before training."""
    with pytest.raises(ValueError, match="CTC frames"):
        next(tl.synthetic_line_dataset(CFG, CHARSET, batch_size=1, width=32, max_chars=16))
    with pytest.raises(SystemExit):
        tl.main(["--steps", "1", "--width", "32", "--max-chars", "16"])


def test_init_dir_flag_conflicts_error(tmp_path):
    """Explicit --charset/--hidden-size/--output-channel conflicting with a
    native --init checkpoint manifest must fail loudly, not be silently
    overridden (ADVICE r3)."""
    params = crnn_mod.init_crnn_params(CFG, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    tl.save_crnn_checkpoint(str(ckpt), params, CFG, CHARSET)
    with pytest.raises(SystemExit):
        tl.main(
            ["--steps", "1", "--init", str(ckpt), "--charset", "abcdef",
             "--width", "64", "--max-chars", "4"]
        )
    with pytest.raises(SystemExit):
        tl.main(
            ["--steps", "1", "--init", str(ckpt), "--hidden-size", "999",
             "--width", "64", "--max-chars", "4"]
        )
    # matching explicit flags (or none) are fine
    rc = tl.main(
        ["--steps", "1", "--batch-size", "1", "--init", str(ckpt),
         "--charset", CHARSET, "--width", "64", "--max-chars", "4",
         "--log-every", "0"]
    )
    assert rc == 0


def test_directory_line_dataset_empty_errors(tmp_path):
    with pytest.raises(ValueError):
        tl.directory_line_dataset(
            str(tmp_path), CFG, CHARSET, batch_size=2, width=64, max_chars=4
        )


def test_trainer_cli_smoke_and_registry_load(tmp_path):
    """3 tiny CLI steps -> native dir -> engine + registry load it."""
    out = tmp_path / "trained"
    rc = tl.main(
        [
            "--steps", "3",
            "--batch-size", "2",
            "--width", "64",
            "--max-chars", "4",
            "--charset", CHARSET,
            "--hidden-size", "16",
            "--output-channel", "32",
            "--out", str(out),
            "--log-every", "0",
        ]
    )
    assert rc == 0
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["charset"] == CHARSET
    params, cfg, charset = tl.load_crnn_checkpoint(str(out))
    assert cfg.num_classes == len(CHARSET) + 1

    # resume-style init from the native dir keeps training
    rc = tl.main(
        ["--steps", "2", "--batch-size", "2", "--width", "64", "--max-chars",
         "4", "--init", str(out), "--out", str(out), "--log-every", "0"]
    )
    assert rc == 0

    # the registry accepts the native dir as latin_crnn_checkpoint
    torch = pytest.importorskip("torch")
    from tests.test_latin_ocr import CRAFT_CFG, TorchCraft

    craft_pth = tmp_path / "craft.pth"
    torch.save(TorchCraft(CRAFT_CFG).state_dict(), craft_pth)

    from manga_ocr_tpu.engine.latin import TpuLatinEngine

    eng = TpuLatinEngine.from_checkpoints(
        str(craft_pth), str(out), craft_cfg=CRAFT_CFG,
        det_buckets=(32, 64), rec_width_buckets=(32, 64),
    )
    assert eng.charset == CHARSET  # manifest charset, not the default
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    assert isinstance(eng.perform_ocr(img), str)

    from manga_ocr_tpu.engine.registry import make_default_registry

    reg = make_default_registry(
        settings={
            "tpu": {
                "latin_craft_checkpoint": str(craft_pth),
                "latin_crnn_checkpoint": str(out),
            }
        }
    )
    assert "Latin (TPU)" in reg.available_engines()
