"""CLI smoke tests (tiny model injected; no checkpoint, no network)."""

import os

import numpy as np
import pytest


def test_cli_ocr_and_process(tmp_path, monkeypatch, capsys):
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu import cli
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    # swap the full-size engine for a tiny one (CLI is about plumbing here)
    cfg = MangaOCRConfig.tiny()

    def tiny_engine(args):
        params = mdl.init_params(cfg, jax.random.PRNGKey(0))
        return TpuMangaOcrEngine(
            params, cfg, CharTokenizer.synthetic(), max_length=8, dtype=jnp.float32
        )

    monkeypatch.setattr(cli, "_build_engine", tiny_engine)

    img = tmp_path / "crop.png"
    Image.fromarray(np.full((40, 60, 3), 220, np.uint8)).save(img)

    rc = cli.main(["ocr", str(img)])
    assert rc == 0
    out = capsys.readouterr().out
    assert str(img) in out

    pages = tmp_path / "pages"
    pages.mkdir()
    Image.fromarray(np.full((64, 64, 3), 240, np.uint8)).save(pages / "p1.png")
    outdir = tmp_path / "out"
    rc = cli.main(["process", str(pages), "--out", str(outdir)])
    assert rc == 0
    assert (outdir / "project.json").exists()
    assert (pages / "p1_typeset.png").exists()


def test_cli_missing_image_errors(tmp_path, monkeypatch):
    from manga_ocr_tpu import cli

    monkeypatch.setattr(cli, "_build_engine", lambda args: None)
    rc = cli.main(["ocr", str(tmp_path / "nope.png")])
    assert rc == 1


def test_bench_shim_and_module_agree():
    """`python bench.py` (driver contract) and `manga-ocr-tpu bench` must hit
    the same implementation: the repo-root shim re-exports the package
    module's entry points and the CLI subcommand imports the module."""
    import importlib.util
    import os

    from manga_ocr_tpu import benchmark

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    spec = importlib.util.spec_from_file_location(
        "bench_shim", os.path.join(root, "bench.py")
    )
    shim = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(shim)
    assert shim.main is benchmark.main
    assert shim.run_full_path is benchmark.run_full_path
    # scored-output contract pieces stay put
    assert benchmark.NORTH_STAR == 5000.0
    assert benchmark.MAX_NEW_TOKENS == 32
    # scripts/warm_cache.py reads these off the shim — keep them re-exported
    assert shim.MAX_NEW_TOKENS is benchmark.MAX_NEW_TOKENS
    assert shim.BATCH_SIZES is benchmark.BATCH_SIZES
    assert shim.NORTH_STAR is benchmark.NORTH_STAR


def test_cli_mesh_data_flag_builds_sharded_engine(tmp_path, monkeypatch, capsys):
    """--mesh-data N wires a data-parallel mesh into the engine — exercised
    end-to-end on the 8-device virtual CPU mesh (conftest)."""
    from PIL import Image

    from manga_ocr_tpu import cli
    from manga_ocr_tpu.models.config import MangaOCRConfig

    # tiny model through the REAL _build_engine (mesh logic included)
    monkeypatch.setattr(MangaOCRConfig, "base", staticmethod(MangaOCRConfig.tiny))
    img = tmp_path / "crop.png"
    Image.fromarray(np.full((40, 60, 3), 210, np.uint8)).save(img)
    rc = cli.main(["--mesh-data", "8", "--max-length", "8", "ocr", str(img)])
    assert rc == 0
    assert str(img) in capsys.readouterr().out


def test_cli_process_text_mode(tmp_path, monkeypatch, capsys):
    """--detect-mode text: proposals recognized in one batched dispatch,
    detections carry text (pre-text skip), project written."""
    import cv2
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu import cli
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()

    def tiny_engine(args):
        params = mdl.init_params(cfg, jax.random.PRNGKey(0))
        return TpuMangaOcrEngine(
            params, cfg, CharTokenizer.synthetic(), max_length=8, dtype=jnp.float32
        )

    monkeypatch.setattr(cli, "_build_engine", tiny_engine)

    pages = tmp_path / "pages"
    pages.mkdir()
    page = np.full((200, 300, 3), 245, np.uint8)
    cv2.putText(page, "HELLO", (40, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.2, (10, 10, 10), 3)
    Image.fromarray(page).save(pages / "p1.png")
    outdir = tmp_path / "out"
    rc = cli.main(
        ["process", str(pages), "--out", str(outdir), "--detect-mode", "text"]
    )
    assert rc == 0
    assert (outdir / "project.json").exists()


def test_cli_text_proposer_craft_requires_checkpoint(tmp_path, monkeypatch, capsys):
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu import cli
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()
    monkeypatch.setattr(
        cli,
        "_build_engine",
        lambda args: TpuMangaOcrEngine(
            mdl.init_params(cfg, jax.random.PRNGKey(0)),
            cfg,
            CharTokenizer.synthetic(),
            max_length=8,
            dtype=jnp.float32,
        ),
    )
    pages = tmp_path / "pages"
    pages.mkdir()
    Image.fromarray(np.full((64, 64, 3), 240, np.uint8)).save(pages / "p1.png")
    rc = cli.main(
        [
            "process",
            str(pages),
            "--out",
            str(tmp_path / "out"),
            "--detect-mode",
            "text",
            "--text-proposer",
            "craft",
        ]
    )
    assert rc == 1
    assert "latin_craft_checkpoint" in capsys.readouterr().err
