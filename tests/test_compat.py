"""manga_ocr-compatible shim tests."""

import numpy as np
import pytest


def test_manga_ocr_shim_callable(monkeypatch):
    from PIL import Image

    import jax
    import jax.numpy as jnp

    import manga_ocr_tpu.compat as compat
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    # inject a tiny engine instead of the full-size random one
    def fake_init(self, pretrained_model_name_or_path=None, force_cpu=False,
                  microbatch_window_ms=5.0):
        from manga_ocr_tpu.runtime.pipeline import MicroBatcher

        cfg = MangaOCRConfig.tiny()
        params = mdl.init_params(cfg, jax.random.PRNGKey(0))
        self.engine = TpuMangaOcrEngine(
            params, cfg, CharTokenizer.synthetic(), max_length=8, dtype=jnp.float32
        )
        self._batcher = MicroBatcher(self.engine.ocr_page, window_ms=5.0)

    monkeypatch.setattr(compat.MangaOcr, "__init__", fake_init)
    mocr = compat.MangaOcr()
    pil = Image.fromarray(np.full((40, 60, 3), 200, np.uint8))
    out = mocr(pil)
    assert isinstance(out, str)
    # numpy + grayscale inputs too
    assert isinstance(mocr(np.full((40, 60, 3), 100, np.uint8)), str)
    assert isinstance(mocr(np.full((40, 60), 100, np.uint8)), str)
    mocr.close()


def test_missing_checkpoint_raises():
    from manga_ocr_tpu.compat import MangaOcr

    with pytest.raises(FileNotFoundError):
        MangaOcr("/nonexistent/path/model")


def test_uninitialized_constructor_refuses(monkeypatch):
    """The reference constructor loads real weights or fails
    (config.py:432-436); without a checkpoint and without the explicit
    allow_random_weights opt-in, the alias must refuse rather than
    silently serve random-weight output (VERDICT r4)."""
    from manga_ocr_tpu.compat import MangaOcr

    monkeypatch.delenv("MANGA_OCR_CHECKPOINT", raising=False)
    with pytest.raises(RuntimeError, match="allow_random_weights"):
        MangaOcr()


def test_manga_ocr_alias_package():
    """The reference's exact import line (`from manga_ocr import MangaOcr`,
    /root/reference/src/core/config.py:432) must resolve against this
    framework's top-level alias package — and to the same class as the
    canonical shim, so GUI callers and manga_ocr_tpu callers share engine
    caches and monkeypatches."""
    import manga_ocr
    from manga_ocr import MangaOcr

    import manga_ocr_tpu
    import manga_ocr_tpu.compat as compat

    assert MangaOcr is compat.MangaOcr
    assert manga_ocr.__version__ == manga_ocr_tpu.__version__
    assert manga_ocr.__all__ == ["MangaOcr", "__version__"]


def test_manga_ocr_alias_is_import_light():
    """Importing the alias (the reference does it at startup just to probe
    availability) must not initialize a JAX backend."""
    import subprocess
    import sys

    # NB: the platform image's sitecustomize preloads a few jax modules
    # into EVERY python process, so "jax not in sys.modules" is untestable
    # here; what matters is that no device backend gets initialized.
    code = (
        "import manga_ocr\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, 'alias import initialized a jax backend'\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr
