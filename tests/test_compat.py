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
