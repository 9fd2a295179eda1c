"""Drop-in ``manga_ocr`` compatibility alias.

The reference GUI imports the upstream pip package by this exact name
(``from manga_ocr import MangaOcr`` — /root/reference/src/core/config.py:432,
instantiated at main_window.py:3392-3398 and invoked per crop at :9801).
Installing this distribution therefore has to satisfy that import
unmodified; this package re-exports the TPU-backed implementation from
``manga_ocr_tpu.compat`` so the GUI (and any other upstream caller) runs
on the batched TPU engine without a single source edit.

Keep this module import-light: the reference imports it at startup merely
to probe availability, so pulling in jax here would cost every caller the
backend init even when OCR is never used.  ``MangaOcr.__init__`` does the
heavy lifting lazily, exactly like the upstream package's constructor
(which downloads/loads the HF checkpoint on construction, not on import).
"""

from manga_ocr_tpu import __version__
from manga_ocr_tpu.compat import MangaOcr

__all__ = ["MangaOcr", "__version__"]
