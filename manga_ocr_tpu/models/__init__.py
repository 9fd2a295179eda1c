from manga_ocr_tpu.models.config import (
    DecoderConfig,
    EncoderConfig,
    MangaOCRConfig,
)
