from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
