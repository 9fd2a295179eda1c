from manga_ocr_tpu.typeset.area import TypesetArea
