"""manga_ocr_tpu — a TPU-native manga OCR & typesetting framework.

A from-scratch rebuild of the capabilities of the reference "Manga OCR &
Typeset Tool" (irazawa/Manga-OCR), designed TPU-first:

- ``models/``   — the manga-ocr ViT encoder + BERT-style autoregressive decoder
                  implemented as pure-functional JAX with stacked-layer params
                  (``lax.scan`` over layers), KV-cache greedy decode under
                  ``lax.while_loop``, plus the HF-checkpoint weight converter
                  and the char-level Japanese tokenizer.
- ``ops/``      — Pallas TPU kernels and batched XLA image ops (resize,
                  grayscale, rotation, histogram equalization, Gaussian blur,
                  Otsu / adaptive threshold) forming the fused preprocessing
                  graph.
- ``parallel/`` — device-mesh construction and batch-dim sharding (pjit /
                  shard_map) for multi-chip page pipelines.
- ``engine/``   — the drop-in engine layer keeping the reference's contracts
                  (``perform_ocr``-style dispatch, job schema, sentinel error
                  strings) plus the new batched ``ocr_page`` entry point.
- ``detect/``   — bubble/text detection: JAX segmentation model, host-side
                  contour extraction, and the pure post-processing functions
                  (noise filter, block merge, bubble split).
- ``core/``     — pure data + contracts: settings system, job/result types,
                  geometry serialization (no GUI deps).
"""

__version__ = "0.4.0"
