"""Measure the reference's serving path shape on this host's CPU.

The reference OCRs one crop per call through the CPU `manga_ocr` pip
package (`/root/reference/src/ui/main_window.py:9798-9803`, no batching;
up to 15 worker threads, `main_window.py:610`).  It publishes no numbers
(BASELINE.md), so this script measures the equivalent torch CPU program —
a `VisionEncoderDecoderModel` at the same architecture (ViT-base encoder,
2-layer BERT decoder, 6144 vocab — `models/config.py` base), random init,
greedy decode to the same 32-token budget bench.py uses — to put a
concrete measured figure behind "orders of magnitude slower".

Random weights never emit EOS, so every crop pays all 32 steps: identical
worst-case accounting to bench.py's model-only headline.  Single-threaded
(the per-worker view) and all-cores numbers are both reported; this host
exposes 1 core, so they coincide here.

Usage: python scripts/baseline_cpu_ref.py [n_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
MAX_NEW = 32


def main() -> None:
    import torch
    from transformers import (
        BertConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    from manga_ocr_tpu.models.config import MangaOCRConfig

    cfg = MangaOCRConfig.base()
    enc = ViTConfig(
        hidden_size=cfg.encoder.hidden_size,
        num_hidden_layers=cfg.encoder.num_layers,
        num_attention_heads=cfg.encoder.num_heads,
        intermediate_size=cfg.encoder.intermediate_size,
        image_size=cfg.encoder.image_size,
        patch_size=cfg.encoder.patch_size,
    )
    dec = BertConfig(
        vocab_size=cfg.decoder.vocab_size,
        hidden_size=cfg.decoder.hidden_size,
        num_hidden_layers=cfg.decoder.num_layers,
        num_attention_heads=cfg.decoder.num_heads,
        intermediate_size=cfg.decoder.intermediate_size,
        max_position_embeddings=cfg.decoder.max_position_embeddings,
        is_decoder=True,
        add_cross_attention=True,
    )
    model = VisionEncoderDecoderModel(
        config=VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    )
    for c in (model.config, model.generation_config):
        c.decoder_start_token_id = cfg.decoder.bos_token_id
        c.bos_token_id = cfg.decoder.bos_token_id
        c.pad_token_id = cfg.decoder.pad_token_id
    model.eval()

    px = torch.randn(1, 3, cfg.encoder.image_size, cfg.encoder.image_size)

    for label, threads in (("1 thread", 1), ("all cores", os.cpu_count() or 1)):
        torch.set_num_threads(threads)
        with torch.inference_mode():
            model.generate(px, max_new_tokens=MAX_NEW, num_beams=1)  # warm
            best = float("inf")
            for _ in range(N):
                t0 = time.perf_counter()
                out = model.generate(px, max_new_tokens=MAX_NEW, num_beams=1)
                best = min(best, time.perf_counter() - t0)
        assert out.shape[-1] >= MAX_NEW
        print(
            f"{label} ({threads}): {best * 1000:.0f} ms/crop = "
            f"{1.0 / best:.2f} crops/s "
            f"(x15 workers would be ~{15.0 / best:.1f} crops/s "
            f"if they scaled perfectly)",
            flush=True,
        )


if __name__ == "__main__":
    main()
