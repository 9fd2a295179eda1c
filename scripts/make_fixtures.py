"""Generate the committed accuracy-fixture suite for eval.py.

Without network access there is no real manga-ocr checkpoint, so the
committed fixtures prove the *harness plumbing* end-to-end instead: crops
are synthetic bubble-like images (seeded), and the expected outputs are
what the seed-0 random-weight tiny JAX model (f32, reference XLA math, CPU)
decodes for them.  A manifest records the provenance so ``eval.py`` can
rebuild the exact engine; the same directory format accepts real
recorded-reference outputs the moment a checkpoint is mountable
(crop.png + crop.txt pairs — see eval.py docstring).

Usage: python scripts/make_fixtures.py [--out tests/fixtures/eval] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # determinism for committed refs

import numpy as np  # noqa: E402


def synth_crop(rng: np.random.Generator, idx: int) -> np.ndarray:
    """A deterministic bubble-like crop: white ellipse, dark strokes."""
    h = int(rng.integers(48, 128))
    w = int(rng.integers(40, 112))
    img = np.full((h, w, 3), 255, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    ell = ((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2 <= 1.0
    img[~ell] = rng.integers(120, 220)
    # vertical text-ish strokes
    n_cols = max(1, w // 24)
    for c in range(n_cols):
        x0 = int(w * (c + 1) / (n_cols + 1))
        for y0 in range(h // 6, h - h // 6, 10):
            th = int(rng.integers(2, 4))
            img[y0 : y0 + 6, x0 : x0 + th] = 0
            if rng.random() < 0.5:
                img[y0 + 2 : y0 + 4, x0 - 3 : x0 + th + 3] = 0
    return img


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/eval")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(args.seed))
    engine = TpuMangaOcrEngine(
        params,
        cfg,
        CharTokenizer.synthetic(),
        max_length=12,
        dtype=jnp.float32,
        serving_kernels=False,
    )

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    crops = [synth_crop(rng, i) for i in range(args.n)]
    texts = engine.ocr_page(crops)
    for i, (crop, text) in enumerate(zip(crops, texts)):
        Image.fromarray(crop).save(os.path.join(args.out, f"{i:03d}.png"))
        with open(os.path.join(args.out, f"{i:03d}.txt"), "w", encoding="utf-8") as f:
            f.write(text)
    manifest = {
        "engine": "tiny-random",
        "seed": args.seed,
        "max_length": 12,
        "dtype": "float32",
        "serving_kernels": False,
        "note": (
            "expected outputs produced by the seed-{} random-weight tiny JAX "
            "model on CPU (harness-plumbing fixtures; replace with recorded "
            "reference-package outputs when a real checkpoint is available)"
        ).format(args.seed),
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {args.n} fixtures to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
