"""Generate the committed accuracy-fixture suite for eval.py.

Without network access there is no real manga-ocr checkpoint, so the
committed fixtures prove the *harness plumbing* end-to-end instead: crops
are synthetic bubble-like images (seeded), and the expected outputs are
what the seed-0 random-weight tiny JAX model (f32, reference XLA math, CPU)
decodes for them.  A manifest records the provenance so ``eval.py`` can
rebuild the exact engine; the same directory format accepts real
recorded-reference outputs the moment a checkpoint is mountable
(crop.png + crop.txt pairs — see eval.py docstring).

The suite covers the crop-preparation contract surface the reference
exercises (VERDICT r2 #8), not just the happy path:

- ``plain``   — bubble-like crops, default Vertical orientation,
- ``wide``    — w > h crops under Vertical (the manga-ocr rule rotates
  them 90° CW host-side; ``workers.py:318-327`` behavior),
- ``wide_h``  — w > h crops under Horizontal (NO rotation),
- ``tall``    — h >> w narrow columns,
- ``poly``    — polygon-masked crops: pixels outside the polygon forced
  white, the reference's confirmed-polygon semantics
  (``main_window.py:6499-6506``),
- ``dual``    — enhanced dual-pass pairs (``workers.py:383-420``): raw
  crop text in ``NNN.txt``, second-pass (preprocessed) text in
  ``NNN.dual.txt``, evaluated through ``ocr_page_dual``.

Usage: python scripts/make_fixtures.py [--out tests/fixtures/eval]
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


def synth_crop(
    rng: np.random.Generator, h: int | None = None, w: int | None = None
) -> np.ndarray:
    """A deterministic bubble-like crop: white ellipse, dark strokes."""
    h = int(rng.integers(48, 128)) if h is None else h
    w = int(rng.integers(40, 112)) if w is None else w
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


def polygon_masked_crop(rng: np.random.Generator) -> np.ndarray:
    """Crop with everything outside a convex polygon forced to WHITE — the
    reference's confirmed-polygon crop preparation
    (``main_window.py:6499-6506``: mask outside-polygon pixels to 255)."""
    img = synth_crop(rng)
    h, w = img.shape[:2]
    # convex polygon: random radii around the center at fixed angles
    angles = np.linspace(0, 2 * np.pi, 7, endpoint=False)
    radii = rng.uniform(0.55, 0.95, size=angles.shape)
    pts = np.stack(
        [
            h / 2 + radii * (h / 2 - 1) * np.sin(angles),
            w / 2 + radii * (w / 2 - 1) * np.cos(angles),
        ],
        axis=1,
    )
    yy, xx = np.mgrid[0:h, 0:w]
    inside = np.ones((h, w), bool)
    n = len(pts)
    for i in range(n):
        y0, x0 = pts[i]
        y1, x1 = pts[(i + 1) % n]
        # keep the half-plane left of each (ccw) edge
        inside &= (x1 - x0) * (yy - y0) - (y1 - y0) * (xx - x0) >= 0
    img[~inside] = 255
    return img


def build_suite(rng: np.random.Generator) -> list[dict]:
    """(kind, orientation, crop) spec list — ~20 fixtures."""
    suite = []
    for _ in range(6):
        suite.append({"kind": "plain", "orientation": "Vertical",
                      "crop": synth_crop(rng)})
    for _ in range(4):
        w = int(rng.integers(120, 200))
        h = int(rng.integers(40, 60))
        suite.append({"kind": "wide", "orientation": "Vertical",
                      "crop": synth_crop(rng, h=h, w=w)})
    for _ in range(2):
        w = int(rng.integers(120, 200))
        h = int(rng.integers(40, 60))
        suite.append({"kind": "wide_h", "orientation": "Horizontal",
                      "crop": synth_crop(rng, h=h, w=w)})
    for _ in range(2):
        h = int(rng.integers(140, 220))
        w = int(rng.integers(32, 48))
        suite.append({"kind": "tall", "orientation": "Vertical",
                      "crop": synth_crop(rng, h=h, w=w)})
    for _ in range(4):
        suite.append({"kind": "poly", "orientation": "Vertical",
                      "crop": polygon_masked_crop(rng)})
    for _ in range(2):
        suite.append({"kind": "dual", "orientation": "Auto-Detect",
                      "crop": synth_crop(rng)})
    return suite


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/eval")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.ops import preprocess as pp

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
    orient_of = {
        "Vertical": pp.ORIENT_VERTICAL,
        "Horizontal": pp.ORIENT_HORIZONTAL,
        "Auto-Detect": pp.ORIENT_AUTO,
    }

    rng = np.random.default_rng(args.seed)
    suite = build_suite(rng)
    os.makedirs(args.out, exist_ok=True)

    # primary outputs, batched per orientation (exactly how eval runs them)
    texts: dict[int, str] = {}
    duals: dict[int, str] = {}
    for orientation in sorted({s["orientation"] for s in suite}):
        idxs = [i for i, s in enumerate(suite) if s["orientation"] == orientation
                and s["kind"] != "dual"]
        if idxs:
            out = engine.ocr_page(
                [suite[i]["crop"] for i in idxs], orient_of[orientation]
            )
            texts.update(dict(zip(idxs, out)))
    dual_idx = [i for i, s in enumerate(suite) if s["kind"] == "dual"]
    if dual_idx:
        pairs = engine.ocr_page_dual([suite[i]["crop"] for i in dual_idx])
        for i, (raw, second) in zip(dual_idx, pairs):
            texts[i] = raw
            duals[i] = second

    items = []
    for i, spec in enumerate(suite):
        stem = f"{i:03d}"
        Image.fromarray(spec["crop"]).save(os.path.join(args.out, f"{stem}.png"))
        with open(os.path.join(args.out, f"{stem}.txt"), "w", encoding="utf-8") as f:
            f.write(texts[i])
        if i in duals:
            with open(
                os.path.join(args.out, f"{stem}.dual.txt"), "w", encoding="utf-8"
            ) as f:
                f.write(duals[i])
        items.append(
            {"name": stem, "kind": spec["kind"], "orientation": spec["orientation"]}
        )

    manifest = {
        "engine": "tiny-random",
        "seed": args.seed,
        "max_length": 12,
        "dtype": "float32",
        "serving_kernels": False,
        "items": items,
        "note": (
            "expected outputs produced by the seed-{} random-weight tiny JAX "
            "model on CPU (harness-plumbing fixtures; replace with recorded "
            "reference-package outputs when a real checkpoint is available)"
        ).format(args.seed),
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {len(suite)} fixtures to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
