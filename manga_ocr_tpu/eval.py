"""Accuracy evaluation harness: character accuracy vs reference outputs.

The north-star metric pairs throughput with *character-accuracy parity vs
the CPU reference* (BASELINE.md).  This harness measures it once a real
checkpoint is present: feed fixture crops with reference transcriptions
(produced by the original ``manga_ocr`` package on the same crops) and
report CER / exact-match.

Fixture format (a directory):
    fixtures/
      000.png     — the crop
      000.txt     — the reference engine's output for that crop (UTF-8)
      ...
Run:  python -m manga_ocr_tpu.eval fixtures/ --checkpoint DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def levenshtein(a: str, b: str) -> int:
    try:
        import Levenshtein

        return Levenshtein.distance(a, b)
    except ImportError:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]


def cer(hypothesis: str, reference: str) -> float:
    """Character error rate (edit distance / reference length)."""
    if not reference:
        return 0.0 if not hypothesis else 1.0
    return levenshtein(hypothesis, reference) / len(reference)


def load_fixtures(path: str) -> list[tuple[str, "object", str]]:
    from manga_ocr_tpu.core.files import safe_open_image

    out = []
    for name in sorted(os.listdir(path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        stem = os.path.splitext(name)[0]
        txt = os.path.join(path, f"{stem}.txt")
        if not os.path.exists(txt):
            continue
        img = safe_open_image(os.path.join(path, name))
        if img is None:
            continue
        with open(txt, encoding="utf-8") as f:
            out.append((stem, img, f.read().strip()))
    return out


def evaluate(ocr_page, fixtures: list) -> dict:
    """ocr_page: batched engine entry; fixtures: (name, crop, reference)."""
    if not fixtures:
        return {"n": 0, "mean_cer": 0.0, "exact_match": 0.0}
    crops = [f[1] for f in fixtures]
    hyps = ocr_page(crops)
    cers, exact, per_item = [], 0, []
    for (name, _, ref), hyp in zip(fixtures, hyps):
        c = cer(hyp, ref)
        cers.append(c)
        exact += hyp == ref
        per_item.append({"name": name, "cer": round(c, 4), "ref": ref, "hyp": hyp})
    return {
        "n": len(fixtures),
        "mean_cer": round(sum(cers) / len(cers), 4),
        "exact_match": round(exact / len(fixtures), 4),
        "items": per_item,
    }


def _engine_from_manifest(path: str, manifest: dict):
    """Rebuild the engine a fixture set was generated with (see
    ``scripts/make_fixtures.py``).  Only the "tiny-random" harness-plumbing
    engine is recognized; real checkpoints use ``--checkpoint``."""
    if manifest.get("engine") != "tiny-random":
        return None
    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(int(manifest.get("seed", 0))))
    return TpuMangaOcrEngine(
        params,
        cfg,
        CharTokenizer.synthetic(),
        max_length=int(manifest.get("max_length", 12)),
        dtype=jnp.float32,
        serving_kernels=bool(manifest.get("serving_kernels", False)),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("fixtures")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max-length", type=int, default=300)
    args = p.parse_args(argv)

    engine = None
    manifest_path = os.path.join(args.fixtures, "manifest.json")
    if not args.checkpoint and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            engine = _engine_from_manifest(args.fixtures, json.load(f))
    if engine is None:
        from manga_ocr_tpu import cli

        engine = cli._build_engine(args)
    fixtures = load_fixtures(args.fixtures)
    report = evaluate(engine.ocr_page, fixtures)
    print(json.dumps(report, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
