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


def load_fixtures(path: str, manifest: dict | None = None) -> list[dict]:
    """Fixture dicts: {name, crop, ref, orientation, kind, dual_ref?}.

    ``manifest["items"]`` (scripts/make_fixtures.py) records each crop's
    kind and orientation so eval exercises the reference's crop-preparation
    contract — orientation rules, polygon-masked crops, dual-pass pairs —
    not just the happy path (VERDICT r2 #8).  Directories without a
    manifest default every crop to Vertical."""
    from manga_ocr_tpu.core.files import safe_open_image

    meta = {}
    if manifest:
        meta = {it["name"]: it for it in manifest.get("items", [])}
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
            ref = f.read().strip()
        item = {
            "name": stem,
            "crop": img,
            "ref": ref,
            "kind": meta.get(stem, {}).get("kind", "plain"),
            "orientation": meta.get(stem, {}).get("orientation", "Vertical"),
        }
        dual = os.path.join(path, f"{stem}.dual.txt")
        if os.path.exists(dual):
            with open(dual, encoding="utf-8") as f:
                item["dual_ref"] = f.read().strip()
        out.append(item)
    return out


def _orient_code(name: str):
    from manga_ocr_tpu.ops import preprocess as pp

    return {
        "Vertical": pp.ORIENT_VERTICAL,
        "Horizontal": pp.ORIENT_HORIZONTAL,
        "Auto-Detect": pp.ORIENT_AUTO,
        "None": pp.ORIENT_NONE,
    }.get(name, pp.ORIENT_VERTICAL)


def evaluate(engine, fixtures: list) -> dict:
    """``engine``: batched OCR engine (``ocr_page`` / ``ocr_page_dual``) or a
    bare ``ocr_page`` callable (legacy); ``fixtures``: ``load_fixtures``
    dicts.  Crops are dispatched batched per orientation (exactly the
    serving path); dual-pass fixtures run through ``ocr_page_dual`` and
    score both passes."""
    if not fixtures:
        return {"n": 0, "mean_cer": 0.0, "exact_match": 0.0}
    if not hasattr(engine, "ocr_page"):  # legacy: bare callable

        class _Wrap:
            def __init__(self, fn):
                self.ocr_page = fn

        engine = _Wrap(engine)

    hyps: dict[int, str] = {}
    dual_hyps: dict[int, str] = {}
    dual_idx = [i for i, f in enumerate(fixtures) if "dual_ref" in f]
    if dual_idx and hasattr(engine, "ocr_page_dual"):
        pairs = engine.ocr_page_dual([fixtures[i]["crop"] for i in dual_idx])
        for i, (raw, second) in zip(dual_idx, pairs):
            hyps[i] = raw
            dual_hyps[i] = second
    rest = [i for i in range(len(fixtures)) if i not in hyps]
    for orientation in sorted({fixtures[i]["orientation"] for i in rest}):
        idxs = [i for i in rest if fixtures[i]["orientation"] == orientation]
        # Probe the signature up front: catching TypeError around the call
        # itself would also swallow genuine TypeErrors raised inside OCR and
        # silently rescore under the default orientation.
        import inspect

        try:
            takes_orient = len(inspect.signature(engine.ocr_page).parameters) >= 2
        except (TypeError, ValueError):
            takes_orient = True
        crops = [fixtures[i]["crop"] for i in idxs]
        if takes_orient:
            out = engine.ocr_page(crops, _orient_code(orientation))
        else:  # legacy single-arg ocr_page
            out = engine.ocr_page(crops)
        hyps.update(dict(zip(idxs, out)))

    cers, exact, per_item = [], 0, []
    for i, f in enumerate(fixtures):
        hyp = hyps[i]
        c = cer(hyp, f["ref"])
        cers.append(c)
        exact += hyp == f["ref"]
        row = {
            "name": f["name"],
            "kind": f["kind"],
            "orientation": f["orientation"],
            "cer": round(c, 4),
            "ref": f["ref"],
            "hyp": hyp,
        }
        if i in dual_hyps:
            c2 = cer(dual_hyps[i], f["dual_ref"])
            cers.append(c2)
            exact += dual_hyps[i] == f["dual_ref"]
            row["dual_cer"] = round(c2, 4)
            row["dual_ref"] = f["dual_ref"]
            row["dual_hyp"] = dual_hyps[i]
        per_item.append(row)
    n_scored = len(cers)
    return {
        "n": len(fixtures),
        "n_scored": n_scored,
        "mean_cer": round(sum(cers) / n_scored, 4),
        "exact_match": round(exact / n_scored, 4),
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
    p.add_argument(
        "--dtype",
        default="bfloat16",
        choices=("bfloat16", "float32"),
        help="compute dtype (float32 for bit-reproducible CPU evaluation)",
    )
    p.add_argument(
        "--serving-kernels",
        default="auto",
        choices=("auto", "on", "off"),
        help="fused Pallas+int8 serving config, or 'off' for the exact "
        "XLA math baseline",
    )
    args = p.parse_args(argv)

    engine = None
    manifest = None
    manifest_path = os.path.join(args.fixtures, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    if not args.checkpoint and manifest is not None:
        engine = _engine_from_manifest(args.fixtures, manifest)
    if engine is None:
        from manga_ocr_tpu import cli

        engine = cli._build_engine(args)
    fixtures = load_fixtures(args.fixtures, manifest)
    report = evaluate(engine, fixtures)
    print(json.dumps(report, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
