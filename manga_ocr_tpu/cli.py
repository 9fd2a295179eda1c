"""manga-ocr-tpu command-line app.

The reference ships a PyQt5 GUI (``/root/reference/main.py``); this framework
is GUI-toolkit-free, so the app surface is a CLI covering the same workflow
end-to-end: load pages → detect bubbles → batched TPU OCR → (optional)
translate → typeset → export, plus project save/load.

Usage examples:
    python -m manga_ocr_tpu.cli ocr IMAGE [IMAGE...]        # OCR whole pages
    python -m manga_ocr_tpu.cli process FOLDER --out DIR    # full pipeline
    python -m manga_ocr_tpu.cli bench                       # throughput (JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_engine(args):
    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.convert import load_hf_checkpoint
    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.utils import jax_cache

    jax_cache.enable()
    dtype = (
        jnp.float32
        if getattr(args, "dtype", "bfloat16") == "float32"
        else jnp.bfloat16
    )
    sk_flag = getattr(args, "serving_kernels", "auto")
    serving_kernels = None if sk_flag == "auto" else (sk_flag == "on")
    ckpt = args.checkpoint or os.environ.get("MANGA_OCR_CHECKPOINT", "")
    if ckpt and os.path.isdir(ckpt):
        # Always load f32: the engine casts to the compute dtype itself and
        # computes int8 quantization scales from the ORIGINAL weights —
        # loading bf16 here would silently requantize from rounded values.
        params, cfg = load_hf_checkpoint(ckpt)
        vocab_path = os.path.join(ckpt, "vocab.txt")
        tok = (
            CharTokenizer.from_vocab_file(vocab_path)
            if os.path.exists(vocab_path)
            else CharTokenizer.synthetic()
        )
    else:
        print(
            "warning: no checkpoint dir (pass --checkpoint or set "
            "MANGA_OCR_CHECKPOINT); using random weights — output will be "
            "garbage but the pipeline runs.",
            file=sys.stderr,
        )
        cfg = MangaOCRConfig.base()
        # f32 init for the same reason as the checkpoint path above
        params = mdl.init_params(cfg, jax.random.PRNGKey(0))
        tok = CharTokenizer.synthetic()
    mesh = None
    n_data = int(getattr(args, "mesh_data", 0) or 0)
    if n_data > 1:
        # data-parallel serving: params replicated, crop batches sharded on
        # the data axis; the fused serving kernels run per shard (SURVEY
        # §5.8 — validated by dryrun_multichip / tests/test_engine_mesh.py)
        from manga_ocr_tpu.parallel import mesh as meshlib

        mesh = meshlib.make_mesh(n_data)
    return TpuMangaOcrEngine(
        params, cfg, tok, max_length=args.max_length, dtype=dtype,
        mesh=mesh,
        serving_kernels=serving_kernels,
        wire=getattr(args, "wire", "gray"),
        coalesce=not getattr(args, "no_coalesce", False),
        # serve.py defaults the AOT executable store ON (cold-start
        # elimination); one-shot CLI runs leave it off unless asked
        aot=not getattr(args, "no_aot", True),
    )


def cmd_ocr(args) -> int:
    from manga_ocr_tpu.core import files as fio

    engine = _build_engine(args)
    crops = []
    for path in args.images:
        img = fio.safe_open_image(path)
        if img is None:
            print(f"error: cannot read {path}", file=sys.stderr)
            return 1
        crops.append(img)
    t0 = time.time()
    texts = engine.ocr_page(crops)
    dt = time.time() - t0
    for path, text in zip(args.images, texts):
        print(f"{path}\t{text}")
    print(f"# {len(crops)} crops in {dt:.2f}s", file=sys.stderr)
    return 0


def cmd_process(args) -> int:
    from manga_ocr_tpu.core import files as fio
    from manga_ocr_tpu.core.geometry import Rect
    from manga_ocr_tpu.core.project import Project, save_project
    from manga_ocr_tpu.core.settings import Settings
    from manga_ocr_tpu.detect import contours as cont
    from manga_ocr_tpu.detect.detector import BubbleDetector, crops_from_detections
    from manga_ocr_tpu.models import detector as seg
    from manga_ocr_tpu.runtime import export as ex
    from manga_ocr_tpu.runtime.pipeline import OcrJob, PagePipeline
    from manga_ocr_tpu.translate.service import TranslationService

    settings = Settings(args.settings) if args.settings else Settings()
    engine = _build_engine(args)

    detector = None
    det_ckpt = args.detector or settings.get("tpu.detector_checkpoint")
    if det_ckpt and os.path.exists(det_ckpt):
        if args.detector_type == "yolo":
            from manga_ocr_tpu.models import yolo_seg

            cfg_y = yolo_seg.YoloSegConfig()
            yolo = yolo_seg.YoloBubbleDetector(
                yolo_seg.load_params(det_ckpt, cfg_y), cfg_y
            )

            class _YoloAdapter:
                def detect_bubbles(self, page):
                    mask = yolo.detect_bubble_mask(page)
                    return [
                        {"polygon": p, "text": None}
                        for p in cont.mask_to_polygons(mask, min_area=200)
                    ]

            detector = _YoloAdapter()
        else:
            # same data-parallel mesh as the OCR engine: page batches
            # shard over the data axis (tests/test_secondary_mesh.py)
            n_data = int(getattr(args, "mesh_data", 0) or 0)
            det_mesh = None
            if n_data > 1:
                from manga_ocr_tpu.parallel import mesh as meshlib

                det_mesh = meshlib.make_mesh(n_data)
            detector = BubbleDetector.from_checkpoint(det_ckpt, mesh=det_mesh)

    translate = None
    if args.translate:
        svc = TranslationService(settings)
        translate = lambda text, s: svc.translate_with_ai(
            text, provider=args.provider, target_lang=args.target_lang
        )

    # Enhanced dual-pass fidelity (reference workers.py:398-402): the second
    # pass goes to Tesseract(jpn) on the preprocessed crop when the binary
    # is installed; same-model-on-binarized is only the fallback.
    import functools as _ft

    from manga_ocr_tpu.engine.registry import TesseractEngine

    try:
        second = TesseractEngine()
    except RuntimeError:
        second = None
    dual = _ft.partial(engine.ocr_page_dual, second_engine=second)
    pipe = PagePipeline(engine.ocr_page, translate=translate, dual_pass=dual)
    project = Project(project_dir=args.folder)

    pages = fio.list_images(args.folder)
    if not pages:
        print(f"no images found in {args.folder}", file=sys.stderr)
        return 1
    # one snapshot for the whole run — as_dict() deep-copies the settings
    # tree, so per-job copies were pure waste (settings don't change here)
    settings_dict = settings.as_dict()

    # Text-mode detection (reference AutoDetector mode "Text",
    # workers.py:470-474): proposals recognized in ONE batched dispatch,
    # detections carry their text so the pipeline's pre-text skip applies.
    text_proposer = None
    if args.detect_mode == "text" and args.text_proposer in ("auto", "craft"):
        from manga_ocr_tpu.detect import text_detect as td

        craft_ckpt = settings.get("tpu.latin_craft_checkpoint") or ""
        if craft_ckpt and os.path.exists(craft_ckpt):
            from manga_ocr_tpu.engine.latin import TpuLatinEngine
            from manga_ocr_tpu.models import convert_latin as cl

            latin = TpuLatinEngine(
                craft_params=cl.convert_craft_state_dict(
                    cl.load_torch_checkpoint(craft_ckpt)
                )
            )
            text_proposer = td.craft_proposer(latin)
        elif args.text_proposer == "craft":
            # Distinguish "not configured" from "configured but missing" —
            # the same message for both sent users hunting the wrong
            # problem (ADVICE r3).
            if craft_ckpt:
                print(
                    f"--text-proposer craft: tpu.latin_craft_checkpoint is "
                    f"set but the file does not exist: {craft_ckpt}",
                    file=sys.stderr,
                )
            else:
                print(
                    "--text-proposer craft needs tpu.latin_craft_checkpoint "
                    "in settings",
                    file=sys.stderr,
                )
            return 1
        elif craft_ckpt:
            # auto mode with a configured-but-missing path: note the silent
            # downgrade instead of hiding it
            print(
                f"note: tpu.latin_craft_checkpoint not found ({craft_ckpt}); "
                "falling back to the morphological text proposer",
                file=sys.stderr,
            )

    for path in pages:
        page = fio.safe_open_image(path)
        if page is None:
            continue
        if args.detect_mode == "text":
            from manga_ocr_tpu.detect import text_detect as td

            items = td.detect_text_regions(
                page, engine.ocr_page, proposer=text_proposer
            )
            detections = [{"polygon": poly, "text": text} for text, poly in items]
        elif detector is not None:
            detections = detector.detect_bubbles(page)
            # auto_split_bubbles is a per-job UI-checkbox key in the
            # reference (get_current_settings, main_window.py:4946), not a
            # settings.json key — the CLI flag is the checkbox analog
            if settings_dict.get("auto_split_bubbles", not args.no_split_bubbles):
                from manga_ocr_tpu.detect import postprocess as _post

                detections = _post.split_extended_bubbles(detections)
        else:
            # no DL weights: whole page as one region (still exercises OCR)
            h, w = page.shape[:2]
            from manga_ocr_tpu.core.geometry import polygon_from_rect

            detections = [{"polygon": polygon_from_rect(Rect(0, 0, w, h)), "text": None}]
        crops, metas = crops_from_detections(page, detections)
        jobs = [
            OcrJob(path, m["rect"], m["polygon"], crop, settings_dict, m["text"])
            for crop, m in zip(crops, metas)
        ]
        results = pipe.process_jobs(jobs, enhanced=args.enhanced or None)
        for r in results:
            if r.area is not None:
                project.add_area(path, r.area, push_undo=False)
                project.register_history_entry(
                    path, r.area, r.original_text, r.translated_text
                )
        print(f"{path}: {len(results)} regions", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    proj_path = os.path.join(args.out, "project.json")
    save_project(project, proj_path)
    written = ex.batch_save(project, fmt=args.format)
    print(f"project: {proj_path}; typeset pages: {len(written)}", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    from manga_ocr_tpu import benchmark

    benchmark.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="manga-ocr-tpu")
    p.add_argument("--checkpoint", default="", help="HF checkpoint dir for the OCR model")
    p.add_argument("--max-length", type=int, default=300)
    p.add_argument(
        "--wire",
        default="gray",
        choices=("gray", "packed"),
        help="host->device crop format: padded gray batches (default) or "
        "height-tight row-packed buffers (~10-15%% fewer DMA bytes, "
        "single-device)",
    )
    p.add_argument(
        "--no-coalesce",
        action="store_true",
        help="disable single-transfer/single-readback coalescing of "
        "multi-bucket pages (debugging/measurement aid)",
    )
    p.add_argument(
        "--mesh-data",
        type=int,
        default=0,
        help="shard crop batches over N devices (data-parallel serving; "
        "0/1 = single chip)",
    )
    p.add_argument(
        "--dtype",
        default="bfloat16",
        choices=("bfloat16", "float32"),
        help="compute dtype (bfloat16 on TPU; float32 for CPU runs and "
        "bit-reproducible evaluation)",
    )
    p.add_argument(
        "--serving-kernels",
        default="auto",
        choices=("auto", "on", "off"),
        help="fused Pallas + int8 serving config: auto (engine default), "
        "on, or off (exact f32/bf16 XLA math — evaluation baseline)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    p_ocr = sub.add_parser("ocr", help="OCR one or more crop images")
    p_ocr.add_argument("images", nargs="+")
    p_ocr.set_defaults(fn=cmd_ocr)

    p_proc = sub.add_parser("process", help="full detect→OCR→translate→typeset pipeline")
    p_proc.add_argument("folder")
    p_proc.add_argument("--out", required=True)
    p_proc.add_argument("--detector", default="", help="bubble segmenter .npz")
    p_proc.add_argument(
        "--detector-type", default="unet", choices=("unet", "yolo"),
        help="segmentation family for --detector weights",
    )
    p_proc.add_argument("--settings", default="", help="settings.json path")
    p_proc.add_argument("--translate", action="store_true")
    p_proc.add_argument("--provider", default="gemini")
    p_proc.add_argument("--target-lang", default="English")
    p_proc.add_argument("--enhanced", action="store_true", help="dual-pass OCR")
    p_proc.add_argument(
        "--no-split-bubbles",
        action="store_true",
        help="disable the reference's auto_split_bubbles rule (UI checkbox "
        "analog, main_window.py:4946)",
    )
    p_proc.add_argument(
        "--detect-mode",
        default="bubble",
        choices=("bubble", "text"),
        help="detection sweep mode (the reference AutoDetector's "
        "Bubble/Text switch, workers.py:448-482): bubble = segmenter mask "
        "-> polygons; text = region proposals recognized in one batched "
        "dispatch",
    )
    p_proc.add_argument(
        "--text-proposer",
        default="auto",
        choices=("auto", "morph", "craft"),
        help="text-mode proposal source: morphological pass (reference "
        "behavior) or the native CRAFT detector (needs "
        "tpu.latin_craft_checkpoint); auto = craft when configured",
    )
    p_proc.add_argument("--format", default="PNG")
    p_proc.set_defaults(fn=cmd_process)

    p_bench = sub.add_parser("bench", help="throughput benchmark on this chip")
    p_bench.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
