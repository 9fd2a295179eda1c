"""Repo-root benchmark entry point (driver contract: prints ONE JSON line).

The implementation lives in the installable package —
``manga_ocr_tpu/benchmark.py`` — so `manga-ocr-tpu bench` works from a pip
install too; this shim keeps `python bench.py` working from the repo root.
See the module docstring there for the two measurements (model-only headline
and the full serving path) and the methodology notes.
"""

from manga_ocr_tpu.benchmark import (  # noqa: F401 — re-exported surface
    BATCH_SIZES,
    MAX_NEW_TOKENS,
    NORTH_STAR,
    bench_batch,
    bench_full_path,
    main,
    run_full_path,
)

if __name__ == "__main__":
    import sys

    if "--full-path" in sys.argv:
        run_full_path()
    else:
        main()
