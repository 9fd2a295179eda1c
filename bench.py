"""Repo-root benchmark entry point (driver contract: prints scored JSON
lines; the LAST line is the most complete).

The implementation lives in the installable package —
``manga_ocr_tpu/benchmark.py`` — so `manga-ocr-tpu bench` works from a pip
install too; this shim keeps `python bench.py` working from the repo root.
See the module docstring there for the phase structure (no-TPU parent,
deadline-budgeted child processes, never-kill-a-TPU-client policy) and the
methodology notes.
"""

from manga_ocr_tpu.benchmark import (  # noqa: F401 — re-exported surface
    BATCH_SIZES,
    MAX_NEW_TOKENS,
    NORTH_STAR,
    bench_batch,
    bench_full_path,
    main,
    run_budget300,
    run_full_path,
    run_model_only,
)

if __name__ == "__main__":
    import sys

    if "--model-only" in sys.argv:
        run_model_only()
    elif "--full-path" in sys.argv:
        run_full_path()
    elif "--budget300" in sys.argv:
        run_budget300()
    else:
        main()
