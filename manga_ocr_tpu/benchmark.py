"""Benchmark: bubble-crop OCR decodes/sec/chip on the full-size model.

Two measurements on the real TPU chip (bf16, int8 fused serving config,
32-token decode budget — representative of manga bubble text; with random
weights no EOS fires, so every row pays all 32 steps: worst-case):

1. **model-only headline** (the scored metric, methodology unchanged since
   round 1): pre-generated on-device pixels through encode + greedy decode,
   lengths read back — isolates the TPU program.
2. **full serving path** (BASELINE.json config #4): uint8 crops on host →
   ``engine.ocr_page`` → bucket/pad → host→device transfer →
   ``model_preprocess`` in-graph → encode → decode → token readback →
   detokenize.  This is what a production caller observes.

Prints ONE JSON line.  The scored fields stay
{"metric", "value", "unit", "vs_baseline"}; extra keys report the
full-path number, the per-stage split, and MFU (achieved model FLOP/s over
the v5e bf16/int8 peak — utils/metrics.model_flops_per_crop).
``vs_baseline`` is value / 5000 — the driver-set north-star target
(BASELINE.json); the reference itself publishes no numbers (BASELINE.md)
and its per-crop CPU path (main_window.py:9801) is orders of magnitude
slower.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

MAX_NEW_TOKENS = 32
BATCH_SIZES = (256, 384)
NORTH_STAR = 5000.0


def bench_batch(fn, params, batch: int, iters: int = 16) -> float:
    """Steady-state pipelined throughput.

    Inputs are generated on-device (serving transfers uint8 pages once; the
    model path is what's measured).  NOTE: ``block_until_ready`` does not
    reliably block through the axon tunnel — only a host readback does — so
    completion is forced by fetching ``lengths`` ([B] ints) per call.

    ``iters=16``: at pipeline depth 6 the drain edge (the gap between the
    last issue and the first readback) is still ~7% of the window —
    measured 3817 → 4094 crops/s going 6 → 16 at B=256
    (scripts/perf_dispatch_amortize.py).  Depth 16 amortizes it to <2%;
    per-call host issue cost is ~1 ms (measured) so deeper pipelines are
    purely more steady-state.
    """
    import numpy as np

    px = jax.jit(
        lambda k: jax.random.normal(k, (batch, 224, 224, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    _ = np.asarray(fn(params, px).lengths)  # compile + warm
    best_dt = float("inf")
    # three timing rounds, best sustained rate: the tunnel adds occasional
    # multi-ms stalls (and run-scale bandwidth swings, docs/PERF.md) that a
    # single round folds into the mean
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, px) for _ in range(iters)]
        for o in outs:
            np.asarray(o.lengths)
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    return batch / best_dt


def bench_full_path(engine, batch: int, iters: int = 6) -> tuple[float, dict]:
    """crops/s through the streaming serving loop — uint8 crops in, strings
    out (``engine.ocr_pages``).

    One shape bucket (all crops near the same size) so steady state is one
    dispatch per page; includes host orient/bucket/grayscale, H2D transfer
    (single-channel gray wire), in-graph preprocessing, decode, token
    readback and detokenization.  Pages stream with lookahead so transfer
    and compute overlap — the production calling pattern.  The per-stage
    split comes from one additional *synchronous* ``ocr_page`` call (stage
    attribution needs syncs that would break the pipelining)."""
    import numpy as np

    from manga_ocr_tpu.utils.metrics import StageTimer

    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(rng.integers(96, 127), rng.integers(80, 120), 3))
        .astype(np.uint8)
        for _ in range(batch)
    ]
    _ = engine.ocr_page(crops)  # compile + warm
    pages = [crops] * iters
    _ = engine.ocr_pages(pages[:3])  # warm the streamed loop itself: its
    # first pass measured ~3x slow (residual caching/dispatch effects)
    best_dt, n = float("inf"), 0
    for _ in range(3):  # best of three rounds (tunnel stall tolerance)
        t0 = time.perf_counter()
        texts = engine.ocr_pages(pages)
        best_dt = min(best_dt, time.perf_counter() - t0)
        n = sum(len(t) for t in texts)
    dt = best_dt
    timer = StageTimer()
    with timer.stage("ocr_page"):
        engine.ocr_page(crops, timer=timer)
    return n / dt, timer.summary()


def run_full_path() -> None:
    """``bench.py --full-path``: the full-serving-path measurement, run in
    its own process and printing one JSON line.

    Why a separate process: the model-only phase running earlier in the same
    process was measured to roughly double the streamed loop's readback
    stage (~65 → ~130 ms/page; docs/PERF.md "bench-process full-path
    readback inflation"), depressing the streamed rate ~2× below what a
    dedicated process observes — and a fresh process is also exactly what
    the number claims to represent: a production caller's serving loop."""
    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.utils import jax_cache

    jax_cache.enable()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    engine = TpuMangaOcrEngine(
        params_f32,
        MangaOCRConfig.base(),
        CharTokenizer.synthetic(),
        max_length=MAX_NEW_TOKENS,
        dtype=jnp.bfloat16,
    )
    full_rate, stage_summary = bench_full_path(engine, BATCH_SIZES[0])
    print(
        json.dumps(
            {
                "full_path_crops_per_s": round(full_rate, 1),
                "stage_summary": stage_summary,
            }
        )
    )


def main() -> None:
    # Full serving path (config #4 methodology) in a dedicated subprocess —
    # see run_full_path for why.  Sequenced FIRST, before this process
    # initializes the TPU backend, so the two processes never hold the chip
    # at the same time (TPU runtimes are single-tenant per process).
    full_rate, stage_summary = 0.0, {}
    try:
        import os as _os
        import subprocess
        import sys as _sys

        # Make the child able to import this package regardless of cwd or
        # install state (e.g. `python /root/repo/bench.py` from elsewhere).
        _pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        _env = dict(_os.environ)
        _env["PYTHONPATH"] = _pkg_root + _os.pathsep + _env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [_sys.executable, "-m", "manga_ocr_tpu.benchmark", "--full-path"],
            capture_output=True,
            text=True,
            timeout=3600,
            env=_env,
        )
        print(proc.stderr[-2000:], file=_sys.stderr)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                full_rate = d["full_path_crops_per_s"]
                stage_summary = d["stage_summary"]
    except Exception:
        pass

    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.utils import jax_cache
    from manga_ocr_tpu.utils import metrics as M

    jax_cache.enable()

    from manga_ocr_tpu.models.quantize import quantize_encoder

    # The serving configuration (engine defaults): fused Pallas encoder
    # kernels + int8 MLP.  Greedy-token parity with the f32 XLA path is
    # covered by tests/test_fused_encoder.py.
    from manga_ocr_tpu.engine.engine import _cast_quantized

    cfg = MangaOCRConfig.serving()
    params_f32 = mdl.init_params(MangaOCRConfig.base(), jax.random.PRNGKey(0))
    params = mdl.cast_params(params_f32, jnp.bfloat16)
    params["encoder"] = _cast_quantized(
        quantize_encoder(params_f32["encoder"], quantize_attn_proj=True), jnp.bfloat16
    )
    # Fixed-length workload (random weights never emit EOS): one decode
    # chunk == the whole budget, no intermediate early-exit syncs.
    fn = mdl.make_jitted_ocr(cfg, max_length=MAX_NEW_TOKENS, chunk_size=MAX_NEW_TOKENS)

    best = 0.0
    for b in BATCH_SIZES:
        try:
            rate = bench_batch(fn, params, b)
        except Exception:
            break
        import sys

        print(f"# model-only B={b}: {rate:.1f} crops/s", file=sys.stderr)
        best = max(best, rate)

    flops_crop = M.model_flops_per_crop(cfg, MAX_NEW_TOKENS)
    out = {
        "metric": "bubble_crop_ocr_decodes_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "crops/s",
        "vs_baseline": round(best / NORTH_STAR, 3),
        "full_path_crops_per_s": round(full_rate, 1),
        "model_gflops_per_crop": round(flops_crop / 1e9, 2),
        "mfu_vs_bf16_peak": round(M.mfu(best, flops_crop, M.V5E_PEAK_BF16), 4),
        "mfu_vs_int8_peak": round(M.mfu(best, flops_crop, M.V5E_PEAK_INT8), 4),
        "full_path_stage_ms": {
            k: v["mean_ms"] for k, v in stage_summary.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    import argparse as _ap

    _p = _ap.ArgumentParser(
        prog="manga_ocr_tpu.benchmark",
        description="TPU throughput benchmark; prints ONE JSON line. "
        "WARNING: runs on (and holds) the local TPU chip.",
    )
    _p.add_argument(
        "--full-path",
        action="store_true",
        help="run only the full-serving-path phase (used by the parent "
        "process; see run_full_path)",
    )
    _args = _p.parse_args()
    if _args.full_path:
        run_full_path()
    else:
        main()
