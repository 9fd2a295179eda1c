"""Closed-loop FULL-CONFIG accuracy + realistic-length serving on the real chip.

Two evidence gaps survive the round-3 work (docs/PERF.md roadmap, VERDICT r2
#3): (a) closed-loop accuracy runs only at the tiny config on CPU
(tests/test_closed_loop_accuracy.py), so the production serving path has
never been shown to *read* at the flagship scale; (b) the realistic-length
EOS-exit payoff is claimed from an instrumented sweep, "blocked on the real
checkpoint".  A full-size model trained FROM SCRATCH on synthetic glyph
crops closes both at once: it is a genuine ~110M-param checkpoint at the
exact flagship config (ViT-base 768/12 + 2-layer decoder, 6144-entry head,
224x224 input — models/config.MangaOCRConfig.base()) whose greedy outputs
end with EOS at realistic lengths.  Not the real manga-ocr weights (network
is blocked here), but real full-scale EOS behavior on the real serving path.

Phases (all on the real TPU chip):
  1. Train base() from scratch on rendered pattern-glyph crops
     (train.render_text_crop; kana-only texts, lengths 1..18 so decoded
     token lengths land around the real checkpoint's reported median ~12).
  2. Read 256 HELD-OUT crops through the PRODUCTION engine — int8 + fused
     Pallas kernels + mega decode loop + bucketing + native host prep, at
     the reference's max_length=300 contract — and score exact / CER.
     Also through the unquantized bf16 XLA path to isolate quantization.
  3. Measure model-only throughput with the trained weights at budget 300
     (block-granular EOS exit live) vs the worst-case fixed-32 headline
     methodology in the same process — the "realistic-length" number the
     round-3 roadmap could not produce with random weights (random logits
     never emit EOS, so every row pays the full budget).

Reference surface being evidenced: the black-box per-crop manga_ocr call at
/root/reference/src/ui/main_window.py:9801 (HF generate() stops at EOS; its
tokenizer budget is 300).

Usage: python scripts/closed_loop_fullsize.py [--steps N] [--batch B]
Writes the trained checkpoint to /tmp/mocr_fullsize_ckpt/ (re-used on
re-runs when present; delete to retrain) and prints a JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

from manga_ocr_tpu import train as tr  # noqa: E402
from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine  # noqa: E402
from manga_ocr_tpu.eval import cer  # noqa: E402
from manga_ocr_tpu.models import checkpoint as ckpt  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402
from manga_ocr_tpu.models.tokenizer import CharTokenizer  # noqa: E402
from manga_ocr_tpu.ops import preprocess as pp  # noqa: E402

CKPT = "/tmp/mocr_fullsize_ckpt"  # directory (manifest + npz)
CANVAS = (224, 160)  # fixed train canvas: one model_preprocess compile
SEQ = 24  # CLS + <=18 chars + SEP + slack


def say(m: str) -> None:
    print(m, flush=True)


def _chars(tok: CharTokenizer) -> list[str]:
    # kana-only: tokenizer.post_process (h2z) is identity on kana, so
    # engine-decoded text compares char-exact against the sampled text
    return [t for t in tok.id_to_token[4:150] if len(t) == 1]


def _sample_text(rng, chars) -> str:
    n = int(rng.integers(1, 19))  # decoded lengths ~3..20, median ~11
    return "".join(rng.choice(chars) for _ in range(n))


def _render(text: str, rng) -> np.ndarray:
    h = int(rng.integers(176, CANVAS[0] + 1))
    w = int(rng.integers(104, CANVAS[1] + 1))
    return tr.render_text_crop(text, rng, 224, hw=(h, w))


def make_batch_fn(
    cfg: MangaOCRConfig,
    tok: CharTokenizer,
    batch: int,
    seed: int,
    pool_min: int = 4000,
    pool_max: int = 250_000,
):
    """Host-side batch builder: variable-size crops on a fixed canvas, the
    SAME valid-region preprocess graph the serving engine runs.

    Rendering runs on ONE host core at ~250 crops/s — synchronous
    rendering caps the whole train loop at ~7.5 steps/s (measured: the
    TPU step itself supports ~8x that).  A background producer thread
    keeps appending fresh samples to a growing pool while batches sample
    from it with replacement, so the loop is TPU-bound and every sample
    is revisited a handful of times as the pool grows."""
    import threading

    rng = np.random.default_rng(seed)
    chars = _chars(tok)
    prep = jax.jit(
        lambda a, s: pp.model_preprocess(a, sizes=s, image_size=224).astype(
            jnp.float32
        )
    )

    pool: list[tuple[np.ndarray, list[int]]] = []
    lock = threading.Lock()
    stop = threading.Event()

    def producer():
        prng = np.random.default_rng(seed + 1)
        while not stop.is_set() and len(pool) < pool_max:
            text = _sample_text(prng, chars)
            crop = _render(text, prng)
            ids = tok.encode(text)[:SEQ]
            with lock:
                pool.append((crop, ids))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while len(pool) < pool_min:
        time.sleep(0.5)
    say(f"  data pool warmed: {len(pool)} samples (producer keeps filling)")

    def gen():
        try:
            while True:
                arr = np.zeros((batch, CANVAS[0], CANVAS[1], 3), np.uint8)
                sizes = np.zeros((batch, 2), np.int32)
                tokens = np.full((batch, SEQ), cfg.decoder.pad_token_id, np.int32)
                mask = np.zeros((batch, SEQ), np.float32)
                with lock:
                    n = len(pool)
                    picks = [pool[j] for j in rng.integers(0, n, batch)]
                for i, (crop, ids) in enumerate(picks):
                    arr[i, : crop.shape[0], : crop.shape[1]] = crop
                    sizes[i] = crop.shape[:2]
                    tokens[i, : len(ids)] = ids
                    mask[i, : len(ids)] = 1.0
                px = prep(jnp.asarray(arr), jnp.asarray(sizes))
                yield tr.TrainBatch(px, jnp.asarray(tokens), jnp.asarray(mask))
        finally:
            stop.set()

    return gen()


def train(cfg, tok, steps: int, batch: int, peak_lr: float = 2e-4):
    import optax

    # global-norm clip guards the from-scratch full-size run against the
    # occasional early-training gradient spike (script-local; the package
    # optimizer is the plain fine-tuning config).  From-scratch base()
    # sits at the unigram-entropy plateau (~4.6 = ln(100)) for several
    # thousand steps before the encoder features become useful — the
    # schedule must still have LR left when that happens (the first
    # attempt decayed to ~0 by step 8000, right as loss started moving).
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        tr.make_optimizer(
            lr=tr.make_lr_schedule(
                peak_lr=peak_lr,
                warmup_steps=min(1500, steps // 8),
                decay_steps=steps,
            )
        ),
    )
    params, opt_state = tr.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    step = tr.make_train_step(cfg, opt)
    it = tr.Prefetcher(make_batch_fn(cfg, tok, batch, seed=0))
    t0 = time.perf_counter()
    loss = None
    done_step = steps
    try:
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, next(it))
            if i % 100 == 0 or i == steps - 1:
                lv = float(loss)
                say(
                    f"  step {i:5d}  loss {lv:.4f}  "
                    f"({time.perf_counter() - t0:.0f}s)"
                )
                if lv < 0.01 and i > 400:
                    done_step = i
                    break
            if i and i % 5000 == 0:
                # disaster insurance for the multi-hour run; partial dir so
                # a re-run does not mistake it for a finished checkpoint
                ckpt.save_checkpoint(CKPT + "_partial", jax.device_get(params), cfg)
    finally:
        it.close()
    return jax.device_get(params), float(loss), done_step, time.perf_counter() - t0


def heldout(tok, n: int, seed: int = 9999):
    rng = np.random.default_rng(seed)
    chars = _chars(tok)
    refs, crops = [], []
    for _ in range(n):
        refs.append(_sample_text(rng, chars))
        crops.append(_render(refs[-1], rng))
    return refs, crops


def score(got: list[str], refs: list[str]) -> tuple[float, float]:
    exact = sum(g == r for g, r in zip(got, refs)) / len(refs)
    mean_cer = float(np.mean([cer(g, r) for g, r in zip(got, refs)]))
    return exact, mean_cer


def throughput_model_only(engine, crops, max_length: int, iters=12, depth=16):
    """Steady-state pipelined rate on REAL trained-model pixels (bench.py
    methodology; random pixels would never emit EOS).  The program routes
    through the AOT executable store under a name shared with bench
    phase D (benchmark.run_trained_eos), so whichever side compiles first
    banks the executable for the other."""
    from manga_ocr_tpu.utils import aot_store

    b = len(crops)
    mh = max(c.shape[0] for c in crops)
    mw = max(c.shape[1] for c in crops)
    arr = np.zeros((b, mh, mw, 3), np.uint8)
    sizes = np.zeros((b, 2), np.int32)
    for i, c in enumerate(crops):
        arr[i, : c.shape[0], : c.shape[1]] = c
        sizes[i] = c.shape[:2]
    px = jax.jit(
        lambda a, s: pp.model_preprocess(a, sizes=s, image_size=224).astype(
            engine.dtype
        )
    )(jnp.asarray(arr), jnp.asarray(sizes))
    fn = mdl.make_jitted_ocr(engine.cfg, max_length=max_length)
    fn = aot_store.load_or_compile(
        fn, (engine.params, px), f"trained-eos{max_length}-b{b}", note=say
    )
    out = fn(engine.params, px)
    lengths = np.asarray(out.lengths)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(engine.params, px) for _ in range(iters)]
        for o in outs:
            np.asarray(o.lengths)
        best = min(best, (time.perf_counter() - t0) / iters)
    return b / best, lengths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--peak-lr", type=float, default=2e-4)
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--tp-batch", type=int, default=256)
    args = ap.parse_args()

    say(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    cfg = MangaOCRConfig.base()
    tok = CharTokenizer.synthetic()

    if os.path.exists(CKPT):
        say(f"reusing checkpoint {CKPT}")
        params, cfg = ckpt.load_checkpoint(CKPT)
        train_info = {"reused": True}
    else:
        say(f"training base() from scratch: steps<={args.steps} batch={args.batch}")
        params, loss, done_step, dt = train(
            cfg, tok, args.steps, args.batch, peak_lr=args.peak_lr
        )
        ckpt.save_checkpoint(CKPT, params, cfg)
        train_info = {
            "final_loss": loss,
            "steps": done_step,
            "train_s": round(dt, 1),
        }
        say(f"trained: {train_info}")

    refs, crops = heldout(tok, args.eval_n)

    say("eval: production engine (int8 + fused kernels), max_length=300")
    eng = TpuMangaOcrEngine(
        params, cfg, tok, max_length=300, dtype=jnp.bfloat16, aot=True
    )
    t0 = time.perf_counter()
    got = eng.ocr_page(crops, orientation=pp.ORIENT_NONE)
    t_fused = time.perf_counter() - t0
    exact_f, cer_f = score(got, refs)
    say(f"  fused int8: exact {exact_f:.3f}  CER {cer_f:.4f}  ({t_fused:.1f}s incl compile)")
    for r, g in list(zip(refs, got))[:5]:
        say(f"    ref={r!r}\n    got={g!r}")

    say("eval: unquantized bf16 XLA path")
    eng_x = TpuMangaOcrEngine(
        params, cfg, tok, max_length=300, dtype=jnp.bfloat16,
        serving_kernels=False, aot=True,
    )
    got_x = eng_x.ocr_page(crops, orientation=pp.ORIENT_NONE)
    exact_x, cer_x = score(got_x, refs)
    say(f"  xla bf16:  exact {exact_x:.3f}  CER {cer_x:.4f}")
    # VERDICT r4 #1(c): with TRAINED logits (no random-weight near-ties),
    # the fused Pallas path and the XLA path should emit identical text —
    # this is the on-chip rebuttal of the random-weight argmax caveat
    # (docs/ROUND4.md).  int8 quantization can still flip characters the
    # model is genuinely unsure about, so report agreement, not assert.
    agree = sum(a == b for a, b in zip(got, got_x)) / len(got)
    say(f"  fused-vs-xla text agreement: {agree:.3f}")

    say("throughput: trained weights, budget 300 w/ EOS exit (fused config)")
    # tile the heldout crops up to the headline batch (bench.py methodology
    # measures B=256 — smaller batches sit on the ~40 ms RPC floor of the
    # tunneled runtime, not on device compute)
    tp_crops = (crops * -(-args.tp_batch // len(crops)))[: args.tp_batch]
    rate300, lengths = throughput_model_only(eng, tp_crops, max_length=300)
    say(
        f"  budget-300 trained: {rate300:.1f} crops/s  "
        f"lengths med {np.median(lengths):.0f} p95 {np.percentile(lengths, 95):.0f} "
        f"max {lengths.max()}"
    )
    rate32, _ = throughput_model_only(eng, tp_crops, max_length=32)
    say(f"  budget-32 same weights: {rate32:.1f} crops/s (headline methodology)")

    say(json.dumps({
        "train": train_info,
        "exact_fused_int8": round(exact_f, 4),
        "cer_fused_int8": round(cer_f, 5),
        "exact_xla_bf16": round(exact_x, 4),
        "cer_xla_bf16": round(cer_x, 5),
        "fused_vs_xla_agree": round(agree, 4),
        "crops_per_s_budget300_trained": round(rate300, 1),
        "crops_per_s_budget32": round(rate32, 1),
        "len_median": float(np.median(lengths)),
        "eval_n": args.eval_n,
    }))


if __name__ == "__main__":
    main()
