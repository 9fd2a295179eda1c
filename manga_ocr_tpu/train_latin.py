"""CTC training for the Latin recognizer (models/crnn.py).

The reference never trains anything (SURVEY §5.4) — its Latin OCR comes
from pip checkpoints.  A complete framework must be able to (re)train the
recognizer it ships, e.g. to extend the charset or adapt to a typeface;
this module provides the CTC step (optax.ctc_loss over the per-column
logits) plus a synthetic horizontal-text dataset mirroring
``train.render_text_crop``'s pattern-glyph approach (PIL's default font
renders all non-latin glyphs identically — see ``train.pattern_glyph``;
the same per-character-distinct glyphs make this a real read task).

Closed-loop evidence: ``tests/test_latin_closed_loop.py`` trains a tiny
recognizer from scratch here and reads held-out rendered lines through the
production ``TpuLatinEngine.recognize_lines`` path (width bucketing +
normalization + CTC decode).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manga_ocr_tpu.models import crnn as crnn_mod
from manga_ocr_tpu.models.crnn import CrnnConfig

MANIFEST = "manifest.json"
WEIGHTS = "crnn.npz"


def _ctc_frames(width: int) -> int:
    """CTC time steps the CRNN emits for an input of ``width`` columns
    (W/4 - 1 at the production conv geometry, engine/latin.py)."""
    return width // 4 - 1


def _check_ctc_frames(width: int, max_chars: int) -> None:
    """CTC cannot align more labels than frames; e.g. --width 32
    --max-chars 16 gives 7 frames for up-to-16 labels and optax.ctc_loss
    silently produces degenerate per-sequence losses (ADVICE r3)."""
    frames = _ctc_frames(width)
    if frames < max_chars:
        raise ValueError(
            f"width {width} yields only {frames} CTC frames (< max_chars "
            f"{max_chars}); use width >= {(max_chars + 1) * 4}"
        )


class CtcBatch(NamedTuple):
    images: jax.Array  # [B, H, W, 1] normalized gray
    labels: jax.Array  # [B, N] int32 class ids (1-based; 0 = blank)
    label_paddings: jax.Array  # [B, N] float, 1.0 where padded


def ctc_loss_fn(params: dict, batch: CtcBatch) -> jax.Array:
    logits = crnn_mod.crnn_forward(params, batch.images).astype(jnp.float32)
    logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, batch.labels, batch.label_paddings
    )
    return jnp.mean(per_seq)


def make_ctc_train_step(optimizer):
    @jax.jit
    def step(params, opt_state, batch: CtcBatch):
        loss, grads = jax.value_and_grad(ctc_loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def init_ctc_train_state(cfg: CrnnConfig, optimizer, key):
    params = crnn_mod.init_crnn_params(cfg, key)
    return params, optimizer.init(params)


# ---------------------------------------------------------------------------
# Synthetic horizontal-line dataset
# ---------------------------------------------------------------------------


def render_line(
    text: str, charset: str, height: int, width: int, rng
) -> tuple[np.ndarray, int]:
    """Render ``text`` horizontally as per-character-distinct pattern glyphs
    on paper tone — (gray uint8 [height, width], chars actually drawn).
    The drawn count matters: labels must cover exactly what the image
    shows, or CTC fits phantom tail characters."""
    from manga_ocr_tpu.train import pattern_glyph

    img = np.full((height, width), 255, np.uint8)
    gs = max(4, min(height - 4, (width - 4) // max(len(text), 1) - 2))
    x = 2
    y = max(0, (height - gs) // 2)
    drawn = 0
    for ch in text:
        gl = pattern_glyph(ch, gs)
        if x + gl.shape[1] > width - 2:
            break
        img[y : y + gl.shape[0], x : x + gl.shape[1]] = gl
        x += gl.shape[1] + 2
        drawn += 1
    return img, drawn


def synthetic_line_dataset(
    cfg: CrnnConfig,
    charset: str,
    batch_size: int,
    width: int,
    max_chars: int,
    seed: int = 0,
):
    """Infinite CtcBatch generator of rendered charset lines (label ids are
    1-based — 0 is the CTC blank)."""
    rng = np.random.default_rng(seed)
    h = cfg.input_height
    _check_ctc_frames(width, max_chars)

    while True:
        images = np.zeros((batch_size, h, width, 1), np.float32)
        labels = np.zeros((batch_size, max_chars), np.int32)
        paddings = np.ones((batch_size, max_chars), np.float32)
        for i in range(batch_size):
            n = int(rng.integers(1, max_chars + 1))
            idxs = rng.integers(0, len(charset), size=n)
            text = "".join(charset[k] for k in idxs)
            img, drawn = render_line(text, charset, h, width, rng)
            images[i, ..., 0] = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
            labels[i, :drawn] = idxs[:drawn] + 1
            paddings[i, :drawn] = 0.0
        yield CtcBatch(
            jnp.asarray(images), jnp.asarray(labels), jnp.asarray(paddings)
        )


def directory_line_dataset(
    data_dir: str,
    cfg: CrnnConfig,
    charset: str,
    batch_size: int,
    width: int,
    max_chars: int,
    seed: int = 0,
):
    """Infinite CtcBatch generator over ``(name.png, name.txt)`` line pairs.

    Images are resized to ``cfg.input_height`` keeping aspect (the engine's
    serving-side rule, ``engine/latin.py recognize_lines``), left-aligned
    into the fixed training width; labels use 1-based charset ids.  Pairs
    whose text contains characters outside ``charset`` or exceeds
    ``max_chars`` are skipped with a warning (once each)."""
    from PIL import Image

    from manga_ocr_tpu.engine.latin import _resize_gray

    _check_ctc_frames(width, max_chars)
    idx = {c: i + 1 for i, c in enumerate(charset)}
    items: list[tuple[np.ndarray, list[int]]] = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".txt"):
            continue
        stem = name[:-4]
        img_path = None
        for ext in (".png", ".jpg", ".jpeg", ".bmp"):
            cand = os.path.join(data_dir, stem + ext)
            if os.path.exists(cand):
                img_path = cand
                break
        if img_path is None:
            continue
        with open(os.path.join(data_dir, name), encoding="utf-8") as f:
            text = f.read().strip("\n")
        if not text or len(text) > max_chars or any(c not in idx for c in text):
            print(f"train_latin: skipping {stem} (empty/too long/out-of-charset)")
            continue
        if len(text) > _ctc_frames(width):
            # CTC needs >= one frame per label; silently keeping the pair
            # would train against a degenerate per-sequence loss
            print(
                f"train_latin: skipping {stem} ({len(text)} labels > "
                f"{_ctc_frames(width)} CTC frames at --width {width})"
            )
            continue
        gray = np.asarray(Image.open(img_path).convert("L"), np.uint8)
        h, w = gray.shape
        nw = min(width, max(8, int(round(w * cfg.input_height / max(h, 1)))))
        items.append((_resize_gray(gray, (cfg.input_height, nw)), [idx[c] for c in text]))
    if not items:
        raise ValueError(f"no usable (img, txt) line pairs in {data_dir}")

    def _gen():
        rng = np.random.default_rng(seed)
        hh = cfg.input_height
        while True:
            picks = rng.integers(0, len(items), size=batch_size)
            # Pad value -1.0 = the serving distribution: recognize_lines
            # zero-pads the uint8 batch BEFORE normalizing, so the tail a
            # fine-tuned model sees at inference is (0/255-0.5)/0.5 = -1.0
            # (black), not 0.0 (mid-gray).
            images = np.full((batch_size, hh, width, 1), -1.0, np.float32)
            labels = np.zeros((batch_size, max_chars), np.int32)
            paddings = np.ones((batch_size, max_chars), np.float32)
            for row, k in enumerate(picks):
                gray, ids = items[int(k)]
                images[row, :, : gray.shape[1], 0] = (
                    gray.astype(np.float32) / 255.0 - 0.5
                ) / 0.5
                labels[row, : len(ids)] = ids
                paddings[row, : len(ids)] = 0.0
            yield CtcBatch(
                jnp.asarray(images), jnp.asarray(labels), jnp.asarray(paddings)
            )

    return _gen()


# ---------------------------------------------------------------------------
# Native checkpoint store (loadable by TpuLatinEngine / the registry)
# ---------------------------------------------------------------------------


def save_crnn_checkpoint(
    path: str, params: dict, cfg: CrnnConfig, charset: str
) -> None:
    """Write the recognizer as a native checkpoint dir: flat ``crnn.npz`` +
    a JSON manifest carrying the config and the training charset (so serving
    never has to guess the label mapping)."""
    from manga_ocr_tpu.models.checkpoint import _flatten

    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, WEIGHTS), **_flatten(params))
    manifest = {"format": 1, "charset": charset, **dataclasses.asdict(cfg)}
    with open(os.path.join(path, MANIFEST), "w", encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2)


def load_crnn_checkpoint(path: str) -> tuple[dict, CrnnConfig, str]:
    """Inverse of :func:`save_crnn_checkpoint` → (params, cfg, charset)."""
    from manga_ocr_tpu.models.checkpoint import _relistify

    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    charset = manifest.pop("charset")
    manifest.pop("format", None)
    cfg = CrnnConfig(**manifest)
    data = np.load(os.path.join(path, WEIGHTS))
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return _relistify(tree), cfg, charset


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    """Fine-tune / train the Latin recognizer:
    ``python -m manga_ocr_tpu.train_latin``.

    Synthetic pattern-glyph lines by default; ``--data DIR`` of
    (line.png, line.txt) pairs for real data.  ``--init`` seeds from a
    converted EasyOCR ``.pth`` or a native checkpoint dir; ``--out`` writes
    the native dir the registry loads via ``tpu.latin_crnn_checkpoint``."""
    import argparse

    from manga_ocr_tpu.engine.latin import DEFAULT_CHARSET

    p = argparse.ArgumentParser(prog="manga-ocr-tpu-train-latin")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--width", type=int, default=128, help="training line width (px)")
    p.add_argument("--max-chars", type=int, default=16)
    p.add_argument("--charset", default=DEFAULT_CHARSET)
    p.add_argument("--data", default="", help="dir of (line.png, line.txt) pairs; default: synthetic")
    p.add_argument("--init", default="", help="EasyOCR .pth or native checkpoint dir to fine-tune from")
    p.add_argument("--out", default="", help="native checkpoint dir to write")
    p.add_argument("--save-every", type=int, default=0, help="also save every N steps (0 = end only)")
    p.add_argument("--hidden-size", type=int, default=256)
    p.add_argument("--output-channel", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    args = p.parse_args(argv)

    try:
        _check_ctc_frames(args.width, args.max_chars)
    except ValueError as e:
        p.error(str(e))

    charset = args.charset
    if args.init and os.path.isdir(args.init):
        params, cfg, charset = load_crnn_checkpoint(args.init)
        # The checkpoint manifest is authoritative for architecture +
        # charset; an explicitly-passed conflicting flag would otherwise be
        # silently ignored (ADVICE r3) — fail loudly instead.
        conflicts = [
            (flag, passed, got)
            for flag, passed, got in (
                ("--charset", args.charset, charset),
                ("--hidden-size", args.hidden_size, cfg.hidden_size),
                ("--output-channel", args.output_channel, cfg.output_channel),
            )
            if passed != p.get_default(flag.lstrip("-").replace("-", "_"))
            and passed != got
        ]
        if conflicts:
            p.error(
                "; ".join(
                    f"{flag}={passed!r} conflicts with the --init checkpoint "
                    f"manifest ({got!r}); drop the flag (the manifest is "
                    "authoritative) or train from scratch"
                    for flag, passed, got in conflicts
                )
            )
    elif args.init:  # torch .pth
        from manga_ocr_tpu.models import convert_latin as cl

        params = cl.convert_crnn_state_dict(cl.load_torch_checkpoint(args.init))
        num_classes = params["head"]["bias"].shape[0]
        if len(charset) + 1 != num_classes:
            print(
                f"--init has {num_classes} classes; --charset must have "
                f"{num_classes - 1} characters"
            )
            return 1
        cfg = CrnnConfig(
            num_classes=num_classes,
            output_channel=args.output_channel,
            hidden_size=args.hidden_size,
        )
    else:
        cfg = CrnnConfig(
            num_classes=len(charset) + 1,
            output_channel=args.output_channel,
            hidden_size=args.hidden_size,
        )
        params = None

    optimizer = optax.adamw(args.lr)
    if params is None:
        params, opt_state = init_ctc_train_state(
            cfg, optimizer, jax.random.PRNGKey(args.seed)
        )
    else:
        opt_state = optimizer.init(params)
    step = make_ctc_train_step(optimizer)

    if args.data:
        dataset = directory_line_dataset(
            args.data, cfg, charset, args.batch_size, args.width,
            args.max_chars, seed=args.seed,
        )
    else:
        dataset = synthetic_line_dataset(
            cfg, charset, args.batch_size, args.width, args.max_chars,
            seed=args.seed,
        )

    loss = float("nan")
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, next(dataset))
        if args.log_every and (i % args.log_every == 0 or i == args.steps - 1):
            print(f"step {i}: ctc_loss={float(loss):.4f}", flush=True)
        if args.out and args.save_every and i and i % args.save_every == 0:
            save_crnn_checkpoint(args.out, params, cfg, charset)
    if args.out:
        save_crnn_checkpoint(args.out, params, cfg, charset)
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
