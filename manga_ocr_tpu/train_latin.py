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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manga_ocr_tpu.models import crnn as crnn_mod
from manga_ocr_tpu.models.crnn import CrnnConfig


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
