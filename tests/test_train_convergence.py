"""Training sanity: the fine-tuning step actually learns (tiny overfit)."""

import numpy as np

import jax
import jax.numpy as jnp

from manga_ocr_tpu import train as trainlib
from manga_ocr_tpu.models.config import MangaOCRConfig


def test_overfit_tiny_batch():
    cfg = MangaOCRConfig.tiny()
    opt = trainlib.make_optimizer(lr=3e-3)
    params, opt_state = trainlib.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    step = trainlib.make_train_step(cfg, opt)

    rng = np.random.default_rng(0)
    img = cfg.encoder.image_size
    tokens = rng.integers(4, cfg.decoder.vocab_size, size=(4, 10)).astype(np.int32)
    tokens[:, 0] = cfg.decoder.bos_token_id
    tokens[:, -1] = cfg.decoder.eos_token_id
    batch = trainlib.TrainBatch(
        pixel_values=jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32)),
        tokens=jnp.asarray(tokens),
        loss_mask=jnp.ones((4, 10), jnp.float32),
    )

    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.5, losses  # memorized most of the batch
