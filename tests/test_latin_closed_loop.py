"""Closed-loop accuracy for the Latin stack: a recognizer trained from
scratch reads held-out rendered lines through the PRODUCTION
``TpuLatinEngine.recognize_lines`` path (aspect resize → width bucketing →
normalization → batched dispatch → masked CTC decode).

The Latin analog of ``tests/test_closed_loop_accuracy.py``: it proves the
whole recognition surface end-to-end (model math, converter-shaped params,
engine batching, decode) without any pretrained checkpoint.
"""

import numpy as np
import pytest

import jax
import optax

from manga_ocr_tpu import train_latin as tl
from manga_ocr_tpu.engine.latin import TpuLatinEngine
from manga_ocr_tpu.models import crnn as crnn_mod

CHARSET = "0123456789"
CFG = crnn_mod.CrnnConfig(
    num_classes=len(CHARSET) + 1, output_channel=64, hidden_size=48
)
WIDTH = 96
MAX_CHARS = 6


@pytest.mark.slow
def test_latin_closed_loop_reads_heldout_lines():
    # lr matters: 2e-3 never escapes the all-blank CTC plateau on this
    # task; 1e-3 breaks through around step ~1.5k (measured)
    opt = optax.adam(1e-3)
    params, opt_state = tl.init_ctc_train_state(CFG, opt, jax.random.PRNGKey(0))
    step = tl.make_ctc_train_step(opt)
    data = tl.synthetic_line_dataset(
        CFG, CHARSET, batch_size=32, width=WIDTH, max_chars=MAX_CHARS, seed=0
    )
    loss = None
    for i in range(2000):
        params, opt_state, loss = step(params, opt_state, next(data))
        if i > 100 and float(loss) < 0.05:
            break
    assert float(loss) < 0.5, f"CTC training failed to converge: {loss}"

    # held-out lines through the PRODUCTION engine path
    eng = TpuLatinEngine(
        crnn_params=params,
        crnn_cfg=CFG,
        charset=CHARSET,
        craft_cfg=None,  # detector unused here
        rec_width_buckets=(WIDTH, 2 * WIDTH),
    )
    rng = np.random.default_rng(7)
    refs, crops = [], []
    for _ in range(24):
        n = int(rng.integers(1, MAX_CHARS + 1))
        idxs = rng.integers(0, len(CHARSET), size=n)
        text = "".join(CHARSET[k] for k in idxs)
        img, drawn = tl.render_line(text, CHARSET, CFG.input_height, WIDTH, rng)
        refs.append(text[:drawn])
        crops.append(img)
    got = eng.recognize_lines(crops)
    exact = sum(g == r for g, r in zip(got, refs))
    assert exact >= 20, f"read {exact}/24 exactly; pairs: {list(zip(refs, got))[:5]}"
