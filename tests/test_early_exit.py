"""EOS-driven chunked early exit: parity + serving-default coverage.

The serving path (``engine._bucket_fn`` → ``model.ocr_forward``) decodes in
chunks of 8 under a ``while_loop`` whose condition breaks as soon as every
row is done (VERDICT r2 #6).  With a real EOS-emitting checkpoint that makes
median-12-token bubbles pay ~16 steps instead of the full budget.  These
tests pin the semantics: early exit must change *cost only* — the emitted
tokens and lengths are identical to an exhaustive full-budget decode.

Random weights never emit EOS, so stop behavior is forced through the same
done-masking machinery via ``stop_lengths`` (exactly how a model-emitted EOS
flows through ``one_step``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig


@pytest.fixture(scope="module")
def setup():
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    pixels = jax.random.uniform(
        jax.random.PRNGKey(1), (6, cfg.encoder.image_size, cfg.encoder.image_size, 3)
    )
    enc_out = mdl.encode(params, pixels, cfg)
    return cfg, params, enc_out


def test_chunked_early_exit_token_parity(setup):
    """chunk_size=8 with early break emits IDENTICAL tokens/lengths to the
    exhaustive chunk_size=max_length decode."""
    cfg, params, enc_out = setup
    stops = jnp.asarray([3, 5, 2, 9, 4, 7], jnp.int32)
    full = mdl.greedy_decode(
        params, enc_out, cfg, max_length=16, chunk_size=16, stop_lengths=stops
    )
    chunked = mdl.greedy_decode(
        params, enc_out, cfg, max_length=16, chunk_size=8, stop_lengths=stops
    )
    np.testing.assert_array_equal(np.asarray(full.tokens), np.asarray(chunked.tokens))
    np.testing.assert_array_equal(np.asarray(full.lengths), np.asarray(chunked.lengths))


def test_early_exit_lengths_honor_stops(setup):
    """Done rows stop growing: lengths equal the forced stop lengths and the
    tail is PAD."""
    cfg, params, enc_out = setup
    stops = jnp.asarray([2, 4, 3, 6, 2, 5], jnp.int32)
    out = mdl.greedy_decode(
        params, enc_out, cfg, max_length=16, chunk_size=4, stop_lengths=stops
    )
    np.testing.assert_array_equal(np.asarray(out.lengths), np.asarray(stops))
    toks = np.asarray(out.tokens)
    for i, stop in enumerate(np.asarray(stops)):
        assert (toks[i, stop:] == cfg.decoder.pad_token_id).all()


def test_serving_default_is_chunked():
    """ocr_forward's serving default decodes in chunks of 8 (early exit on),
    not in one fixed full-budget block."""
    import inspect

    sig = inspect.signature(mdl.ocr_forward)
    assert sig.parameters["chunk_size"].default == 8
