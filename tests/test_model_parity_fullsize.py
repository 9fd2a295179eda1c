"""Full-size torch parity (VERDICT r2 #5).

The tiny-config tests in test_model_parity.py prove the math; this suite
proves the FULL base-config plumbing — 768 hidden / 12 encoder layers /
197 positions / 6144-vocab head / 300 decoder positions — against a
random-init torch ``VisionEncoderDecoderModel`` of the same architecture
(the real checkpoint is not downloadable here; the reference's black box is
``kha-white/manga-ocr-base`` invoked at
``/root/reference/src/ui/main_window.py:9801``).

Runs once per suite at batch 1-2 to stay minutes-bounded on one CPU core.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.models import convert as cvt  # noqa: E402
from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fullsize():
    from transformers import (
        BertConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    cfg = MangaOCRConfig.base()
    e, d = cfg.encoder, cfg.decoder
    torch.manual_seed(0)
    vc = ViTConfig(
        hidden_size=e.hidden_size,
        num_hidden_layers=e.num_layers,
        num_attention_heads=e.num_heads,
        intermediate_size=e.intermediate_size,
        image_size=e.image_size,
        patch_size=e.patch_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    bc = BertConfig(
        vocab_size=d.vocab_size,
        hidden_size=d.hidden_size,
        num_hidden_layers=d.num_layers,
        num_attention_heads=d.num_heads,
        intermediate_size=d.intermediate_size,
        max_position_embeddings=d.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        is_decoder=True,
        add_cross_attention=True,
    )
    cfg_hf = VisionEncoderDecoderConfig.from_encoder_decoder_configs(vc, bc)
    m = VisionEncoderDecoderModel(config=cfg_hf).eval()
    params = cvt.convert_state_dict(cvt.torch_state_dict_to_numpy(m), cfg)
    return m, cfg, params


def test_fullsize_encoder_parity(fullsize):
    """224x224 -> [1, 197, 768]: patch embed, 197-position interpolation-free
    pos table, 12 pre-LN blocks, final LN — all at real dims."""
    m, cfg, params = fullsize
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m.encoder(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(vit.encode(params["encoder"], jnp.asarray(px), cfg.encoder))
    assert got.shape == (1, 197, 768)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fullsize_decoder_and_greedy_steps(fullsize):
    """Full 6144-vocab head + 300-position table: teacher-forcing logits
    parity, then a few KV-cache greedy steps vs HF ``generate``."""
    m, cfg, params = fullsize
    d = cfg.decoder
    rng = np.random.default_rng(2)
    px = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        enc_t = m.encoder(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state
        toks = rng.integers(4, d.vocab_size, size=(1, 5)).astype(np.int64)
        toks[0, 0] = d.bos_token_id
        ref_logits = m.decoder(
            input_ids=torch.from_numpy(toks),
            encoder_hidden_states=enc_t,
        ).logits.numpy()
        ref_gen = m.generate(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            max_length=4,
            num_beams=1,
            do_sample=False,
            decoder_start_token_id=d.bos_token_id,
            eos_token_id=d.eos_token_id,
            pad_token_id=d.pad_token_id,
        ).numpy()

    enc = jnp.asarray(enc_t.numpy())
    got_logits = np.asarray(
        dec.forward_full(params["decoder"], jnp.asarray(toks, jnp.int32), enc, d)
    )
    assert got_logits.shape == (1, 5, d.vocab_size)
    np.testing.assert_allclose(got_logits, ref_logits, atol=3e-4, rtol=1e-3)

    # KV-cache greedy steps at the full config (300-pos cache, 6144 head)
    cross_kv = dec.precompute_cross_kv(params["decoder"], enc, d)
    cache = dec.init_cache(d, 1, 8)
    last = jnp.full((1,), d.bos_token_id, jnp.int32)
    got_seq = [int(last[0])]
    for t in range(3):
        logits, cache = dec.decode_step(
            params["decoder"], last, jnp.int32(t), cache, cross_kv, d
        )
        last = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        got_seq.append(int(last[0]))
    np.testing.assert_array_equal(
        np.asarray(got_seq[: ref_gen.shape[1]]), ref_gen[0]
    )
