"""Numerical parity of the JAX model vs a torch HF VisionEncoderDecoderModel.

The real manga-ocr checkpoint is not downloadable in this environment, so
parity is proven on locally-built random-weight models with the same
architecture family (ViT encoder + BERT decoder w/ cross-attention), at tiny
dims for speed.  This validates the weight converter and every piece of model
math (patch embed, pre-LN ViT blocks, post-LN BERT blocks, cross-attention,
LM head, KV-cache greedy decode) end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.models import convert as cvt  # noqa: E402
from manga_ocr_tpu.models import decoder as dec  # noqa: E402
from manga_ocr_tpu.models import model as mdl  # noqa: E402
from manga_ocr_tpu.models import vit  # noqa: E402
from manga_ocr_tpu.models.config import MangaOCRConfig  # noqa: E402


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    from transformers import (
        BertConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    torch.manual_seed(0)
    vc = ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    bc = BertConfig(
        vocab_size=100,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        is_decoder=True,
        add_cross_attention=True,
    )
    cfg_hf = VisionEncoderDecoderConfig.from_encoder_decoder_configs(vc, bc)
    m = VisionEncoderDecoderModel(config=cfg_hf).eval()

    cfg = MangaOCRConfig.tiny(vocab_size=100)
    sd = cvt.torch_state_dict_to_numpy(m)
    params = cvt.convert_state_dict(sd, cfg)
    return m, cfg, params


def test_encoder_parity(torch_model_and_cfg):
    m, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(1)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m.encoder(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(vit.encode(params["encoder"], jnp.asarray(px), cfg.encoder))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_decoder_full_forward_parity(torch_model_and_cfg):
    m, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(2)
    enc = rng.normal(size=(2, 5, 64)).astype(np.float32)
    toks = rng.integers(0, 100, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = m.decoder(
            input_ids=torch.from_numpy(toks),
            encoder_hidden_states=torch.from_numpy(enc),
        ).logits.numpy()
    got = np.asarray(
        dec.forward_full(
            params["decoder"], jnp.asarray(toks, jnp.int32), jnp.asarray(enc), cfg.decoder
        )
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_incremental_decode_matches_full_forward(torch_model_and_cfg):
    """KV-cache step-by-step logits must equal teacher-forcing logits."""
    _, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 100, size=(2, 7)), jnp.int32)

    full = dec.forward_full(params["decoder"], toks, enc, cfg.decoder)

    cross_kv = dec.precompute_cross_kv(params["decoder"], enc, cfg.decoder)
    cache = dec.init_cache(cfg.decoder, 2, 7)
    step_logits = []
    for t in range(7):
        logits, cache = dec.decode_step(
            params["decoder"], toks[:, t], jnp.int32(t), cache, cross_kv, cfg.decoder
        )
        step_logits.append(np.asarray(logits))
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=2e-5, rtol=1e-4)


def test_greedy_decode_parity_vs_hf_generate(torch_model_and_cfg):
    m, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(4)
    px = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    max_len = 12

    with torch.no_grad():
        ref = m.generate(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            max_length=max_len,
            num_beams=1,
            do_sample=False,
            decoder_start_token_id=cfg.decoder.bos_token_id,
            eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id,
        ).numpy()

    out = mdl.ocr_forward(params, jnp.asarray(px), cfg, max_length=max_len)
    got = np.asarray(out.tokens)

    # HF returns sequences trimmed to the longest generated length.
    for b in range(3):
        ref_row = ref[b]
        got_row = got[b][: len(ref_row)]
        np.testing.assert_array_equal(got_row, ref_row)


def test_greedy_decode_jits_and_early_exits(torch_model_and_cfg):
    _, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    fn = mdl.make_jitted_ocr(cfg, max_length=12)
    out = fn(params, px)
    assert out.tokens.shape == (2, 12)
    assert np.all(np.asarray(out.lengths) >= 1)
    # second call hits the jit cache
    out2 = fn(params, px)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(out2.tokens))
