"""Token-exact parity of the whole-decode-loop mega-kernel
(ops/decode_loop.py) against the XLA greedy decode, incl. the quantized
serving form — same bar as every other fused path (interpret mode on CPU).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import decoder as dec
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.ops.decode_loop import greedy_decode_loop


@pytest.fixture(scope="module")
def setup():
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    px = jax.random.uniform(
        jax.random.PRNGKey(1), (4, cfg.encoder.image_size, cfg.encoder.image_size, 3)
    )
    enc_out = mdl.encode(params, px, cfg)
    return cfg, params, enc_out


def test_loop_kernel_matches_xla_greedy(setup):
    cfg, params, enc_out = setup
    ref = mdl.greedy_decode(params, enc_out, cfg, max_length=12, chunk_size=12)
    lcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop")
    )
    got = mdl.greedy_decode(params, enc_out, lcfg, max_length=12, chunk_size=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_loop_kernel_stop_lengths_parity(setup):
    """The ``stop_lengths`` bench instrument (forced early exit under a
    realistic length distribution) routes through the mega-kernel with the
    exact semantics of the XLA path — tokens truncated at the stop, PAD
    after, lengths clamped (VERDICT r3 #6: the budget-300 realistic
    measurement must exercise the PRODUCTION decode path)."""
    cfg, params, enc_out = setup
    stops = jnp.asarray([2, 5, 9, 12], jnp.int32)
    xcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="xla")
    )
    ref = mdl.greedy_decode(
        params, enc_out, xcfg, max_length=12, chunk_size=12, stop_lengths=stops
    )
    lcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop")
    )
    got = mdl.greedy_decode(
        params, enc_out, lcfg, max_length=12, chunk_size=12, stop_lengths=stops
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))
    # and the stops genuinely bind: no row runs past its stop length
    assert (np.asarray(got.lengths) <= np.asarray(stops)).all()


def test_loop_kernel_int8_serving_form(setup):
    """int8 decoder weights + int8 cross-KV (the serving configuration the
    kernel exists for) still emits the XLA f32 reference tokens."""
    from manga_ocr_tpu.models.quantize import quantize_decoder

    cfg, params, enc_out = setup
    ref = mdl.greedy_decode(params, enc_out, cfg, max_length=12, chunk_size=12)
    lcfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, step_kernel="fused_loop", cross_kv_int8=True
        ),
    )
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    got = mdl.greedy_decode(qparams, enc_out, lcfg, max_length=12, chunk_size=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_loop_kernel_chains_and_phased_head(setup):
    """loop_chains (interleaved independent row-chains per program) and
    head_phased (grouped vocab matmuls + tree argmax) are scheduling-only:
    tokens must match the plain fused_loop exactly, incl. combined and
    with int8 decoder weights."""
    from manga_ocr_tpu.models.quantize import quantize_decoder

    cfg, params, enc_out = setup
    base = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop")
    )
    ref = mdl.greedy_decode(params, enc_out, base, max_length=12, chunk_size=12)
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    qref = mdl.greedy_decode(qparams, enc_out, base, max_length=12, chunk_size=12)
    for chains, phased in ((2, False), (1, True), (2, True)):
        vcfg = dataclasses.replace(
            base,
            decoder=dataclasses.replace(
                base.decoder, loop_chains=chains, head_phased=phased
            ),
        )
        got = mdl.greedy_decode(params, enc_out, vcfg, max_length=12, chunk_size=12)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens),
            err_msg=f"chains={chains} phased={phased}",
        )
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )
        qgot = mdl.greedy_decode(qparams, enc_out, vcfg, max_length=12, chunk_size=12)
        np.testing.assert_array_equal(
            np.asarray(qgot.tokens), np.asarray(qref.tokens),
            err_msg=f"int8 chains={chains} phased={phased}",
        )


def test_loop_kernel_eos_done_masking(setup):
    """Rows that emit EOS flip to PAD and stop counting — checked by making
    EOS the argmax for one row via a biased head."""
    cfg, params, enc_out = setup
    d = cfg.decoder
    # bias the head so EVERY row emits EOS at the first step
    biased = jax.tree.map(lambda a: a, params)  # shallow copy tree
    head_bias = biased["decoder"]["head"]["proj"]["bias"]
    biased["decoder"]["head"]["proj"] = dict(
        biased["decoder"]["head"]["proj"],
        bias=head_bias.at[d.eos_token_id].set(1e4),
    )
    lcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(d, step_kernel="fused_loop")
    )
    out = mdl.greedy_decode(biased, enc_out, lcfg, max_length=12, chunk_size=12)
    toks = np.asarray(out.tokens)
    np.testing.assert_array_equal(toks[:, 0], d.bos_token_id)
    np.testing.assert_array_equal(toks[:, 1], d.eos_token_id)
    assert (toks[:, 2:] == d.pad_token_id).all()
    np.testing.assert_array_equal(np.asarray(out.lengths), 2)


def test_loop_kernel_fuse_cross_kv(setup):
    """fuse_cross_kv (final LN + cross-K/V projections inside the kernel,
    from the raw encoder output) emits exactly the precomputed-slab path's
    tokens — through the full ocr_forward composition."""
    cfg, params, _ = setup
    px = jax.random.uniform(
        jax.random.PRNGKey(1), (4, cfg.encoder.image_size, cfg.encoder.image_size, 3)
    )
    ref_cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop")
    )
    fuse_cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, step_kernel="fused_loop", fuse_cross_kv=True
        ),
    )
    ref = mdl.ocr_forward(params, px, ref_cfg, max_length=12)
    got = mdl.ocr_forward(params, px, fuse_cfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_loop_kernel_fuse_cross_kv_seq_padded(setup):
    """fuse_cross_kv with an encoder seq-pad (s_valid < slab length): the
    kernel's LN runs over the padded garbage rows but cross-attention masks
    their keys — tokens must match the sliced+LN'd XLA tail exactly."""
    cfg, params, _ = setup
    px = jax.random.uniform(
        jax.random.PRNGKey(2), (4, cfg.encoder.image_size, cfg.encoder.image_size, 3)
    )
    enc_pad = dataclasses.replace(
        cfg.encoder, attn_kernel="fused_layer", mlp_kernel="fused", seq_pad_to=8
    )
    ref_cfg = dataclasses.replace(
        cfg,
        encoder=enc_pad,
        decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop"),
    )
    fuse_cfg = dataclasses.replace(
        ref_cfg,
        decoder=dataclasses.replace(ref_cfg.decoder, fuse_cross_kv=True),
    )
    ref = mdl.ocr_forward(params, px, ref_cfg, max_length=12)
    got = mdl.ocr_forward(params, px, fuse_cfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_loop_kernel_fuse_cross_kv_int8_serving_form(setup):
    """fuse_cross_kv composed with int8 decoder projections (the serving
    form): cross k/v kernels stay bf16 (quantize_decoder leaves them) and
    tokens still match the unfused path."""
    from manga_ocr_tpu.models.quantize import quantize_decoder

    cfg, params, _ = setup
    px = jax.random.uniform(
        jax.random.PRNGKey(3), (4, cfg.encoder.image_size, cfg.encoder.image_size, 3)
    )
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    ref_cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, step_kernel="fused_loop")
    )
    fuse_cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, step_kernel="fused_loop", fuse_cross_kv=True
        ),
    )
    ref = mdl.ocr_forward(qparams, px, ref_cfg, max_length=12)
    got = mdl.ocr_forward(qparams, px, fuse_cfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_loop_kernel_direct_wrapper(setup):
    """Direct greedy_decode_loop call returns (tokens [B, steps+1], lengths)
    with BOS first."""
    cfg, params, enc_out = setup
    cross = dec.precompute_cross_kv_packed(params["decoder"], enc_out, cfg.decoder)
    tokens, lengths = greedy_decode_loop(
        params["decoder"], cross, cfg.decoder, steps=7, dtype=jnp.float32
    )
    assert tokens.shape == (4, 8)
    assert (np.asarray(tokens)[:, 0] == cfg.decoder.bos_token_id).all()
    assert np.asarray(lengths).min() >= 1
