"""Parity of the fused serving kernels (packed attention + fused MLP,
bf16/int8) against the XLA reference math, plus greedy-token agreement of
the quantized serving path (VERDICT round-1: "token parity tests for every
quantized path").  CPU backend runs the kernels in interpreter mode.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models import vit
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.quantize import quantize_encoder
from manga_ocr_tpu.ops.fused_mlp import fused_mlp_block


@pytest.fixture(scope="module")
def cfg():
    return MangaOCRConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return mdl.init_params(cfg, jax.random.PRNGKey(0))


def _enc_cfg(cfg, **kw):
    return dataclasses.replace(cfg.encoder, **kw)


def _pixels(cfg, n=3, seed=1):
    s = cfg.encoder.image_size
    return jax.random.normal(jax.random.PRNGKey(seed), (n, s, s, 3), jnp.float32)


def test_fused_mlp_matches_xla_block(cfg, params):
    enc = params["encoder"]
    lp = jax.tree.map(lambda a: a[0], enc["layers"])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, cfg.encoder.hidden_size))
    ref = vit._mlp(x, lp, _enc_cfg(cfg))
    got = fused_mlp_block(
        x,
        lp["ln2"]["scale"],
        lp["ln2"]["bias"],
        lp["mlp"]["fc1"]["kernel"],
        lp["mlp"]["fc1"]["bias"],
        lp["mlp"]["fc2"]["kernel"],
        lp["mlp"]["fc2"]["bias"],
        eps=cfg.encoder.layer_norm_eps,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_packed_attention_encode_matches_xla(cfg, params):
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    got = vit.encode(params["encoder"], px, _enc_cfg(cfg, attn_kernel="packed"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_encode_matches_xla(cfg, params):
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    got = vit.encode(
        params["encoder"], px, _enc_cfg(cfg, attn_kernel="packed", mlp_kernel="fused")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_int8_fused_encode_close(cfg, params):
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    qenc = quantize_encoder(params["encoder"])
    got = vit.encode(qenc, px, _enc_cfg(cfg, mlp_kernel="fused"))
    err = np.abs(np.asarray(got) - np.asarray(ref))
    assert err.max() < 0.08, err.max()  # int8 quantization noise bound


def test_merged_layer_encode_matches_xla(cfg, params):
    """attn_kernel="merged_layer" (whole block in one kernel) matches the
    XLA reference encoder (bf16/f32 weights)."""
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    got = vit.encode(params["encoder"], px, _enc_cfg(cfg, attn_kernel="merged_layer"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_int8_merged_layer_close(cfg, params):
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    got = vit.encode(qenc, px, _enc_cfg(cfg, attn_kernel="merged_layer"))
    err = np.abs(np.asarray(got) - np.asarray(ref))
    assert err.max() < 0.08, err.max()  # int8 quantization noise bound


def test_sigmoid_gelu_int8_greedy_tokens_match(cfg, params):
    """gelu_mode="sigmoid" (fast VPU approx) on the int8 fused serving path
    still emits the same greedy tokens as the exact-GELU f32 reference —
    the approximation error (~0.02) sits below the int8 activation
    quantization step."""
    import jax.numpy as jnp
    from manga_ocr_tpu.models import model as mdl_

    px = _pixels(cfg, n=4, seed=11)
    ref = mdl_.ocr_forward(params, px, cfg, max_length=12)
    qparams = dict(params)
    qparams["encoder"] = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(
            cfg, mlp_kernel="fused", attn_kernel="fused_layer", gelu_mode="sigmoid"
        ),
    )
    got = mdl_.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_sigmoid_gelu_bf16_greedy_tokens_match(cfg, params):
    """gelu_mode="sigmoid" also holds greedy-token parity on the
    UNQUANTIZED fused path — covers users driving MangaOCRConfig.serving()
    with bf16/f32 params directly (the engine only enables sigmoid with
    int8, but serving() sets it unconditionally)."""
    from manga_ocr_tpu.models import model as mdl_

    px = _pixels(cfg, n=4, seed=13)
    ref = mdl_.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg, encoder=_enc_cfg(cfg, mlp_kernel="fused", gelu_mode="sigmoid")
    )
    got = mdl_.ocr_forward(params, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_seq_pad_parallel_phased_encode_exact(cfg, params):
    """The three scheduling-only serving flags — seq_pad_to (8-aligned
    token dim through the fused stack), parallel_grid (Mosaic "parallel"
    dimension semantics), batched_sdpa="phased" (three-wave SDPA emission)
    — must reproduce the unflagged fused-layer encode: all three are
    scheduling hints / pad-and-slice identities, not math changes.
    (seq-pad correctness hinges on valid_len masking the padded key
    columns out of every softmax.)  Tolerance is last-ulp only: the
    padded token dim changes the backend's matmul blocking, which
    reorders f32 accumulation."""
    px = _pixels(cfg, n=3, seed=17)
    base = _enc_cfg(cfg, mlp_kernel="fused", attn_kernel="fused_layer")
    ref = np.asarray(vit.encode(params["encoder"], px, base))
    for kw in (
        {"seq_pad_to": 8},
        {"parallel_grid": True},
        {"batched_sdpa": "phased"},
        {"seq_pad_to": 8, "parallel_grid": True, "batched_sdpa": "phased"},
    ):
        got = vit.encode(params["encoder"], px, dataclasses.replace(base, **kw))
        assert got.shape == ref.shape, kw
        np.testing.assert_allclose(
            np.asarray(got), ref, atol=1e-5, rtol=1e-5, err_msg=str(kw)
        )


def test_seq_pad_int8_greedy_tokens_match(cfg, params):
    """Greedy-token parity of the full int8 serving path with the seq-pad
    + phased flags enabled (the serving() defaults when they win on TPU)."""
    px = _pixels(cfg, n=4, seed=19)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(
            cfg,
            mlp_kernel="fused",
            attn_kernel="fused_layer",
            gelu_mode="sigmoid",
            seq_pad_to=8,
            batched_sdpa="phased",
        ),
        decoder=dataclasses.replace(cfg.decoder, cross_kv_int8=True),
    )
    qparams = {
        "encoder": quantize_encoder(params["encoder"], quantize_attn_proj=True),
        "decoder": params["decoder"],
    }
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_int8_serving_greedy_tokens_match(cfg, params):
    """End-to-end greedy decode: the quantized fused serving path (int8 MLP
    AND int8 attention projections, fused_layer kernel) must emit the same
    token ids as the f32 XLA path on the tiny model."""
    px = _pixels(cfg, n=4, seed=3)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(cfg, mlp_kernel="fused", attn_kernel="fused_layer"),
        decoder=dataclasses.replace(cfg.decoder, cross_kv_int8=True),
    )
    qparams = {
        "encoder": quantize_encoder(params["encoder"], quantize_attn_proj=True),
        "decoder": params["decoder"],
    }
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_fused_attn_layer_matches_xla(cfg, params):
    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    enc = params["encoder"]
    lp = jax.tree.map(lambda a: a[0], enc["layers"])
    x = jax.random.normal(
        jax.random.PRNGKey(5), (2, 5, cfg.encoder.hidden_size), jnp.float32
    )
    from manga_ocr_tpu.ops.common import layer_norm, mha

    h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.encoder.layer_norm_eps)
    ref = x + mha(h, h, lp["attn"], cfg.encoder.num_heads)
    got = fused_attn_layer(
        x,
        lp["attn"],
        lp["ln1"]["scale"],
        lp["ln1"]["bias"],
        cfg.encoder.num_heads,
        eps=cfg.encoder.layer_norm_eps,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_stacked_encode_matches_xla(cfg, params):
    """attn_kernel="stacked" (multi-layer resident-weight kernel) matches
    the XLA reference encoder, at every slab size incl. a non-dividing one."""
    px = _pixels(cfg)
    ref = vit.encode(params["encoder"], px, _enc_cfg(cfg))
    for lpc in (1, 2, 3):  # tiny cfg has 2 layers; 3 exercises the clamp
        got = vit.encode(
            params["encoder"], px,
            _enc_cfg(cfg, attn_kernel="stacked", stack_lpc=lpc),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3,
            err_msg=f"lpc={lpc}",
        )


def test_int8_stacked_greedy_tokens_match(cfg, params):
    """Greedy-token parity of the int8 stacked-kernel serving path vs the
    f32 XLA reference — same bar as the per-layer fused kernels."""
    px = _pixels(cfg, n=4, seed=7)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(
            cfg, attn_kernel="stacked", stack_lpc=2, gelu_mode="sigmoid"
        ),
        decoder=dataclasses.replace(cfg.decoder, cross_kv_int8=True),
    )
    qparams = {
        "encoder": quantize_encoder(params["encoder"], quantize_attn_proj=True),
        "decoder": params["decoder"],
    }
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_engine_tiny_shapes_on_tpu_fall_back_to_xla(cfg, params, monkeypatch):
    """On a real TPU backend, non-lane-aligned miniature configs must
    default to the XLA path (Mosaic cannot lower the fused kernels for
    them) — and an explicit serving_kernels=True must error, not crash at
    compile time."""
    import manga_ocr_tpu.engine.engine as eng_mod
    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    monkeypatch.setattr(eng_mod.jax, "default_backend", lambda: "tpu")
    eng = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8, dtype=jnp.float32
    )
    assert eng.cfg.encoder.attn_kernel == "xla"
    with pytest.raises(ValueError, match="lane-aligned"):
        TpuMangaOcrEngine(
            params, cfg, CharTokenizer.synthetic(), dtype=jnp.float32,
            serving_kernels=True,
        )


def test_engine_serving_kernels_default(cfg, params):
    """Engine defaults: fused+int8 single-chip (and, since round 3, also
    under data-parallel meshes — see test_engine_mesh.py)."""
    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    eng = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8, dtype=jnp.float32
    )
    assert eng.cfg.encoder.mlp_kernel == "fused"
    assert eng.cfg.encoder.attn_kernel == "fused_layer"
    assert "w_q" in eng.params["encoder"]["layers"]["attn"]["q"]
    assert "w_q" in eng.params["encoder"]["layers"]["mlp"]["fc1"]
    # scales stay f32 for dequantization accuracy
    assert eng.params["encoder"]["layers"]["mlp"]["fc1"]["scale"].dtype == jnp.float32
    rng = np.random.default_rng(0)
    crop = rng.integers(0, 256, size=(40, 60, 3)).astype(np.uint8)
    out = eng.ocr_page([crop])
    assert len(out) == 1 and isinstance(out[0], str)


def test_attn_fuse_qkv_encode_exact(cfg, params):
    """attn_fuse_qkv concatenates the q/k/v projections into one [D, 3D]
    matmul — bit-exact (each output column's contraction is unchanged),
    both int8 and bf16."""
    px = _pixels(cfg, n=4, seed=29)
    base = _enc_cfg(
        cfg, mlp_kernel="fused", attn_kernel="fused_layer", gelu_mode="sigmoid"
    )
    fused_cfg = dataclasses.replace(base, attn_fuse_qkv=True)
    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    ref = np.asarray(vit.encode(qenc, px, base))
    got = np.asarray(vit.encode(qenc, px, fused_cfg))
    np.testing.assert_array_equal(got, ref)
    bf = dataclasses.replace(base, gelu_mode="erf")
    ref_bf = np.asarray(vit.encode(params["encoder"], px, bf))
    got_bf = np.asarray(
        vit.encode(
            params["encoder"], px, dataclasses.replace(bf, attn_fuse_qkv=True)
        )
    )
    np.testing.assert_array_equal(got_bf, ref_bf)


def test_mlp_subtiles_encode_exact(cfg, params):
    """mlp_subtiles splits the int8 MLP tile into independent row-chunk
    chains (scheduling only — every op is row-local, so the math is
    bit-identical to the single-chain kernel)."""
    px = _pixels(cfg, n=4, seed=23)
    base = _enc_cfg(
        cfg, mlp_kernel="fused", attn_kernel="fused_layer", gelu_mode="sigmoid"
    )
    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    ref = np.asarray(vit.encode(qenc, px, base))
    for st in (2, 4):
        got = vit.encode(qenc, px, dataclasses.replace(base, mlp_subtiles=st))
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=f"subtiles={st}")


def test_sdpa_int8_encode_close(cfg, params):
    """attn_sdpa_int8 (QK^T/PV on the int8 MXU path) stays within the int8
    noise bound of the f32 XLA encode on the tiny model."""
    px = _pixels(cfg, n=3, seed=23)
    ref = vit.encode(params["encoder"], px, cfg.encoder)
    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    ecfg = _enc_cfg(
        cfg, mlp_kernel="fused", attn_kernel="fused_layer", attn_sdpa_int8=True
    )
    got = vit.encode(qenc, px, ecfg)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.12, err.max()  # int8 weights + int8 SDPA noise


def test_sdpa_headpack_encode_close(cfg, params):
    """attn_sdpa_headpack (two heads per full-depth K contraction via
    block-diagonal K/V) is numerically equivalent to the per-head loop —
    the zero blocks are additive identity, so only accumulation order can
    differ."""
    px = _pixels(cfg, n=3, seed=31)
    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    base = _enc_cfg(cfg, mlp_kernel="fused", attn_kernel="fused_layer")
    ref = vit.encode(qenc, px, base)
    got = vit.encode(
        qenc, px, dataclasses.replace(base, attn_sdpa_headpack=True)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-4, rtol=1e-4,
    )


def test_sdpa_headpack_exclusive_flags(cfg, params):
    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    lp = jax.tree.map(lambda x: x[0], qenc["layers"])
    x = jnp.zeros((2, 5, cfg.encoder.hidden_size), jnp.float32)
    with pytest.raises(ValueError, match="exclusive"):
        fused_attn_layer(
            x, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
            cfg.encoder.num_heads, sdpa_headpack=True, sdpa_int8=True,
        )


def test_sdpa_int8_greedy_tokens_match(cfg, params):
    """Greedy-token parity of the int8 serving path with attn_sdpa_int8 on."""
    px = _pixels(cfg, n=4, seed=29)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(
            cfg,
            mlp_kernel="fused",
            attn_kernel="fused_layer",
            gelu_mode="sigmoid",
            attn_sdpa_int8=True,
        ),
        decoder=dataclasses.replace(cfg.decoder, cross_kv_int8=True),
    )
    qparams = {
        "encoder": quantize_encoder(params["encoder"], quantize_attn_proj=True),
        "decoder": params["decoder"],
    }
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_sdpa_int8_seq_pad_greedy_tokens_match(cfg, params):
    """attn_sdpa_int8 combined with seq_pad_to: the v quantization scales
    must run over VALID rows only (seq-pad garbage rows would coarsen
    every real value's int8 step)."""
    px = _pixels(cfg, n=4, seed=31)
    ref = mdl.ocr_forward(params, px, cfg, max_length=12)
    scfg = dataclasses.replace(
        cfg,
        encoder=_enc_cfg(
            cfg,
            mlp_kernel="fused",
            attn_kernel="fused_layer",
            gelu_mode="sigmoid",
            attn_sdpa_int8=True,
            seq_pad_to=8,
        ),
        decoder=dataclasses.replace(cfg.decoder, cross_kv_int8=True),
    )
    qparams = {
        "encoder": quantize_encoder(params["encoder"], quantize_attn_proj=True),
        "decoder": params["decoder"],
    }
    got = mdl.ocr_forward(qparams, px, scfg, max_length=12)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_sdpa_int8_rejects_batched_sdpa(cfg, params):
    """sdpa_int8 under batched_sdpa must raise, not silently run bf16."""
    from manga_ocr_tpu.ops.flash_attention import fused_attn_layer

    qenc = quantize_encoder(params["encoder"], quantize_attn_proj=True)
    lp = jax.tree.map(lambda a: a[0], qenc["layers"])
    d = cfg.encoder.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, d), jnp.float32)
    with pytest.raises(ValueError, match="batched_sdpa"):
        fused_attn_layer(
            x, lp["attn"], lp["ln1"]["scale"], lp["ln1"]["bias"],
            cfg.encoder.num_heads, batched_sdpa="phased", sdpa_int8=True,
        )
