"""Engine-layer contract tests (batched page OCR + reference-compatible
single-crop entry)."""

import numpy as np
import pytest

import jax

from manga_ocr_tpu.engine import TpuMangaOcrEngine
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.tokenizer import CharTokenizer
from manga_ocr_tpu.parallel import batching


@pytest.fixture(scope="module")
def engine():
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    tok = CharTokenizer.synthetic()
    # tiny vocab (100) < synthetic vocab; decode clamps out-of-range ids
    import jax.numpy as jnp

    return TpuMangaOcrEngine(params, cfg, tok, max_length=8, dtype=jnp.float32)


def _crop(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 255, size=(h, w, 3)).astype(np.uint8)


def test_bucketing_roundtrip():
    crops = [_crop(40, 60), _crop(300, 90), _crop(100, 400), _crop(40, 60, 1)]
    batches = batching.bucket_crops(crops)
    # scatter identity check
    results = [[f"b{bi}_r{ri}" for ri in range(b.valid)] for bi, b in enumerate(batches)]
    flat = batching.scatter_results(batches, results)
    assert len(flat) == 4 and all(r is not None for r in flat)
    # batch rows padded to schedule
    for b in batches:
        assert b.crops.shape[0] in batching.BATCH_SCHEDULE
        assert b.crops.shape[1:3] == b.bucket_hw


def test_ocr_page_returns_text_per_crop(engine):
    crops = [_crop(40, 60), _crop(64, 48, 1), _crop(30, 30, 2)]
    texts = engine.ocr_page(crops)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)


def test_ocr_page_consistent_with_single(engine):
    """A crop OCR'd alone and inside a page batch must give the same text
    (padding rows must not affect real rows)."""
    crop = _crop(48, 48, 3)
    alone = engine.ocr_page([crop])[0]
    batched = engine.ocr_page([crop, _crop(48, 48, 4), _crop(48, 48, 5)])[0]
    assert alone == batched


def test_perform_ocr_contract(engine):
    out = engine.perform_ocr(_crop(40, 60), {"orientation": "Vertical"})
    assert isinstance(out, str) and not out.startswith("[ERROR")
    # sentinel error contract
    assert engine.perform_ocr(np.zeros((0, 0, 3), np.uint8)).startswith("[ERROR")
    assert engine.perform_ocr(None).startswith("[ERROR")
    # gray input is upgraded to 3 channels
    out = engine.perform_ocr(np.full((32, 32), 128, np.uint8))
    assert isinstance(out, str) and not out.startswith("[ERROR")


def test_dual_pass(engine):
    pairs = engine.ocr_page_dual([_crop(40, 60), _crop(64, 48, 1)])
    assert len(pairs) == 2
    assert all(len(p) == 2 for p in pairs)


def test_wide_crop_rotates_for_vertical(engine):
    """Vertical orientation + wide crop should not error (rot90 path)."""
    out = engine.ocr_page([_crop(40, 120)])
    assert len(out) == 1


def test_dual_pass_routes_second_engine(engine):
    """Enhanced dual-pass fidelity (VERDICT #5): when a decorrelated second
    engine is provided (the reference uses Tesseract(jpn) on the
    preprocessed crop, workers.py:398-402), the binarized crops go to IT and
    its settings force Japanese Tesseract."""
    calls = []

    class FakeTess:
        def perform_ocr(self, img, settings=None):
            calls.append((img, settings))
            return "tess"

    crops = [_crop(40, 60), _crop(64, 48, 1)]
    pairs = engine.ocr_page_dual(crops, second_engine=FakeTess())
    assert len(pairs) == 2
    assert [p[1] for p in pairs] == ["tess", "tess"]
    assert len(calls) == 2
    for img, settings in calls:
        assert settings["ocr_engine"] == "Tesseract"
        assert settings["tesseract_lang"] == "jpn"
        # preprocessed crop: binarized (0/255) at the ORIGINAL crop size
        assert set(np.unique(img)).issubset({0, 255})
    assert calls[0][0].shape == crops[0].shape
    assert calls[1][0].shape == crops[1].shape


def test_micro_batcher_idle_latency():
    """VERDICT #10: a lone request on an idle engine must not pay the fixed
    coalescing window."""
    import time

    from manga_ocr_tpu.runtime.pipeline import MicroBatcher

    mb = MicroBatcher(lambda crops: ["x"] * len(crops), window_ms=200.0)
    try:
        mb.ocr(np.zeros((4, 4, 3), np.uint8))  # warm the worker loop
        t0 = time.perf_counter()
        out = mb.ocr(np.zeros((4, 4, 3), np.uint8))
        dt = time.perf_counter() - t0
        assert out == "x"
        assert dt < 0.1, f"idle request waited {dt*1e3:.0f} ms (window 200)"
    finally:
        mb.close()


def test_compile_coverage_zero_unplanned_after_full_warmup():
    """VERDICT #6: after a full warmup, a representative page mix triggers
    zero unplanned compiles; without warmup, the dispatch shapes are logged."""
    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu.engine.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.utils.metrics import COMPILE_EVENTS

    cfg = MangaOCRConfig.tiny()
    eng = TpuMangaOcrEngine(
        mdl.init_params(cfg, jax.random.PRNGKey(0)),
        cfg,
        CharTokenizer.synthetic(),
        max_length=8,
        dtype=jnp.float32,
        serving_kernels=False,
    )
    buckets = ((128, 128), (256, 128))
    rng = np.random.default_rng(0)
    mix = [
        rng.integers(0, 256, size=s).astype(np.uint8)
        for s in ((60, 100, 3), (40, 40, 3), (200, 120, 3), (111, 99, 3))
    ]

    COMPILE_EVENTS.reset()
    eng.ocr_page(mix)  # cold: unplanned shapes get logged
    assert COMPILE_EVENTS.get("unplanned_compile") == 2  # two buckets hit

    eng2 = TpuMangaOcrEngine(
        mdl.init_params(cfg, jax.random.PRNGKey(0)),
        cfg,
        CharTokenizer.synthetic(),
        max_length=8,
        dtype=jnp.float32,
        serving_kernels=False,
    )
    assert len(eng2.warm_set(buckets, (8, 16))) == 4
    eng2.warmup(bucket_hws=buckets, batch_sizes=(8, 16), full=True)
    COMPILE_EVENTS.reset()
    eng2.ocr_page(mix)
    assert COMPILE_EVENTS.get("unplanned_compile") == 0


def test_gray_wire_host_matches_device_conversion():
    """batching.gray_u8_np must be BIT-identical to the in-graph
    ops.image.bgr_to_gray_u8 — the gray wire format's exactness contract."""
    import jax.numpy as jnp

    from manga_ocr_tpu.ops import image as im

    rgb = np.random.default_rng(7).integers(0, 256, size=(5, 33, 41, 3)).astype(np.uint8)
    host = batching.gray_u8_np(rgb)
    device = np.asarray(im.bgr_to_gray_u8(jnp.asarray(rgb)))
    np.testing.assert_array_equal(host, device)


def test_gray_wire_preprocess_identical():
    """model_preprocess on a gray-wire batch == on the RGB batch (exact)."""
    import jax.numpy as jnp

    from manga_ocr_tpu.ops import preprocess as pp

    crops = [_crop(60, 100, 11), _crop(100, 60, 12)]
    [rgb_b] = batching.bucket_crops(crops)
    [gray_b] = batching.bucket_crops(crops, gray=True)
    assert gray_b.crops.ndim == 3
    out_rgb = np.asarray(
        pp.model_preprocess(jnp.asarray(rgb_b.crops), sizes=jnp.asarray(rgb_b.sizes))
    )
    out_gray = np.asarray(
        pp.model_preprocess(jnp.asarray(gray_b.crops), sizes=jnp.asarray(gray_b.sizes))
    )
    np.testing.assert_array_equal(out_rgb, out_gray)


def test_ocr_pages_matches_per_page_calls(engine):
    """The streaming loop must return exactly what per-page ocr_page does,
    in page order, for mixed page sizes (incl. an empty page)."""
    pages = [
        [_crop(40, 60, 20), _crop(64, 48, 21)],
        [],
        [_crop(30, 30, 22), _crop(48, 48, 23), _crop(40, 60, 24)],
        [_crop(40, 60, 25)],
    ]
    streamed = engine.ocr_pages(pages, lookahead=2)
    sequential = [engine.ocr_page(p) for p in pages]
    assert streamed == sequential


def test_packed_wire_unpack_identical():
    """Device-side unpack of the packed wire == the padded gray batch,
    byte-for-byte (edge replication == index clamping)."""
    import jax.numpy as jnp

    from manga_ocr_tpu.ops import preprocess as pp

    crops = [_crop(60, 100, 31), _crop(100, 60, 32), _crop(90, 90, 33)]
    packed = batching.prep_page_packed(crops, orientation=1)
    padded = batching.prep_page_gray(crops, orientation=1)
    assert len(packed) == len(padded)
    for pb, gb in zip(packed, padded):
        if not isinstance(pb, batching.PackedBatch):
            pytest.skip("native library unavailable")
        # the packed wire ships fewer bytes than the padded batch
        assert pb.flat.size < gb.crops.size
        meta = np.concatenate([pb.sizes, pb.offsets[:, None]], axis=1)
        got, got_sizes = pp.unpack_packed_page(
            jnp.asarray(pb.flat),
            jnp.asarray(meta),
            bh=pb.bucket_hw[0],
            bw=pb.bucket_hw[1],
        )
        np.testing.assert_array_equal(np.asarray(got), gb.crops)
        np.testing.assert_array_equal(np.asarray(got_sizes), gb.sizes)
        np.testing.assert_array_equal(pb.sizes, gb.sizes)
        assert pb.indices == gb.indices and pb.valid == gb.valid


def test_packed_wire_engine_matches_gray():
    """ocr_page over the packed wire returns identical texts."""
    import jax.numpy as jnp

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    tok = CharTokenizer.synthetic()
    g = TpuMangaOcrEngine(params, cfg, tok, max_length=8, dtype=jnp.float32)
    p = TpuMangaOcrEngine(
        params, cfg, tok, max_length=8, dtype=jnp.float32, wire="packed"
    )
    crops = [_crop(40, 60, 41), _crop(64, 48, 42), _crop(30, 30, 43),
             _crop(1400, 700, 44)]
    assert p.ocr_page(crops) == g.ocr_page(crops)


def test_multibucket_coalesced_readback(engine):
    """A page spanning multiple shape buckets fuses every bucket's token
    matrix into ONE device array (one readback RPC) and returns exactly the
    texts the per-bucket readback path returns."""
    crops = [_crop(40, 60, 51), _crop(300, 90, 52), _crop(100, 400, 53),
             _crop(30, 30, 54)]
    outs, fused = engine._dispatch_page(crops, 1, None)
    assert len(outs) > 1, "workload must span multiple buckets"
    assert fused is not None
    assert fused.shape[0] == sum(o.shape[0] for _, o in outs)
    coalesced = engine._collect_page((outs, fused), None)

    import jax.numpy as jnp

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))  # == fixture init
    plain = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8,
        dtype=jnp.float32, coalesce=False,
    )
    p_outs, p_fused = plain._dispatch_page(crops, 1, None)
    assert p_fused is None
    assert coalesced == plain._collect_page((p_outs, p_fused), None)
    # and through the public entry
    assert coalesced == engine.ocr_page(crops)


def test_single_bucket_page_skips_coalesce(engine):
    """Single-bucket pages (the common case) never pay the concat."""
    outs, fused = engine._dispatch_page([_crop(40, 60, 61), _crop(50, 50, 62)], 1, None)
    assert len(outs) == 1 and fused is None


def test_fused_wire_unpack_bitcast_roundtrip():
    """The fused page wire's int32-extents-as-uint8 serialization must
    bitcast back exactly on device (little-endian minor-dim packing)."""
    import jax.numpy as jnp
    import jax

    sizes = np.array([[40, 60], [300, 90], [65535, 1]], np.int32)
    wire = jnp.asarray(np.ascontiguousarray(sizes).view(np.uint8).reshape(-1))
    back = jax.lax.bitcast_convert_type(wire.reshape(3, 2, 4), jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), sizes)


def test_fused_wire_matches_per_bucket_transfers(engine):
    """Multi-bucket pages over the single fused h2d buffer return exactly
    the texts the per-bucket-transfer path returns, for every prep surface
    (RGB, grayscale 2D, [h,w,1]) and orientations."""
    import jax.numpy as jnp

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))  # == fixture init
    plain = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8,
        dtype=jnp.float32, coalesce=False,
    )
    rng = np.random.default_rng(5)
    crops = [
        _crop(40, 60, 81),
        _crop(300, 90, 82),
        rng.integers(0, 256, size=(50, 45)).astype(np.uint8),       # 2D gray
        rng.integers(0, 256, size=(45, 50, 1)).astype(np.uint8),    # [h,w,1]
        _crop(100, 400, 83),
    ]
    for orient in (0, 1, 2):
        assert engine.ocr_page(crops, orientation=orient) == plain.ocr_page(
            crops, orientation=orient
        )


def test_dual_pass_multibucket_coalesced(engine):
    """Dual-pass on a page spanning multiple shape buckets composes with
    traffic coalescing (the combined raw+preprocessed batch is itself
    multi-bucket) and matches the un-coalesced engine pair-for-pair."""
    import jax.numpy as jnp

    crops = [_crop(40, 60, 91), _crop(300, 90, 92), _crop(100, 400, 93)]
    pairs = engine.ocr_page_dual(crops)
    assert len(pairs) == 3 and all(len(p) == 2 for p in pairs)

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))  # == fixture init
    plain = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8,
        dtype=jnp.float32, coalesce=False,
    )
    assert pairs == plain.ocr_page_dual(crops)


def test_wire_unpack_cache_bounded(engine):
    """The per-split unpack-program cache must stay bounded for long-running
    servers (the split-signature space is combinatorial)."""
    for i in range(70):
        engine._wire_unpack_fn((((8 * (i + 1), 128), 4),))
    assert len(engine._unpack_fns) <= 64
    # reuse after the reset still works end-to-end
    crops = [_crop(40, 60, 95), _crop(300, 90, 96)]
    assert len(engine.ocr_page(crops)) == 2


def test_bucketing_accepts_grayscale_crops():
    """2D and [h,w,1] crops bucket like the page-prep paths accept them
    (regression: dual-pass crashed on grayscale scans)."""
    g2 = np.random.default_rng(3).integers(0, 255, size=(50, 60)).astype(np.uint8)
    g1 = g2[..., None]
    [b] = batching.bucket_crops([g2, g1, _crop(50, 60, 7)])
    assert b.crops.shape[3] == 3 and b.valid == 3
    assert np.array_equal(b.crops[0, :50, :60, 0], g2)
    assert np.array_equal(b.crops[0], b.crops[1])  # same content, both forms


def test_dual_pass_grayscale_crops(engine):
    pairs = engine.ocr_page_dual(
        [np.full((40, 50), 180, np.uint8), _crop(40, 50, 5)]
    )
    assert len(pairs) == 2
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in pairs)


def test_registry_lazy_factory_retries_after_transient_failure():
    from manga_ocr_tpu.engine.registry import EngineRegistry

    calls = {"n": 0}

    class _E:
        def perform_ocr(self, image, settings=None):
            return "ok"

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient (e.g. offline weight download)")
        return _E()

    reg = EngineRegistry()
    reg.register_lazy("Flaky", flaky)
    assert reg.get("Flaky") is None       # first attempt fails...
    assert reg.get("Flaky") is not None   # ...but is retried, not poisoned
    assert calls["n"] == 2
    assert reg.get("Flaky") is not None and calls["n"] == 2  # cached now


def test_registry_available_engines_uses_probe_without_constructing():
    from manga_ocr_tpu.engine.registry import EngineRegistry

    constructed = []

    def heavy():
        constructed.append(1)
        return object()

    reg = EngineRegistry()
    reg.register_lazy("Heavy", heavy, probe=lambda: True)
    reg.register_lazy("Absent", heavy, probe=lambda: False)
    assert reg.available_engines() == ["Heavy"]
    assert constructed == []  # listing must not construct (downloads!)


def test_engine_serving_cfg_matches_config_serving():
    """The engine's serving flags must come from the ONE shared transform
    (regression: an engine-local copy drifted and lost seq_pad_to /
    head_phased, running production engines slower than the benchmark)."""
    from manga_ocr_tpu.models.config import with_serving_kernels

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    eng = TpuMangaOcrEngine(
        params, cfg, CharTokenizer.synthetic(), max_length=8
    )
    assert eng.cfg == with_serving_kernels(cfg, quantized=True)
    assert eng.cfg.decoder.head_phased
    assert eng.cfg.encoder.seq_pad_to == (cfg.encoder.seq_len + 7) // 8 * 8
    # and the public serving() preset is that same transform over base()
    assert MangaOCRConfig.serving() == with_serving_kernels(
        MangaOCRConfig.base(), True
    )


def test_orientation_default_matches_reference():
    """Missing/unknown orientation applies NO rotation (reference defaults
    'Auto-Detect' and rotates only on exact matches — main_window.py:9782)."""
    from manga_ocr_tpu.engine.engine import _orientation_from_settings
    from manga_ocr_tpu.ops import preprocess as pp

    assert _orientation_from_settings(None) == pp.ORIENT_AUTO
    assert _orientation_from_settings({}) == pp.ORIENT_AUTO
    assert _orientation_from_settings({"orientation": "vertical"}) == pp.ORIENT_AUTO
    assert _orientation_from_settings({"orientation": "Vertical"}) == pp.ORIENT_VERTICAL
    assert _orientation_from_settings({"orientation": "Horizontal"}) == pp.ORIENT_HORIZONTAL


def test_dual_pass_merges_caller_settings(engine):
    """The second pass receives {**settings, Tesseract/jpn overrides} like
    the reference's run_enhanced_pipeline (workers.py:399-403)."""
    seen = []

    class _Second:
        def perform_ocr(self, img, settings=None):
            seen.append(dict(settings or {}))
            return "t"

    engine.ocr_page_dual(
        [_crop(40, 50, 9)], second_engine=_Second(),
        settings={"orientation": "Vertical", "custom_knob": 7},
    )
    assert seen and seen[0]["ocr_engine"] == "Tesseract"
    assert seen[0]["ocr_lang"] == "jpn" and seen[0]["tesseract_lang"] == "jpn"
    assert seen[0]["orientation"] == "Vertical" and seen[0]["custom_knob"] == 7
