"""The TPU OCR engine: batched page-level OCR behind the reference contracts.

The reference's engine layer is a per-crop dispatch on ``settings['ocr_engine']``
returning raw text or ``"[ERROR: ...]"`` sentinel strings
(``perform_ocr``, ``/root/reference/src/ui/main_window.py:9774-9931``), with
Manga-OCR fed raw orientation-rotated crops (``workers.py:318-327``).  This
module keeps those contracts exactly and adds the batched entry the TPU
design is built around:

- ``ocr_page(crops) -> [str]`` — every crop of a page preprocessed, encoded
  and greedily decoded in ONE TPU dispatch per shape bucket.  uint8 crops go
  to the device; only int32 token ids come back.
- ``perform_ocr(cv_bgr_image, settings) -> str`` — the reference-compatible
  single-crop call (a batch of one, or coalesced by the microbatcher).

The whole per-bucket pipeline (normalize → resize → encode → decode) is a
single jitted function, compiled once per (bucket, batch) shape.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.tokenizer import CharTokenizer
from manga_ocr_tpu.ops import preprocess as pp
from manga_ocr_tpu.parallel import batching


def _stage_fn(timer):
    """StageTimer adapter: ``None`` timer -> no-op context factory."""
    if timer is not None:
        return timer.stage
    from contextlib import nullcontext

    return lambda _name: nullcontext()


def _err(msg: str) -> str:
    return f"[ERROR: {msg}]"


# Device-side concat of per-bucket packed token matrices ([n_i, 1+L] int32,
# same width for every bucket) so a multi-bucket page costs ONE host
# readback instead of one per bucket.  Each readback blocks on a full
# device→host round-trip on remote/tunneled runtimes (~25 ms); together
# with the fused wire below this measured +2-4% streamed on two-bucket
# pages through the tunnel (docs/PERF.md round-3 coalesce A/B) — the
# concat itself is a trivial int32 copy.  jax.jit keys on the argument
# shapes, so each distinct per-page bucket split compiles its own
# (seconds-cheap) program — bounded like ``_unpack_fns``: a long-running
# server must not accumulate one resident executable per split signature
# forever (dropping the wrapper releases its compiled cache).
_concat_fns: dict = {}
_concat_lock = threading.Lock()


def _concat_rows(*arrs):
    key = tuple(a.shape for a in arrs)
    with _concat_lock:
        fn = _concat_fns.get(key)
        if fn is None:
            if len(_concat_fns) >= 64:
                _concat_fns.clear()
            fn = _concat_fns.setdefault(
                key, jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))
            )
    return fn(*arrs)


class TpuMangaOcrEngine:
    """Batched manga-ocr engine on TPU.

    Parameters
    ----------
    params / cfg : converted checkpoint (``models.convert.load_hf_checkpoint``)
        or random-init for tests.
    tokenizer : vocabulary for decoding.
    max_length : decode budget (reference model: 300).
    dtype : compute dtype (bf16 on TPU).
    """

    def __init__(
        self,
        params: dict,
        cfg: MangaOCRConfig,
        tokenizer: CharTokenizer,
        max_length: int | None = None,
        dtype=jnp.bfloat16,
        mesh=None,
        serving_kernels: bool | None = None,
        quantize_int8: bool | None = None,
        wire: str = "gray",
        coalesce: bool = True,
        aot: bool = False,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — every crop batch is
        sharded over the data axis (ICI batch parallelism, SURVEY §5.8);
        None = single chip.  With the fused serving kernels the mesh must be
        data-parallel-only (params replicated, dispatch via ``shard_map``);
        with ``serving_kernels=False`` a model axis > 1 additionally applies
        tensor-parallel param shardings through the XLA path.

        ``serving_kernels``: use the fused Pallas encoder kernels (packed
        attention + fused MLP; docs/PERF.md).  Defaults on — single chip AND
        data-parallel meshes (the serving configuration is what multi-chip
        deployments run).  Explicit capability check: the fused kernels hold
        whole [D, D]/[D, 4D] weight blocks VMEM-resident and are not written
        for tensor-parallel weight shardings, so ``serving_kernels=True``
        with a model axis > 1 raises instead of silently downgrading.
        ``quantize_int8``: int8-quantize the encoder (W8A8, per-token/
        per-channel — greedy-token parity covered by
        tests/test_fused_encoder.py); defaults to follow
        ``serving_kernels``.

        ``wire``: host→device crop format.  "gray" (default): padded
        [B, bh, bw] single-channel batches.  "packed": crop rows shipped
        height-tight (width padded host-side) — height padding never
        crosses the link — and the padded batch is reconstructed on-device
        with a clamped row gather (byte-identical;
        ``ops.preprocess.unpack_packed_page``).  ~10-15% fewer wire bytes
        on typical pages; single-device only (offsets are global, a
        batch-sharded mesh would need per-shard buffers).

        ``coalesce``: collapse a multi-bucket page's host↔device traffic to
        single-bucket-page RPC counts — each extra transfer/readback is a
        full round-trip on remote runtimes (docs/PERF.md coalesce A/B:
        two RPCs saved per extra bucket, +2-4% streamed on two-bucket
        pages through the tunnel, strictly fewer RPCs on any link):

        - wire side (single device, gray wire): every bucket's crop bytes
          and int32 extents ship as ONE concatenated uint8 buffer — one
          h2d RPC per page instead of two per bucket — and a per-split
          jitted unpack (static slices + a [n, 2, 4]→int32 bitcast, no
          gathers, seconds to compile) restores the per-bucket arrays
          on device.
        - readback side (any config): the per-bucket token matrices are
          concatenated ON DEVICE and read back once.

        Single-bucket pages (the common case) take neither path."""
        import dataclasses as _dc

        if mesh is not None:
            from manga_ocr_tpu.parallel import mesh as meshlib

            n_model = mesh.shape.get(meshlib.MODEL_AXIS, 1)
        else:
            n_model = 1
        # Mosaic lowers the fused kernels for lane-aligned production shapes;
        # miniature configs (e.g. hidden 64 / 5-token sequences) hit
        # unsupported shape casts on real TPUs.  CPU interpret mode (tests,
        # virtual meshes) lowers everything.
        shapes_ok = (
            cfg.encoder.hidden_size % 128 == 0
            and cfg.encoder.intermediate_size % 128 == 0
        ) or jax.default_backend() == "cpu"
        if serving_kernels is None:
            serving_kernels = n_model == 1 and shapes_ok
        if serving_kernels and n_model > 1:
            raise ValueError(
                "fused serving kernels support data-parallel meshes only "
                f"(model axis size 1, got {n_model}); pass "
                "serving_kernels=False to serve tensor-parallel through the "
                "XLA path"
            )
        if serving_kernels and not shapes_ok:
            raise ValueError(
                "fused serving kernels need lane-aligned dims on TPU "
                f"(hidden {cfg.encoder.hidden_size} / intermediate "
                f"{cfg.encoder.intermediate_size} must be multiples of 128); "
                "pass serving_kernels=False for this config"
            )
        if quantize_int8 is None:
            quantize_int8 = serving_kernels
        if serving_kernels:
            # The serving kernel flags come from the ONE shared transform
            # (config.with_serving_kernels — also behind
            # MangaOCRConfig.serving()): an engine-local copy previously
            # drifted and silently lost seq_pad_to/head_phased, costing
            # production engines the measured encoder/head optimizations.
            from manga_ocr_tpu.models.config import with_serving_kernels

            cfg = with_serving_kernels(cfg, quantized=bool(quantize_int8))
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length or cfg.max_length
        self.dtype = dtype
        self.mesh = mesh
        if serving_kernels and quantize_int8:
            from manga_ocr_tpu.models.quantize import quantize_encoder

            # quantize from the ORIGINAL (pre-cast) weights; int8 values and
            # f32 scales are preserved, every other float leaf goes to dtype.
            # Decoder weights stay unquantized: the serving decode path is
            # the whole-loop kernel (step_kernel="fused_loop" above), which
            # runs bf16 weights AND bf16 cross-KV slabs (it ignores
            # cross_kv_int8 — that flag affects only the XLA-step fallback
            # paths); only the flag-gated fused-STEP kernels
            # (ops/decode_layer.py, off here — measured slower, docs/PERF.md)
            # take models.quantize.quantize_decoder output.  Only the
            # decoder subtree is cast here — casting the full tree first
            # would bf16 all ~86M encoder params and then discard them.
            self.params = {
                "encoder": _cast_quantized(
                    quantize_encoder(params["encoder"], quantize_attn_proj=True),
                    dtype,
                ),
                "decoder": mdl.cast_params(params["decoder"], dtype),
            }
        else:
            self.params = mdl.cast_params(params, dtype)
        self._serving_kernels = serving_kernels
        if mesh is not None:
            from manga_ocr_tpu.parallel import mesh as meshlib

            if serving_kernels:
                # data-parallel serving: params replicated on every chip,
                # batch sharded; the Pallas kernels run per-device under
                # shard_map (no collectives anywhere in the pipeline)
                repl = meshlib.replicated(mesh)
                self.params = jax.tree.map(
                    lambda a: jax.device_put(a, repl), self.params
                )
            else:
                self.params = meshlib.shard_params(self.params, mesh)
            self._batch_sharding = meshlib.batch_sharding(mesh)
            self._batch_multiple = mesh.shape[meshlib.DATA_AXIS]
        else:
            self._batch_sharding = None
            self._batch_multiple = 1
        if wire not in ("gray", "packed"):
            raise ValueError(f"wire must be 'gray' or 'packed', got {wire!r}")
        if wire == "packed" and mesh is not None:
            raise ValueError(
                "wire='packed' is single-device only (global offsets); "
                "use the default gray wire under a mesh"
            )
        self._wire = wire
        self._coalesce = coalesce  # readback half (device-side concat)
        self._fuse_wire = coalesce  # wire half (single h2d buffer)
        self._fns: dict = {}
        self._unpack_fns: dict = {}  # split signature -> jitted wire unpack
        self._lock = threading.Lock()
        self._warmed: set = set()  # (bucket_hw, padded_batch) pairs compiled
        # AOT executable store (utils/aot_store.py): serialized compiled
        # executables reused across processes, sidestepping the
        # time-unstable XLA cache keys — a production server cold-starts
        # without the multi-minute Pallas compiles.  Single-device only
        # (shard_map executables are not serialized).
        self._aot = bool(aot) and mesh is None
        self._aot_execs: dict = {}

    # -- jitted pipeline ----------------------------------------------------

    def _bucket_fn(self, bucket_hw: tuple[int, int]):
        """One fused program: gray-wire uint8 crops [B, bh, bw] (+ valid
        extents) -> token ids.

        Orientation rotation happens host-side per crop (it depends on each
        crop's real aspect ratio — ``batching.orient_crop``), so one compiled
        program per bucket covers every orientation setting."""
        key = bucket_hw
        fn = self._fns.get(key)
        if fn is None:
            cfg, max_len, dtype = self.cfg, self.max_length, self.dtype

            def run_core(params, crops_u8, sizes):
                pixels = pp.model_preprocess(
                    crops_u8,
                    sizes=sizes,
                    image_size=cfg.encoder.image_size,
                ).astype(dtype)
                out = mdl.ocr_forward(params, pixels, cfg, max_length=max_len)
                # pack lengths as column 0 of the token matrix: ONE device
                # array out means ONE host readback RPC per page instead of
                # two — each readback costs a full round-trip on a
                # tunneled/remote runtime (docs/PERF.md)
                return jnp.concatenate(
                    [out.lengths[:, None], out.tokens], axis=1
                )

            if self.mesh is not None and self._serving_kernels:
                # Pallas custom calls have no SPMD partitioning rules, so a
                # plain jit under the mesh would replicate the kernels on
                # every device.  shard_map runs the whole per-bucket program
                # per-device on its local batch shard (replicated params,
                # batch-dim in/out specs) — the data-parallel serving plan
                # of SURVEY §5.8, collectives-free.
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                from manga_ocr_tpu.parallel import mesh as meshlib

                kw = dict(
                    mesh=self.mesh,
                    in_specs=(P(), P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS)),
                    out_specs=P(meshlib.DATA_AXIS),
                )
                try:  # jax>=0.8 names the replication check check_vma
                    sharded = shard_map(run_core, check_vma=False, **kw)
                except TypeError:
                    sharded = shard_map(run_core, check_rep=False, **kw)
                run = jax.jit(sharded)
            else:
                run = jax.jit(run_core)

            with self._lock:
                fn = self._fns.setdefault(key, run)
        return fn

    def _resolve_fn(self, bucket_hw, args):
        """The executable for one dispatch: the jitted per-bucket program,
        or (``aot=True``) a compiled executable from the cross-process
        store keyed by the device-input shapes."""
        fn = self._bucket_fn(bucket_hw)
        if not self._aot:
            return fn
        key = (bucket_hw, tuple(a.shape for a in args))
        exe = self._aot_execs.get(key)
        if exe is None:
            import sys

            from manga_ocr_tpu.utils import aot_store

            name = (
                f"engine-b{bucket_hw[0]}x{bucket_hw[1]}-n{args[0].shape[0]}"
                f"-l{self.max_length}"
            )
            exe = aot_store.load_or_compile(
                fn, (self.params, *args), name,
                note=lambda m: print(f"# {m}", file=sys.stderr),
            )
            with self._lock:
                self._aot_execs[key] = exe
        return exe

    def _wire_unpack_fn(self, split_key):
        """Jitted unpack of the fused page wire: one flat uint8 buffer →
        per-bucket ([n, bh, bw] uint8 crops, [n, 2] int32 extents).

        ``split_key``: tuple of ((bh, bw), n) per bucket — the program is
        static slices + reshapes + one [n, 2, 4] uint8 → int32 bitcast per
        bucket (XLA bitcast packs minor-dim bytes little-endian, matching
        the host's ``.view(np.uint8)`` serialization — parity covered by
        tests), so each split signature compiles in seconds."""
        fn = self._unpack_fns.get(split_key)
        if fn is None:

            def unpack(wire):
                outs, off = [], 0
                for (bh, bw), n in split_key:
                    crops = wire[off : off + n * bh * bw].reshape(n, bh, bw)
                    off += n * bh * bw
                    sizes = jax.lax.bitcast_convert_type(
                        wire[off : off + n * 8].reshape(n, 2, 4), jnp.int32
                    )
                    off += n * 8
                    outs.append((crops, sizes))
                return tuple(outs)

            with self._lock:
                # bound resident executables for long-running servers: the
                # split signature space is combinatorial over (bucket,
                # batch) pairs, and each entry pins a compiled program.
                # Recompiles are seconds-cheap, so on overflow just reset.
                if len(self._unpack_fns) >= 64:
                    self._unpack_fns.clear()
                fn = self._unpack_fns.setdefault(split_key, jax.jit(unpack))
        return fn

    def _dispatch_fused_wire(self, batches, timer):
        """Multi-bucket page over ONE h2d transfer (the wire half of
        ``coalesce``): concatenated crop bytes + int32 extents per bucket,
        unpacked device-side by the per-split jitted program."""
        stage = _stage_fn(timer)
        split_key = tuple((b.bucket_hw, b.crops.shape[0]) for b in batches)
        with stage("host_prep"):
            # the page-sized host memcpy is prep, not wire: keep the "h2d"
            # stage pure transfer so --no-coalesce A/B splits compare
            # like-for-like
            parts = []
            for b in batches:
                parts.append(b.crops.reshape(-1))
                parts.append(
                    np.ascontiguousarray(b.sizes, np.int32)
                    .view(np.uint8)
                    .reshape(-1)
                )
            wire = np.concatenate(parts)
        with stage("h2d"):
            dwire = jnp.asarray(wire)
            if timer is not None:
                jax.block_until_ready(dwire)
        outs = []
        with stage("dispatch"):
            unpacked = self._wire_unpack_fn(split_key)(dwire)
            for b, (device_arr, device_sizes) in zip(batches, unpacked):
                fn = self._resolve_fn(b.bucket_hw, (device_arr, device_sizes))
                self._note_dispatch_shape(b.bucket_hw, b.crops.shape[0])
                outs.append((b, fn(self.params, device_arr, device_sizes)))
        return outs

    # -- batched entry points ------------------------------------------------

    def ocr_page(
        self,
        crops: Sequence[np.ndarray],
        orientation: int = pp.ORIENT_VERTICAL,
        timer=None,
    ) -> list[str]:
        """OCR every crop of a page: bucket, pad, dispatch once per bucket.

        ``orientation`` follows the reference's manga-ocr rule (default
        Vertical for Japanese: rotate 90° CW when wider than tall), applied
        host-side per crop on the REAL crop dims before bucketing.

        ``timer``: optional ``utils.metrics.StageTimer`` — records the
        host_prep / h2d / dispatch / detok split (bench + observability;
        through the axon tunnel h2d dominates and is a tunnel artifact, not
        a pipeline cost).

        Crops cross the host→device link as single-channel uint8 (the gray
        wire format): the manga-ocr model grayscales every crop anyway, the
        host conversion is bit-identical to the in-graph one
        (``batching.gray_u8_np``), and one channel is 3× fewer bytes on the
        pipeline's bottleneck link."""
        outs = self._dispatch_page(crops, orientation, timer)
        return self._collect_page(outs, timer)

    def ocr_pages(
        self,
        pages: Sequence[Sequence[np.ndarray]],
        orientation: int = pp.ORIENT_VERTICAL,
        lookahead: int = 2,
    ) -> list[list[str]]:
        """Streaming multi-page OCR: dispatch up to ``lookahead`` pages
        before collecting the first, so page N+1's host prep and host→device
        transfer overlap page N's device compute (JAX dispatch is async; the
        host only blocks in the token readback).  This is the production
        serving loop — the TPU-native analog of the reference's worker pool
        draining a job queue (``main_window.py:4317-4327``), with the
        parallelism in the pipeline instead of in 15 Python threads.

        ``lookahead=2`` measured best on the tunnel runtime at the
        round-3-final serving config (steady-state A/B, 256-crop pages:
        sync 936 crops/s → lookahead 1: 976 → lookahead 2: **1200**;
        docs/PERF.md).  Two pages in flight cover the readback RTT that a
        single-page lookahead leaves exposed.

        Dispatch runs on ONE background thread (order-preserving) while this
        thread collects: page N+1's host prep and host→device transfer
        overlap page N's completion wait and detokenization — numpy and the
        JAX runtime release the GIL during copies/transfers, so the overlap
        is real.  A single-threaded fallback (``lookahead=0``) keeps
        everything on the calling thread."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        results: list[list[str]] = []
        if lookahead <= 0:
            for page in pages:
                results.append(self._collect_page(
                    self._dispatch_page(page, orientation, None), None))
            return results
        pending: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as ex:
            for page in pages:
                pending.append(
                    ex.submit(self._dispatch_page, page, orientation, None)
                )
                if len(pending) > lookahead:
                    results.append(self._collect_page(pending.popleft().result(), None))
            while pending:
                results.append(self._collect_page(pending.popleft().result(), None))
        return results

    def _dispatch_page(self, crops, orientation, timer):
        """host prep + h2d + device dispatch for one page; returns
        ``((batch, device-future output) pairs, fused-or-None)`` with NO
        host readback.  ``fused`` is the device-side concat of every
        bucket's output when coalescing applies (multi-bucket page)."""
        if not len(crops):
            return [], None
        stage = _stage_fn(timer)
        with stage("host_prep"):
            # fused native orient+gray(+pad) in one C++ pass, with a NumPy
            # fallback — identical output either way (test_native parity)
            if self._wire == "packed":
                batches = batching.prep_page_packed(crops, orientation)
            else:
                batches = batching.prep_page_gray(crops, orientation)
        if (
            self._fuse_wire
            and len(batches) > 1
            and self.mesh is None
            and not any(isinstance(b, batching.PackedBatch) for b in batches)
        ):
            return self._finish_dispatch(
                self._dispatch_fused_wire(batches, timer), stage
            )
        outs = []
        for b in batches:
            if isinstance(b, batching.PackedBatch):
                fn = self._bucket_fn(b.bucket_hw)
                meta = np.concatenate([b.sizes, b.offsets[:, None]], axis=1)
                with stage("h2d"):
                    flat = jnp.asarray(b.flat)
                    device_meta = jnp.asarray(meta)  # ONE metadata transfer
                    if timer is not None:
                        jax.block_until_ready(flat)
                self._note_dispatch_shape(b.bucket_hw, b.sizes.shape[0])
                with stage("dispatch"):
                    device_arr, device_sizes = pp.unpack_packed_page(
                        flat, device_meta,
                        bh=b.bucket_hw[0], bw=b.bucket_hw[1],
                    )
                    packed = fn(self.params, device_arr, device_sizes)
                    outs.append((b, packed))
                continue
            arr, sizes = b.crops, b.sizes
            if arr.shape[0] % self._batch_multiple:
                pad = self._batch_multiple - arr.shape[0] % self._batch_multiple
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
                sizes = np.concatenate([sizes, np.repeat(sizes[-1:], pad, axis=0)])
            self._note_dispatch_shape(b.bucket_hw, arr.shape[0])
            with stage("h2d"):
                if self._batch_sharding is not None:
                    device_arr = jax.device_put(arr, self._batch_sharding)
                    device_sizes = jax.device_put(sizes, self._batch_sharding)
                else:
                    device_arr = jnp.asarray(arr)
                    device_sizes = jnp.asarray(sizes)
                if timer is not None:
                    jax.block_until_ready(device_arr)
            with stage("dispatch"):
                fn = self._resolve_fn(b.bucket_hw, (device_arr, device_sizes))
                packed = fn(self.params, device_arr, device_sizes)
                outs.append((b, packed))
        return self._finish_dispatch(outs, stage)

    def _finish_dispatch(self, outs, stage):
        """Shared dispatch tail: fuse the per-bucket outputs for a single
        readback (the readback half of ``coalesce``), or start the
        per-bucket device→host copies."""
        fused = None
        with stage("dispatch"):
            if len(outs) > 1 and self._coalesce:
                # one device-side concat -> ONE readback RPC for the page
                fused = _concat_rows(*[o for _, o in outs])
                fused.copy_to_host_async()
            else:
                # start the device→host copies NOW (async): each transfer
                # then begins the moment its compute finishes, so by the
                # time the streaming collector blocks on this page the
                # bytes are already in flight (or landed)
                for _, o in outs:
                    o.copy_to_host_async()
        return outs, fused

    def _collect_page(self, page, timer) -> list[str]:
        """Token readback + detokenization for one page's dispatches."""
        outs, fused = page
        if not outs:
            return []
        stage = _stage_fn(timer)
        if fused is not None:
            # ONE blocking readback for the whole page, then host slicing
            with stage("readback"):
                rows = np.asarray(fused)
            per_batch, off = [], 0
            for b, o in outs:
                per_batch.append(rows[off : off + b.valid])
                off += o.shape[0]
        else:
            # Fetch the FULL packed array and slice on the host: a device-
            # side ``tokens[:valid]`` would be its own jitted dispatch — one
            # extra tunnel round-trip (~25 ms) per page — while the padded
            # rows are a few KB of extra readback bytes.  Labeled distinctly
            # from _dispatch_page's async "dispatch" stage: this is where
            # the host blocks on device completion.
            per_batch = []
            for b, out in outs:
                with stage("readback"):
                    per_batch.append(np.asarray(out)[: b.valid])
        results_per_batch = []
        for (b, _), packed in zip(outs, per_batch):
            with stage("detok"):
                results_per_batch.append(
                    self.tokenizer.decode_batch(packed[:, 1:], packed[:, 0])
                )
        return batching.scatter_results([b for b, _ in outs], results_per_batch)

    def ocr_page_dual(
        self,
        crops: Sequence[np.ndarray],
        orientation: int = pp.ORIENT_AUTO,
        second_engine=None,
        settings: dict | None = None,
    ) -> list[tuple[str, str]]:
        """Enhanced dual-pass (SURVEY §2.4 #29; ``workers.py:383-420``):
        the raw crop goes to Manga-OCR under the "Auto-Detect" orientation
        rule (which applies no 90° rotation — the reference hardcodes it),
        and a skew-corrected + equalized + Otsu-binarized variant goes to a
        *second, decorrelated engine* — the reference uses Tesseract(jpn).
        Pass that engine (any ``perform_ocr(img, settings)`` object) as
        ``second_engine``; without one the preprocessed crop is decoded by
        the same model (correlated failure modes — fallback only).

        Returns (raw_text, second_text) per crop."""
        if not len(crops):
            return []
        crops = [np.asarray(c, np.uint8) for c in crops]
        # Binarize via the preprocessing graph in *bucketed* batches — a
        # per-crop call would compile one graph per distinct crop shape.
        # Statistics are masked to each crop's valid region.
        pre_batches = batching.bucket_crops(crops)
        pre_results = []
        for b in pre_batches:
            out, _ = pp.ocr_preprocess(
                jnp.asarray(b.crops),
                orientation=pp.ORIENT_AUTO,
                sizes=jnp.asarray(b.sizes),
            )
            out = np.asarray(out[: b.valid])
            pre_results.append(
                [img[: hw[0], : hw[1]] for img, hw in zip(out, b.sizes[: b.valid])]
            )
        pre = batching.scatter_results(pre_batches, pre_results)
        if second_engine is not None:
            raw_texts = self.ocr_page(crops, orientation)
            # the reference forces Tesseract with Japanese for this pass ON
            # TOP of the caller's settings ({**settings, ...} —
            # workers.py:399-403): orientation/tesseract knobs pass through
            tess_settings = {
                **(settings or {}),
                "ocr_engine": "Tesseract",
                "ocr_lang": "jpn",
                "tesseract_lang": "jpn",
            }
            second = [second_engine.perform_ocr(p, tess_settings) for p in pre]
        else:
            # one padded dispatch for both variants
            both = self.ocr_page(list(crops) + pre, orientation)
            raw_texts, second = both[: len(crops)], both[len(crops):]
        return list(zip(raw_texts, second))

    # -- reference-compatible single-crop entry -------------------------------

    def perform_ocr(self, cv_bgr_image: np.ndarray, settings: dict | None = None) -> str:
        """Single-crop OCR keeping the reference's contract: BGR uint8 in,
        text or ``"[ERROR: ...]"`` out; orientation from settings."""
        try:
            if cv_bgr_image is None or cv_bgr_image.size == 0:
                return _err("empty image")
            if cv_bgr_image.ndim == 2:
                cv_bgr_image = np.repeat(cv_bgr_image[..., None], 3, axis=-1)
            orientation = _orientation_from_settings(settings)
            return self.ocr_page([cv_bgr_image], orientation)[0]
        except Exception as e:  # contract: errors become sentinel strings
            return _err(f"{type(e).__name__}: {e}")

    # -- compile-coverage discipline (SURVEY §5.6 / VERDICT #6) ----------------

    def warm_set(
        self,
        bucket_hws: Sequence[tuple[int, int]] | None = None,
        batch_sizes: Sequence[int] | None = None,
    ) -> list[tuple[tuple[int, int], int]]:
        """The FULL set of compiled shapes reachable from ``ocr_page``:
        every bucket x every batch-schedule size.  Orientation is host-side,
        so (bucket, padded batch) fully enumerates the programs."""
        return [
            (hw, n)
            for hw in (bucket_hws or batching.DEFAULT_BUCKETS)
            for n in (batch_sizes or batching.BATCH_SCHEDULE)
        ]

    def _note_dispatch_shape(self, bucket_hw, batch: int) -> None:
        """Log dispatch shapes outside the warmed set — each is a potential
        multi-minute cold compile in production (persistent cache aside)."""
        key = (bucket_hw, batch)
        if key not in self._warmed:
            from manga_ocr_tpu.utils.metrics import COMPILE_EVENTS

            COMPILE_EVENTS.add("unplanned_compile")
            COMPILE_EVENTS.add(f"unplanned:{bucket_hw[0]}x{bucket_hw[1]}@{batch}")
            self._warmed.add(key)

    def warmup(
        self,
        bucket_hws: Sequence[tuple[int, int]] | None = None,
        batch_sizes: Sequence[int] | None = None,
        full: bool = False,
    ) -> None:
        """Pre-compile bucket x batch shapes (compile-once discipline).

        Default: a representative subset (common buckets, smallest batch).
        ``full=True`` warms the entire reachable set (``warm_set()``) — the
        production warm pass (see ``scripts/warm_cache.py``); with the
        persistent XLA cache enabled it is one-time per model revision.

        The packed wire's device-unpack programs (one per occupied row-cap
        quantum — ``batching.CAP_QUANTA`` per (bucket, batch) worst case)
        and the fused page wire's per-split unpack/concat programs are NOT
        enumerated here: each is a trivial gather/slice/copy that compiles
        in seconds, below the stall threshold the warm discipline exists
        for (the model programs take minutes)."""
        if full:
            pairs = self.warm_set(bucket_hws, batch_sizes)
        else:
            default = ((128, 128), (256, 128), (128, 256), (256, 256))
            pairs = [
                (hw, n)
                for hw in (bucket_hws or default)
                for n in (batch_sizes or batching.BATCH_SCHEDULE[:1])
            ]
        # round each requested batch up to the mesh multiple FIRST, then
        # dedupe — [7, 8] on an 8-way mesh is one warm pair, not two
        rounded = []
        for hw, n in pairs:
            if n % self._batch_multiple:
                n += self._batch_multiple - n % self._batch_multiple
            if (hw, n) not in rounded:
                rounded.append((hw, n))
        for hw, n in rounded:
            dummy = np.zeros((n, hw[0], hw[1]), np.uint8)  # gray wire
            sizes = np.full((n, 2), hw, np.int32)
            # place inputs exactly as ocr_page will (sharded under a mesh):
            # jit keys compiled executables on input shardings, so warming
            # with default placement would not cover the sharded dispatches
            if self._batch_sharding is not None:
                args = (
                    jax.device_put(dummy, self._batch_sharding),
                    jax.device_put(sizes, self._batch_sharding),
                )
            else:
                args = (jnp.asarray(dummy), jnp.asarray(sizes))
            fn = self._resolve_fn(hw, args)  # aot: warm pass seeds the store
            out = fn(self.params, *args)
            np.asarray(out)  # host readback forces completion
            self._warmed.add((hw, n))


def _cast_quantized(tree, dtype):
    """Cast float leaves to ``dtype``, preserving int8 weights and the f32
    per-channel scales of quantized denses."""
    if isinstance(tree, dict):
        if "w_q" in tree:
            out = dict(tree)
            out["w_q"] = jnp.asarray(tree["w_q"])
            out["scale"] = jnp.asarray(tree["scale"], jnp.float32)
            if tree.get("bias") is not None:
                out["bias"] = jnp.asarray(tree["bias"], dtype)
            return out
        return {k: _cast_quantized(v, dtype) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_cast_quantized(v, dtype) for v in tree]
    arr = jnp.asarray(tree)
    return arr.astype(dtype) if jnp.issubdtype(arr.dtype, jnp.floating) else arr


def _orientation_from_settings(settings: dict | None) -> int:
    """Map the reference's orientation setting strings to preprocess modes.

    Missing/unrecognized values default to Auto-Detect, which applies NO
    rotation on this path — the reference's ``perform_ocr`` defaults
    ``settings.get('orientation', 'Auto-Detect')`` and rotates only on
    exact "Vertical"/"Horizontal" matches (``main_window.py:9782,9790-9795``)."""
    if not settings:
        return pp.ORIENT_AUTO
    val = str(settings.get("orientation", "Auto-Detect"))
    return {
        "Vertical": pp.ORIENT_VERTICAL,
        "Horizontal": pp.ORIENT_HORIZONTAL,
        "Auto-Detect": pp.ORIENT_AUTO,
        "None": pp.ORIENT_NONE,
    }.get(val, pp.ORIENT_AUTO)
