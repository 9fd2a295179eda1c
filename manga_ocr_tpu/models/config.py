"""Model configurations for the TPU-native manga-ocr rebuild.

The reference delegates all model math to the ``manga_ocr`` pip package
(invoked as a black box at ``/root/reference/src/ui/main_window.py:9801``),
which wraps a HuggingFace ``VisionEncoderDecoderModel``: a ViT-base image
encoder and a shallow BERT-style Japanese character-level decoder.  These
dataclasses describe that architecture natively; every dimension is
config-driven so the same code runs tiny test models and the full-size one.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """ViT encoder (HF ``ViTModel``-compatible math, pre-LN blocks)."""

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    # Kernel selection (serving sets fused paths; "xla" = reference math for
    # parity tests).  mlp_kernel: "xla" | "fused" (bf16; int8 auto-detected
    # from quantized params).  attn_kernel: "xla" | "packed" (fused SDPA
    # only) | "fused_layer" (LN + projections + SDPA + residual, one kernel)
    # | "merged_layer" (the WHOLE block — attention + MLP — in one kernel;
    # mlp_kernel is ignored) | "stacked" (``stack_lpc`` whole blocks per
    # kernel with VMEM-resident weight slabs — ops/encoder_stack.py;
    # mlp_kernel is ignored).
    mlp_kernel: str = "xla"
    attn_kernel: str = "xla"
    # Layers per Pallas call for attn_kernel="stacked" (12 = whole encoder
    # in ONE kernel; bounded by VMEM — int8 weights are ~7.1 MB/layer).
    stack_lpc: int = 12
    # GELU inside the fused MLP kernel: "erf" (exact, ~20 VPU ops) |
    # "sigmoid" (x*sigmoid(1.702x), ~6 ops; |err| ~0.02 — below the int8
    # per-row activation quantization step, greedy-token parity tested).
    gelu_mode: str = "erf"
    # Mark the Pallas grid dims "parallel" (grid programs are independent
    # batch blocks / token tiles) so Mosaic may reorder/overlap more
    # aggressively.  Pure scheduling hint — identical math.
    parallel_grid: bool = False
    # SDPA emission inside the fused attention kernel: False = per-head
    # matmul→softmax→matmul chains; "batched" = one batched dot per head
    # (r2: exactly neutral); "phased" = three waves (all logits, all
    # softmaxes, all contexts) so Mosaic can pipeline independent heads'
    # MXU/VPU work.  Identical math, scheduling only.
    batched_sdpa: bool | str = False
    # Pad the token dim to this length (0 = off) through the fused-layer
    # stack.  197 is not sublane-(8-)aligned: the per-layer [B,197,D]→
    # [B*197,D] flattens around the MLP kernel are real relayouts
    # (profiler: 0.61 ms/layer of reshape/pad/slice at B=256) and Mosaic
    # internally pads every 197-token attn block to 208 sublanes.
    # Padding ONCE to 200 makes the flattens bitcasts and the kernel
    # blocks aligned — chained in-context measure: 12-layer stack
    # 54.7 → 37.0 ms (−32%, scripts/perf_r3_pad.py).  Attention masks
    # key columns beyond ``seq_len`` (softmax zeros) via ``valid_len``;
    # padded rows are row-local garbage sliced off after the stack.
    seq_pad_to: int = 0
    # int8 fused-MLP only: split each token tile into this many independent
    # row-chunk chains so one chunk's VPU epilogue (dequant→GELU→requant)
    # can overlap another's MXU matmuls.  Scheduling only — identical math.
    # Measured WORSE in-context (37.8 -> 38.4/40.2 ms scan12 at 2/4): the
    # split costs MXU-sized matmul efficiency more than the overlap buys.
    mlp_subtiles: int = 1
    # fused-MLP token-tile rows per grid program.  512 won the round-2
    # sweep at the unaligned 197-token shape; combined with mlp_subtiles
    # it sets the software-pipeline granularity (tile_m=1024 + subtiles=2
    # = two interleaved 512-row chains with full-size matmuls).
    mlp_tile_m: int = 512
    # fused_layer attention: run q/k/v as ONE concatenated [D, 3D] matmul
    # (the quantized activation read once, one MXU op instead of three).
    # Bit-exact — each output column's contraction is unchanged.
    attn_fuse_qkv: bool = False
    # fused_layer attention batch-block rows per grid program.  Swept
    # in-context on v5e (docs/PERF.md): 4 beats 2/8/16; 32 is VMEM-infeasible.
    attn_group: int = 4
    # fused_layer attention: run the SDPA matmuls (QK^T, PV) on the int8 MXU
    # path with dynamic per-row (q/k/probs) / per-column (v) quantization.
    # The dh=64 contraction half-fills the MXU K depth in any dtype; int8's
    # double-pumped rate is the only lever past that shape loss.  Adds
    # ~1/127-step quantization noise to logits/probabilities (int8 parity
    # tests cover it).
    attn_sdpa_int8: bool = False
    # fused_layer attention: pack two adjacent dh=64 heads into one
    # full-depth K=128 contraction (block-diagonal K/V assembly — the
    # decoder segment trick applied to the encoder SDPA).  Numerically
    # equivalent (the zero blocks are additive identity); a measured probe
    # of the half-MXU dh=64 shape loss (docs/PERF.md round 5).
    attn_sdpa_headpack: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        # +1 for the CLS token prepended by the embedding layer.
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """BERT-style decoder (HF ``BertLMHeadModel``-compatible math, post-LN
    blocks with cross-attention)."""

    vocab_size: int = 6144
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 8
    intermediate_size: int = 3072
    max_position_embeddings: int = 300
    layer_norm_eps: float = 1e-12
    # Special token ids (BERT conventions, as used by the manga-ocr vocab).
    pad_token_id: int = 0
    unk_token_id: int = 1
    bos_token_id: int = 2  # [CLS] — decoder_start_token_id
    eos_token_id: int = 3  # [SEP]
    # Store the precomputed cross-attention K/V int8 (decode is cross-KV
    # bandwidth-bound; halves the dominant per-step HBM traffic).
    cross_kv_int8: bool = False
    # Decode-step MLP kernel: "xla" | "fused" (in-loop Pallas experiment).
    step_mlp_kernel: str = "xla"
    # Whole-layer decode-step kernel: "xla" (reference math, ~25 ops/layer)
    # | "fused_layer" (ops.decode_layer: self-attn + cache update +
    # cross-attn + MLP in ONE Pallas call per layer; requires int8-quantized
    # decoder projections on TPU — ``models.quantize.quantize_decoder``)
    # | "fused_loop" (ops.decode_loop: the ENTIRE greedy loop in ONE Pallas
    # call — batch-blocked grid, cross-KV slabs and the self-cache
    # VMEM-resident, weights fetched once per dispatch).
    step_kernel: str = "xla"
    # Greedy LM head: "xla" (logits + argmax) | "fused" (ops.fused_head:
    # transform+GELU+LN+tiled vocab matmul+argmax in one kernel — the [B, V]
    # f32 logits never round-trip HBM).
    head_kernel: str = "xla"
    # fused_loop only: split each program's rows into this many INDEPENDENT
    # interleaved chains (block g -> chains x g/chains rows advancing in
    # alternating step bodies).  The dominant per-program cost is the
    # serial dependent-op chain per step (docs/PERF.md round 3: ~0.32 of
    # 0.55 ms/token at g=16); independent chains give the scheduler work to
    # hide it under.  Scheduling only — token-parity-tested.  Measured
    # WORSE on-chip (27.6 -> 34.6 ms t31 at 2 chains/g=16, 35.8 at g=32):
    # halving the rows per step body costs more op-emission efficiency
    # than the latency hiding buys.  Flag kept for documentation.
    loop_chains: int = 1
    # fused_loop only: greedy head emits all vocab-tile matmuls before a
    # tree (max, argmax) reduction, instead of the per-tile running-update
    # chain (each tile's matmul waiting on the previous tile's VPU select).
    # Same first-max-wins semantics; parity-tested.  Measured -0.7 ms t31
    # at B=256 on v5e (scripts/perf_decode_chains.py) — serving default.
    head_phased: bool = False
    # fused_loop only: compute the cross-K/V slabs (and the encoder's final
    # LayerNorm) INSIDE the decode mega-kernel, from the raw padded encoder
    # output.  Eliminates the whole XLA tail between the encoder scan and
    # the decode kernel — the final-LN/slice fusions, the 4 k/v projection
    # matmuls, and the [L,B,S,D] slab HBM round-trip (~314 MB at B=256) —
    # plus one program boundary of launch gap.  Token-parity-tested vs the
    # precomputed-slab path (tests/test_decode_loop.py).
    fuse_cross_kv: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class MangaOCRConfig:
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    # Maximum generated sequence length (reference model: 300).
    max_length: int = 300

    @staticmethod
    def base() -> "MangaOCRConfig":
        """The full-size manga-ocr architecture (ViT-base encoder + 2-layer
        char-level decoder)."""
        return MangaOCRConfig()

    @staticmethod
    def serving(quantized: bool = True) -> "MangaOCRConfig":
        """``base()`` with the fused TPU serving kernels enabled: packed
        Pallas attention + fused MLP (int8 when the params are quantized via
        ``models.quantize.quantize_encoder``).  Parity tests use ``base()``;
        this is the throughput configuration measured in docs/PERF.md.

        ``quantized`` declares whether the params will be int8-quantized
        (the production serving path).  It gates the approximate sigmoid
        GELU exactly as ``TpuMangaOcrEngine`` does: the ~0.02 abs error is
        below the int8 per-row activation quantization step, but callers
        serving unquantized bf16/f32 params keep exact erf."""
        return with_serving_kernels(MangaOCRConfig.base(), quantized)

    @staticmethod
    def tiny(vocab_size: int = 100) -> "MangaOCRConfig":
        """A miniature config for fast unit tests."""
        return MangaOCRConfig(
            encoder=EncoderConfig(
                image_size=32,
                patch_size=16,
                hidden_size=64,
                num_layers=2,
                num_heads=4,
                intermediate_size=128,
            ),
            decoder=DecoderConfig(
                vocab_size=vocab_size,
                hidden_size=64,
                num_layers=2,
                num_heads=4,
                intermediate_size=128,
                max_position_embeddings=32,
            ),
            max_length=16,
        )

    @staticmethod
    def from_hf_config(cfg: dict) -> "MangaOCRConfig":
        """Build from a HuggingFace ``VisionEncoderDecoderConfig`` JSON dict
        (the ``config.json`` sitting next to a checkpoint)."""
        enc = cfg["encoder"]
        dec = cfg["decoder"]
        encoder = EncoderConfig(
            image_size=enc.get("image_size", 224),
            patch_size=enc.get("patch_size", 16),
            num_channels=enc.get("num_channels", 3),
            hidden_size=enc.get("hidden_size", 768),
            num_layers=enc.get("num_hidden_layers", 12),
            num_heads=enc.get("num_attention_heads", 12),
            intermediate_size=enc.get("intermediate_size", 3072),
            layer_norm_eps=enc.get("layer_norm_eps", 1e-12),
        )
        decoder = DecoderConfig(
            vocab_size=dec["vocab_size"],
            hidden_size=dec.get("hidden_size", 768),
            num_layers=dec.get("num_hidden_layers", 2),
            num_heads=dec.get("num_attention_heads", 12),
            intermediate_size=dec.get("intermediate_size", 3072),
            max_position_embeddings=dec.get("max_position_embeddings", 512),
            layer_norm_eps=dec.get("layer_norm_eps", 1e-12),
            pad_token_id=dec.get("pad_token_id", 0) or 0,
            bos_token_id=cfg.get("decoder_start_token_id", 2) or 2,
            eos_token_id=dec.get("eos_token_id", 3) or 3,
        )
        max_length = dec.get("max_length", 300) or 300
        return MangaOCRConfig(encoder=encoder, decoder=decoder, max_length=max_length)

    @staticmethod
    def from_json_file(path: str) -> "MangaOCRConfig":
        with open(path) as f:
            return MangaOCRConfig.from_hf_config(json.load(f))


def with_serving_kernels(cfg: "MangaOCRConfig", quantized: bool = True) -> "MangaOCRConfig":
    """Apply the fused-TPU-serving kernel flags to ANY config (base or
    from_hf_config) — the ONE place the serving configuration is defined,
    used by both ``MangaOCRConfig.serving()`` and ``TpuMangaOcrEngine``
    so the two can never drift (an earlier engine-side copy silently lost
    ``seq_pad_to``/``head_phased``)."""
    return dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder,
            mlp_kernel="fused",
            attn_kernel="fused_layer" if quantized else "packed",
            # fast VPU GELU: 2.05 -> 1.04 ms/layer, error below the int8
            # activation quantization step (token parity tested); exact erf
            # kept for unquantized params
            gelu_mode="sigmoid" if quantized else "erf",
            # 8-aligned token dim through the fused stack: relayouts become
            # bitcasts, kernel blocks align — 12-layer stack 54.7 -> 37.0 ms
            # in-context (scripts/perf_r3_pad.py)
            seq_pad_to=_pad_seq(cfg.encoder.seq_len) if quantized else 0,
        ),
        decoder=dataclasses.replace(
            cfg.decoder,
            cross_kv_int8=quantized,
            # whole-loop decode kernel: 0.58 vs 0.89 ms/token slope-timed
            # (docs/PERF.md round 3); NB it decodes with bf16 cross-KV slabs
            # regardless of cross_kv_int8 (the flag affects only the
            # XLA-step fallback paths)
            step_kernel="fused_loop",
            # phased greedy head: all vocab-tile matmuls emitted before a
            # tree (max, argmax) reduction — -0.7 ms/dispatch measured
            # (scripts/perf_decode_chains.py); token-parity-tested
            head_phased=True,
            # fuse_cross_kv stays OFF: measured exactly neutral e2e on the
            # real chip and costs exact token parity (docs/PERF.md round 3)
        ),
    )


def _pad_seq(seq_len: int) -> int:
    """Next multiple of 8 ≥ seq_len (ViT-base: 197 -> 200 — the measured
    sublane-alignment optimum, scripts/perf_r3_pad.py; already-aligned or
    tiny-config lengths pass through unchanged)."""
    return ((seq_len + 7) // 8) * 8
