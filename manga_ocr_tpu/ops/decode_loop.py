"""Whole-decode-loop mega-kernel: the ENTIRE greedy loop in one Pallas call.

Round-2/3 established (docs/PERF.md) that per-STEP fusion cannot win on this
runtime: in-loop Pallas calls cost ~0.3–0.5 ms each regardless of body size,
and the XLA step itself is op-granularity-bound (~50 ops × ~12 µs).  The one
variant left (VERDICT r2 #2) pays the launch tax ONCE: a single kernel that
runs all ``steps`` greedy-decode steps.

The key restructuring is that greedy decode is *batch-parallel*: row b's
token at step t depends only on row b's history.  So the grid iterates
batch blocks, and each program runs the full ``steps``-iteration loop for
its block with everything hot:

- **cross-K/V slabs resident**: the XLA while-loop re-reads the whole int8
  cross-K/V from HBM every step (~155 MB/step at B=256 — THE decode
  bandwidth floor, ~6 ms just for 32 steps).  Here each program's
  [g, S, D] slabs are fetched once per dispatch: total cross-KV traffic
  drops from steps×155 MB to 155 MB.
- **self-attention cache in VMEM scratch**: never touches HBM at all
  (XLA path: ~50 MB/step of cache read+write traffic).
- **weights fetched once**: constant-index-map blocks revisited across the
  grid (the per-step XLA path re-fetches ~57 MB of weights every step).
- **embedding lookup as a one-hot matmul**: Mosaic's dynamic gather is not
  reliable, but ``onehot(prev) @ tok_embed`` is an *exact* row-select on
  the MXU (products are 0·x or 1·x, f32-accumulated) — ~0.6 GFLOP/step at
  B=256, noise on the MXU.
- **greedy head in-loop**: transform + erf-GELU + LN + bf16 vocab matmul +
  running argmax (the proven ops/fused_head tiling); [B, 6144] logits
  never exist outside VMEM.
- per-head reductions use the 0/1 segment-matrix trick from
  ops/decode_layer.py (decoder head_dim 96 is not lane-aligned; 96-offset
  lane slices lower through a broken Mosaic gather).

Numerics mirror the XLA decode path exactly where it matters for greedy
tokens: f32 softmax/LN statistics, bf16 residual stream, per-row dynamic
int8 activation quantization, post-contraction cross-KV dequant.  Parity:
tests/test_decode_loop.py (token-exact vs ``model.greedy_decode``).

Reference behavior being replaced: the token-by-token torch ``generate()``
inside the black-box manga_ocr package
(``/root/reference/src/ui/main_window.py:9801``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manga_ocr_tpu.ops.kernel_utils import gelu_fn as _gelu_fn, NEG_INF, seg_matrix
from manga_ocr_tpu.ops.kernel_utils import ln32 as _ln32
from manga_ocr_tpu.ops.kernel_utils import pick_group
from manga_ocr_tpu.ops.kernel_utils import quant_rows as _quant_rows

# Head vocab-matmul tile.  The greedy head's argmax runs as a chain of
# per-tile (matmul, max, argmax, select) updates — each tile is a serial
# dependency in the step's latency chain, so at small g (logits [g, tile]
# are tiny in VMEM) larger tiles mean fewer chain links.  Swept in
# scripts/perf_decode_head.py; overridable per-call via ``vocab_tile``.
VOCAB_TILE = 512





def _proj(h32, w, s, b, int8: bool, dt):
    """[g, K] f32 -> [g, N] f32 (+bias); int8 MXU path with per-row dynamic
    activation quant when the weight is quantized."""
    if int8:
        hq, sx = _quant_rows(h32)
        acc = jax.lax.dot_general(
            hq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * s
    else:
        y = jax.lax.dot_general(
            h32.astype(dt), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return y + b


# Per-layer weight-slab names (order matters — mirrored by the caller).
_LAYER_NAMES = (
    "wqkv", "sqkv", "bqkv", "wo", "so", "bo", "slns", "slnb",
    "cwq", "csq", "cbq", "cwo", "cso", "cbo", "clns", "clnb",
    "w1", "s1", "b1", "w2", "s2", "b2", "mlns", "mlnb",
)
_CROSS_NAMES = ("K", "V")
# fuse_kv mode: instead of precomputed K/V slabs, each layer carries the
# cross k/v projection weights and the kernel computes its block's slabs
# from the encoder output once per dispatch (glue elimination: the slabs
# never round-trip HBM, and the final-LN/slice/4-matmul XLA tail between
# the encoder scan and the decode kernel disappears entirely).
_CROSSW_NAMES = ("cwk", "cbk", "cwv", "cbv")
_COMMON_NAMES = (
    "tok_emb", "pos_emb", "tok_type", "elns", "elnb",
    "twt", "tbt", "hlns", "hlnb", "wp", "bp", "seg",
)


def _decode_loop_kernel(
    *args,
    steps: int,
    num_layers: int,
    heads: int,
    dh: int,
    eps: float,
    int8_w: bool,
    s_valid: int,
    bos: int,
    eos: int,
    pad: int,
    gelu,
    head_gelu,
    ablate: str = "",
    vocab_tile: int = VOCAB_TILE,
    fuse_kv: bool = False,
    final_ln_in_kernel: bool = False,
    chains: int = 1,
    head_phased: bool = False,
    has_stops: bool = False,
):
    nc = len(_COMMON_NAMES)
    common = dict(zip(_COMMON_NAMES, args[:nc]))
    off = nc
    if fuse_kv:
        enc_ref = args[off]
        off += 1
        if final_ln_in_kernel:
            fns_ref, fnb_ref = args[off], args[off + 1]
            off += 2
    layers = []
    cross_ws = []
    for _ in range(num_layers):
        if fuse_kv:
            cross_ws.append(
                dict(zip(_CROSSW_NAMES, args[off : off + len(_CROSSW_NAMES)]))
            )
            off += len(_CROSSW_NAMES)
            cross = None
        else:
            cross = dict(zip(_CROSS_NAMES, args[off : off + len(_CROSS_NAMES)]))
            off += len(_CROSS_NAMES)
        lw = dict(zip(_LAYER_NAMES, args[off : off + len(_LAYER_NAMES)]))
        off += len(_LAYER_NAMES)
        layers.append((cross, lw))
    stops_ref = None
    if has_stops:
        # [g, 1] int32 forced stop lengths (benchmark instrument — mirrors
        # model.greedy_decode's ``stop_lengths``: rows behave as if EOS
        # fired at that length, so chunked early exit is measurable under a
        # realistic length distribution even with random weights)
        stops_ref = args[off]
        off += 1
    tok_ref, len_ref = args[off], args[off + 1]
    off2 = off + 2
    caches = args[off2 : off2 + 2 * num_layers]  # ck/cv VMEM scratch
    off2 += 2 * num_layers
    if fuse_kv:
        # per-layer cross-K/V slabs live in scratch, filled once per program
        kv_slabs = args[off2 : off2 + 2 * num_layers]
        off2 += 2 * num_layers
        for l in range(num_layers):
            layers[l] = (
                {"K": kv_slabs[2 * l], "V": kv_slabs[2 * l + 1]},
                layers[l][1],
            )
    prev_ref, done_ref = args[off2], args[off2 + 1]
    # (A manual single-buffered slab-DMA variant was measured WORSE than
    # Mosaic's double-buffered block-spec slabs — 0.645/0.769 vs 0.584
    # ms/token — per-program-step cost is chain latency + work ∝ g, optimal
    # at g=16 with block specs.  docs/PERF.md round 3.)

    seg = common["seg"][:]  # [D, H] f32
    segT_scale = 1.0 / (dh**0.5)
    d = seg.shape[0]
    g = tok_ref.shape[0]
    dt = caches[0].dtype
    v = common["tok_emb"].shape[0]

    # Zero the cache scratch once per program: masked softmax rows weight
    # unwritten cache entries by 0, but 0 x garbage (NaN in uninitialized
    # VMEM) is NaN — the ctx sum must see real zeros.
    for c in caches:
        c[...] = jnp.zeros(c.shape, c.dtype)

    if fuse_kv:
        # Compute this block's cross-K/V slabs once per program, straight
        # from the encoder output block: (optional final LN) then the k/v
        # projections as 3-D dot_generals (no reshape — a [g,S,D]→[g·S,D]
        # flatten lowers through a relayout at unaligned S).  Numerics
        # mirror the XLA tail exactly: f32 LN stats → bf16 cast → bf16
        # matmul with f32 accumulation → f32 bias add → bf16 cast.
        dt0 = caches[0].dtype
        e = enc_ref[:]
        if final_ln_in_kernel:
            e = _ln32(e, fns_ref[:], fnb_ref[:], eps)
        e = e.astype(dt0)
        for l in range(num_layers):
            cw = cross_ws[l]
            for name_w, name_b, slab in (
                ("cwk", "cbk", layers[l][0]["K"]),
                ("cwv", "cbv", layers[l][0]["V"]),
            ):
                y = jax.lax.dot_general(
                    e, cw[name_w][:], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + cw[name_b][:]
                slab[...] = y.astype(dt0)

    # Per-head attention WITHOUT per-step whole-slab elementwise work: the
    # round-3 first cut computed scores as (q ⊙ K) @ seg — casting and
    # multiplying the ENTIRE K/V slab on the VPU every step dominated the
    # kernel (measured flat ~30 ms across group sizes = VPU-bound).  MXU
    # formulation instead: fold q into a per-row [D, H] weight
    # Wq[b] = q[b][:, None] * seg, then scores[b] = K[b] @ Wq[b] — one
    # batched matmul; and ctx[b] = select_heads(P[b]ᵀ @ V[b]) — another.
    # The slabs feed the MXU directly (stored bf16 — int8 storage buys
    # nothing now that they are fetched once per dispatch, not per step).
    segT = seg.T  # [H, D]

    def _attend(q32, kv_k, kv_v, t_len, mask_le=None):
        """q [g, D] f32 + K/V [g, T, D] (bf16) -> ctx [g, D] f32.

        Rounding mirrors the XLA path: q is bf16-rounded FIRST (the XLA
        projections emit bf16), the seg mask is 0/1 so ``q_bf * seg`` is
        exact, and the 1/sqrt(dh) scale lands on the f32 scores — not
        folded into Wq where it would round differently."""
        q_bf = q32.astype(dt).astype(jnp.float32)
        wq = (q_bf[:, :, None] * seg[None]).astype(dt)  # [g, D, H] exact
        scores = jax.lax.dot_general(
            kv_k, wq, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * segT_scale  # [g, T, H]
        if mask_le is not None:
            keep = jax.lax.broadcasted_iota(jnp.int32, (1, t_len, 1), 1) <= mask_le
            scores = jnp.where(keep, scores, NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        # reciprocal-multiply: one VPU divide on [g, 1, H] instead of a
        # per-element divide over [g, T, H] — the loop is serial-chain
        # latency-bound (docs/PERF.md round 3), so shorter chains matter
        p = (p * (1.0 / jnp.sum(p, axis=1, keepdims=True))).astype(dt)  # [g, T, H]
        heads_out = jax.lax.dot_general(
            p, kv_v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [g, H, D] — contract T with T directly (a swapaxes here lowers
        # through an unsupported Mosaic gather)
        return jnp.sum(heads_out * segT[None], axis=1)  # [g, D] f32

    def self_attn(x, t, lw, ck, cv, t_rows, sl):
        qkv = _proj(
            x.astype(jnp.float32), lw["wqkv"][:], lw["sqkv"][:], lw["bqkv"][:],
            int8_w, dt,
        )  # [gc, 3D] f32
        q = qkv[:, :d]
        # cache layout [g, T, D] (batch-leading for the attention matmuls —
        # Mosaic's dot_general requires batch dims at equal positions);
        # written via iota-masked select: a dynamic-index store on the
        # sublane dim would need 8-aligned offsets Mosaic can't prove.
        # ``sl`` selects this chain's rows (full slice when chains == 1).
        mask_t = t_rows == t  # [1, T, 1]
        k_new = jnp.expand_dims(qkv[:, d : 2 * d].astype(dt), 1)  # [gc, 1, D]
        v_new = jnp.expand_dims(qkv[:, 2 * d :].astype(dt), 1)
        # (slice+newaxis in ONE getitem lowers through an unsupported gather)
        ck[sl] = jnp.where(mask_t, k_new, ck[sl])
        cv[sl] = jnp.where(mask_t, v_new, cv[sl])
        t_len = ck.shape[1]
        ctx = _attend(q, ck[sl], cv[sl], t_len, mask_le=t)
        out = _proj(ctx, lw["wo"][:], lw["so"][:], lw["bo"][:], int8_w, dt)
        return _ln32(
            (x + out.astype(dt)).astype(jnp.float32), lw["slns"][:], lw["slnb"][:], eps
        ).astype(dt)

    def cross_attn(x, cross, lw, sl):
        q = _proj(
            x.astype(jnp.float32), lw["cwq"][:], lw["csq"][:], lw["cbq"][:],
            int8_w, dt,
        )  # [gc, D] f32
        K, V = cross["K"][sl], cross["V"][sl]
        s_len = K.shape[1]
        # slabs are padded to an 8-multiple S for the aligned DMA; mask the
        # padded key rows (mask_le keeps iota <= bound)
        mask = s_valid - 1 if s_valid < s_len else None
        ctx = _attend(q, K, V, s_len, mask_le=mask)
        out = _proj(ctx, lw["cwo"][:], lw["cso"][:], lw["cbo"][:], int8_w, dt)
        return _ln32(
            (x + out.astype(dt)).astype(jnp.float32), lw["clns"][:], lw["clnb"][:], eps
        ).astype(dt)

    def mlp(x, lw):
        h = _proj(x.astype(jnp.float32), lw["w1"][:], lw["s1"][:], lw["b1"][:],
                  int8_w, dt)
        h = gelu(h)
        if int8_w:
            out = _proj(h, lw["w2"][:], lw["s2"][:], lw["b2"][:], True, dt)
        else:
            out = _proj(h, lw["w2"][:], lw["s2"][:], lw["b2"][:], False, dt)
        return _ln32(
            (x + out.astype(dt)).astype(jnp.float32), lw["mlns"][:], lw["mlnb"][:], eps
        ).astype(dt)

    def head_argmax(x):
        rows = x.shape[0]
        h = (
            jax.lax.dot_general(
                x, common["twt"][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + common["tbt"][:]
        )
        h = head_gelu(h)
        h = _ln32(h, common["hlns"][:], common["hlnb"][:], eps).astype(dt)
        wp = common["wp"]
        vocab = wp.shape[1]
        if head_phased:
            # Emit ALL vocab-tile matmuls before any reduction (the MXU can
            # pipeline independent matmuls; the running-update chain below
            # makes each tile wait on the previous tile's VPU select), then
            # reduce per-tile (max, argmax) candidates as a binary tree.
            # Semantics identical to the chain: first global max wins (the
            # chain replaces only on strictly-greater; the tree keeps the
            # earlier-index candidate on ties).
            tiles = [
                (
                    j,
                    jax.lax.dot_general(
                        h, wp[:, j : j + vocab_tile], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + common["bp"][j : j + vocab_tile],
                )
                for j in range(0, vocab, vocab_tile)
            ]
            cands = [
                (
                    jnp.max(lg, axis=-1, keepdims=True),
                    jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None] + j,
                )
                for j, lg in tiles
            ]
            while len(cands) > 1:
                nxt = []
                for k in range(0, len(cands) - 1, 2):
                    (ma, ia), (mb, ib) = cands[k], cands[k + 1]
                    keep = ma >= mb  # left = earlier index: ties keep first
                    nxt.append((jnp.where(keep, ma, mb), jnp.where(keep, ia, ib)))
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            return cands[0][1]
        best = jnp.full((rows, 1), -jnp.inf, jnp.float32)
        best_idx = jnp.zeros((rows, 1), jnp.int32)
        for j in range(0, vocab, vocab_tile):
            logits = (
                jax.lax.dot_general(
                    h, wp[:, j : j + vocab_tile], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + common["bp"][j : j + vocab_tile]
            )
            mx = jnp.max(logits, axis=-1, keepdims=True)
            am = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            upd = mx > best
            best_idx = jnp.where(upd, am + j, best_idx)
            best = jnp.where(upd, mx, best)
        return best_idx  # [rows, 1] int32 (2-D: 1-D loop carries hit Mosaic
        # "invalid relayout" on i32 vectors)

    # Per-row decode state (prev token, done flag) lives in VMEM scratch and
    # the outputs are read-modify-written per step: loop CARRIES of small
    # i32 vectors hit Mosaic "invalid relayout" (carry layout unification),
    # but loads/stores through memory don't need layout matching.  The token
    # matrix accumulates via iota-masked adds — Mosaic's tiling also rejects
    # (T, g)/(g, T) dynamic-index stores at these shapes, and a [g, T+1]
    # masked add per step is a trivial VPU op.
    gc = g // chains  # rows per independent chain (g when chains == 1)
    t_cols_full = jax.lax.broadcasted_iota(jnp.int32, (g, steps + 1), 1)
    t_cols = (
        t_cols_full
        if chains == 1
        else jax.lax.broadcasted_iota(jnp.int32, (gc, steps + 1), 1)
    )
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (1, steps, 1), 1)
    prev_ref[:] = jnp.full((g, 1), bos, jnp.int32)
    done_ref[:] = jnp.zeros((g, 1), jnp.int32)
    len_ref[:] = jnp.ones((g, 1), jnp.int32)
    tok_ref[:] = jnp.where(t_cols_full == 0, bos, 0).astype(jnp.int32)

    EXIT_CHUNK = 8
    chain_slices = (
        (slice(None),)
        if chains == 1
        else tuple(slice(ci * gc, (ci + 1) * gc) for ci in range(chains))
    )

    def one_chunk(c, _):
        # EOS-driven early exit at batch-block granularity, evaluated once
        # per 8-step chunk (a per-step predicate costs ~0.14 ms/token even
        # when it never fires): once every row of this program is done,
        # remaining chunks skip their whole bodies.  With a real
        # checkpoint's median-12 lengths the engine's budget-300 contract
        # pays ~tens of live steps per block instead of 299.
        @pl.when(jnp.logical_not(jnp.all(done_ref[:] != 0)))
        def _live_chunk():
            for j in range(EXIT_CHUNK):
                # chains > 1: the block's rows split into independent
                # row-chains whose step bodies are emitted interleaved —
                # chain A's step-t ops have no dependency on chain B's, so
                # the scheduler can hide one chain's serial-chain latency
                # (the dominant per-program cost, docs/PERF.md) under the
                # other's work
                for sl in chain_slices:
                    _one_step_body(c * EXIT_CHUNK + j, sl)

        return 0

    def _one_step_body(t, sl):
        prev = prev_ref[sl]  # [gc, 1] i32
        done = done_ref[sl] != 0
        # embedding via exact one-hot matmul (no gather)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (gc, v), 1) == prev
        ).astype(dt)
        emb = jax.lax.dot_general(
            onehot, common["tok_emb"][:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # exact row-select
        # sum in the compute dtype exactly as decoder.embed does.  The
        # position row is selected by an iota mask (a dynamic bf16 row read
        # needs an alignment proof Mosaic can't make); one row + zeros is
        # exact.
        n_pos = common["pos_emb"].shape[0]
        tt = jnp.minimum(t, n_pos - 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_pos, 1), 0)
        pos_row = jnp.sum(
            jnp.where(row_ids == tt, common["pos_emb"][:], 0).astype(
                jnp.float32
            ),
            axis=0,
        ).astype(dt)
        emb = emb + pos_row + common["tok_type"][:]
        x = _ln32(emb, common["elns"][:], common["elnb"][:], eps).astype(dt)
        for l in range(num_layers):
            cross, lw = layers[l]
            ck, cv = caches[2 * l], caches[2 * l + 1]
            if "self" not in ablate:
                x = self_attn(x, t, lw, ck, cv, t_rows, sl)
            if "cross" not in ablate:
                x = cross_attn(x, cross, lw, sl)
            if "mlp" not in ablate:
                x = mlp(x, lw)
        if "head" in ablate:
            nxt = prev + 1  # keep the loop-carried dependency shape
        else:
            nxt = head_argmax(x)  # [gc, 1]
        nxt = jnp.where(done, pad, nxt)
        tok_ref[sl] = tok_ref[sl] + jnp.where(t_cols == t + 1, nxt, 0)
        # guard the exit-chunk's phantom tail steps (t >= steps): their
        # token/cache writes are natural no-ops, but lengths would overcount
        live = jnp.logical_and(jnp.logical_not(done), t < steps)
        len_ref[sl] = len_ref[sl] + jnp.where(live, 1, 0)
        prev_ref[sl] = nxt
        newly_done = nxt == eos
        if has_stops:  # same semantics as model.greedy_decode's instrument
            newly_done = jnp.logical_or(newly_done, t + 2 >= stops_ref[sl])
        done_ref[sl] = jnp.logical_or(done, newly_done).astype(jnp.int32)

    jax.lax.fori_loop(0, -(-steps // EXIT_CHUNK), one_chunk, 0)


def _dense_int8_or(p: dict, dt, concat_qkv: bool = False):
    """(w, scale, bias_f32) from a quantized or plain dense param dict."""
    if "w_q" in p:
        return p["w_q"], p["scale"].astype(jnp.float32), p["bias"].astype(jnp.float32)
    return (
        p["kernel"].astype(dt),
        jnp.ones((p["kernel"].shape[-1],), jnp.float32),
        p["bias"].astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "num_layers", "num_heads", "eps", "bos", "eos",
        "pad", "dt", "int8_w", "s_valid", "group", "gelu_mode", "interpret",
        "batch", "ablate", "vocab_tile", "fuse_kv", "chains", "head_phased",
    ),
)
def _loop_call(
    commons: tuple,
    crosses: tuple,  # per-layer (K, V) bf16 slabs; () in fuse_kv mode
    layer_ws: tuple,  # per-layer tuple in _LAYER_NAMES order
    batch: int,
    steps: int,
    num_layers: int,
    num_heads: int,
    eps: float,
    s_valid: int,
    bos: int,
    eos: int,
    pad: int,
    dt,
    int8_w: bool,
    group: int = 32,
    gelu_mode: str = "erf",
    interpret: bool = False,
    ablate: str = "",  # perf diagnosis only: skip named step stages
    vocab_tile: int = VOCAB_TILE,
    fuse_kv: bool = False,
    enc=None,  # [B, S_pad, D] raw encoder output (fuse_kv mode)
    final_ln: tuple | None = None,  # (scale f32, bias f32) encoder final LN
    cross_ws: tuple = (),  # per-layer (cwk, cbk, cwv, cbv) (fuse_kv mode)
    chains: int = 1,  # independent interleaved row-chains per program
    head_phased: bool = False,  # vocab head: all matmuls first, tree argmax
    stops=None,  # [B, 1] int32 forced stop lengths (bench instrument)
):
    g = pick_group(batch, group)
    if g % chains or (not interpret and (g // chains) % 8):
        chains = 1  # chain rows must be sublane-aligned slices on TPU
    d = commons[0].shape[-1]

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i, _n=len(shape): tuple(0 for _ in range(_n)),
            memory_space=pltpu.VMEM,
        )

    def batch_block(shape3):
        return pl.BlockSpec(shape3, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [const(a.shape) for a in commons]
    flat_inputs = list(commons)
    if fuse_kv:
        s_len = enc.shape[1]
        in_specs.append(batch_block((g, s_len, d)))
        flat_inputs.append(enc)
        if final_ln is not None:
            in_specs += [const(a.shape) for a in final_ln]
            flat_inputs += list(final_ln)
    else:
        s_len = crosses[0][0].shape[1]
    for l in range(num_layers):
        if fuse_kv:
            in_specs += [const(a.shape) for a in cross_ws[l]]
            flat_inputs += list(cross_ws[l])
        else:
            K, V = crosses[l]
            in_specs += [batch_block((g, s_len, d)), batch_block((g, s_len, d))]
            flat_inputs += [K, V]
        in_specs += [const(a.shape) for a in layer_ws[l]]
        flat_inputs += list(layer_ws[l])
    if stops is not None:
        in_specs.append(
            pl.BlockSpec((g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        flat_inputs.append(stops)

    kernel = functools.partial(
        _decode_loop_kernel,
        steps=steps, num_layers=num_layers, heads=num_heads, dh=d // num_heads,
        eps=eps, int8_w=int8_w, s_valid=s_valid, bos=bos, eos=eos, pad=pad,
        gelu=_gelu_fn(gelu_mode), head_gelu=_gelu_fn("erf"), ablate=ablate,
        vocab_tile=vocab_tile, fuse_kv=fuse_kv,
        final_ln_in_kernel=fuse_kv and final_ln is not None,
        chains=chains, head_phased=head_phased, has_stops=stops is not None,
    )
    scratch = [pltpu.VMEM((g, steps, d), dt) for _ in range(2 * num_layers)]
    if fuse_kv:
        scratch += [
            pltpu.VMEM((g, s_len, d), dt) for _ in range(2 * num_layers)
        ]
    scratch += [pltpu.VMEM((g, 1), jnp.int32), pltpu.VMEM((g, 1), jnp.int32)]
    tokens, lengths = pl.pallas_call(
        kernel,
        grid=(batch // g,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((g, steps + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, steps + 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(*flat_inputs)
    return tokens, lengths


def greedy_decode_loop(
    params_decoder: dict,
    cross,  # decoder.CrossKVPacked; None in fuse_kv mode
    cfg,  # DecoderConfig
    steps: int,
    dtype=jnp.bfloat16,
    group: int = 32,
    gelu_mode: str = "erf",
    interpret: bool = False,
    ablate: str = "",
    vmem_budget_mb: int = 110,
    vocab_tile: int = VOCAB_TILE,
    enc_raw=None,  # [B, S_pad, D] raw pre-final-LN encoder output
    s_valid: int | None = None,  # valid encoder rows of enc_raw
    enc_final_ln: dict | None = None,  # encoder final-LN params
    chains: int | None = None,  # None -> cfg.loop_chains
    head_phased: bool | None = None,  # None -> cfg.head_phased
    stop_lengths=None,  # [B] int32 forced stops (bench instrument)
) -> tuple[jax.Array, jax.Array]:
    """Run ``steps`` greedy decode steps entirely inside one Pallas kernel.

    Returns (tokens [B, steps+1] starting with BOS, lengths [B]) with the
    exact done-masking semantics of ``model.greedy_decode`` (PAD after EOS,
    lengths count BOS + emitted tokens incl. EOS).

    Two cross-attention source modes: precomputed ``cross`` slabs
    (decoder.CrossKVPacked), or ``enc_raw`` + ``enc_final_ln`` (fuse_kv):
    the kernel applies the encoder final LN and computes each batch block's
    K/V slabs itself, with the same numerics as ``ops.common.dense`` on the
    LN'd output — the slabs never exist in HBM.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    if chains is None:
        chains = getattr(cfg, "loop_chains", 1)
    if head_phased is None:
        head_phased = getattr(cfg, "head_phased", False)
    fuse_kv = enc_raw is not None
    batch = enc_raw.shape[0] if fuse_kv else cross.k.shape[1]
    d = cfg.hidden_size
    dt = dtype
    layers = params_decoder["layers"]
    int8_w = "w_q" in layers["self_attn"]["q"]

    # Auto-shrink the batch block so the resident set (double-buffered
    # cross slabs + caches + weights/tables + transients) stays under the
    # VMEM cap; long budgets (steps ~300) force smaller blocks.
    if fuse_kv:
        s_pad = enc_raw.shape[1]
        s_enc = s_valid if s_valid is not None else s_pad
    else:
        int8_kv = cross.k_scale is not None
        s_pad = s_enc = cross.k.shape[2]
    itemsize = jnp.dtype(dt).itemsize
    fixed = 60e6  # weights + embed/head tables + transients, roughly
    while group > 8:
        if fuse_kv:
            per_row = (
                2 * s_pad * d * itemsize  # double-buffered enc block input
                + 2 * cfg.num_layers * s_pad * d * itemsize  # slab scratch
                + 2 * cfg.num_layers * steps * d * itemsize  # caches
            )
        else:
            per_row = (
                2 * 2 * cfg.num_layers * s_pad * d * itemsize  # bf16 slabs,
                # double-buffered block-spec inputs
                + 2 * cfg.num_layers * steps * d * itemsize  # caches
            )
        if fixed + group * per_row <= vmem_budget_mb * 1e6:
            break
        group //= 2

    head = params_decoder["head"]
    commons = (
        params_decoder["tok_embed"].astype(dt),
        params_decoder["pos_embed"][:steps].astype(dt),
        params_decoder["tok_type"].astype(dt),
        params_decoder["emb_ln"]["scale"].astype(jnp.float32),
        params_decoder["emb_ln"]["bias"].astype(jnp.float32),
        head["transform"]["dense"]["kernel"].astype(dt),
        head["transform"]["dense"]["bias"].astype(jnp.float32),
        head["transform"]["ln"]["scale"].astype(jnp.float32),
        head["transform"]["ln"]["bias"].astype(jnp.float32),
        head["proj"]["kernel"].astype(dt),
        head["proj"]["bias"].astype(jnp.float32),
        seg_matrix(cfg.num_heads, cfg.head_dim),
    )

    crosses = []
    cross_ws = []
    layer_ws = []
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], layers)
        if fuse_kv:
            # cross k/v projection weights go into the kernel (they stay
            # bf16 even under quantize_decoder — see models/quantize.py)
            ca_kv = lp["cross_attn"]
            cross_ws.append(
                (
                    ca_kv["k"]["kernel"].astype(dt),
                    ca_kv["k"]["bias"].astype(jnp.float32),
                    ca_kv["v"]["kernel"].astype(dt),
                    ca_kv["v"]["bias"].astype(jnp.float32),
                )
            )
        else:
            # bf16 slabs: the attentions are batched MXU matmuls against
            # them, and resident slabs are fetched once per dispatch, so
            # int8 storage would only add a per-step dequant cast.
            # Int8-stored CrossKVPacked (the XLA path's layout) is
            # dequantized here, outside the kernel.
            if int8_kv:
                k_l = (cross.k[l].astype(jnp.float32) * cross.k_scale[l][..., None]).astype(dt)
                v_l = (cross.v[l].astype(jnp.float32) * cross.v_scale[l][:, None, :]).astype(dt)
            else:
                k_l, v_l = cross.k[l].astype(dt), cross.v[l].astype(dt)
            crosses.append((k_l, v_l))
        sa, ca, mlp_p = lp["self_attn"], lp["cross_attn"], lp["mlp"]
        wq, sq, bq = _dense_int8_or(sa["q"], dt)
        wk, sk, bk = _dense_int8_or(sa["k"], dt)
        wv, sv, bv = _dense_int8_or(sa["v"], dt)
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        sqkv = jnp.concatenate([sq, sk, sv])
        bqkv = jnp.concatenate([bq, bk, bv])
        wo, so, bo = _dense_int8_or(sa["o"], dt)
        cwq, csq, cbq = _dense_int8_or(ca["q"], dt)
        cwo, cso, cbo = _dense_int8_or(ca["o"], dt)
        w1, s1, b1 = _dense_int8_or(mlp_p["fc1"], dt)
        w2, s2, b2 = _dense_int8_or(mlp_p["fc2"], dt)
        layer_ws.append(
            (
                wqkv, sqkv, bqkv, wo, so, bo,
                lp["self_ln"]["scale"].astype(jnp.float32),
                lp["self_ln"]["bias"].astype(jnp.float32),
                cwq, csq, cbq, cwo, cso, cbo,
                lp["cross_ln"]["scale"].astype(jnp.float32),
                lp["cross_ln"]["bias"].astype(jnp.float32),
                w1, s1, b1, w2, s2, b2,
                lp["mlp_ln"]["scale"].astype(jnp.float32),
                lp["mlp_ln"]["bias"].astype(jnp.float32),
            )
        )

    final_ln = None
    if fuse_kv and enc_final_ln is not None:
        final_ln = (
            enc_final_ln["scale"].astype(jnp.float32),
            enc_final_ln["bias"].astype(jnp.float32),
        )
    tokens_bt, lengths_b1 = _loop_call(
        commons, tuple(crosses), tuple(layer_ws),
        batch=batch, steps=steps, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps, s_valid=s_enc,
        bos=cfg.bos_token_id, eos=cfg.eos_token_id,
        pad=cfg.pad_token_id, dt=dt, int8_w=int8_w,
        group=group, gelu_mode=gelu_mode, interpret=interpret, ablate=ablate,
        vocab_tile=vocab_tile, fuse_kv=fuse_kv, enc=enc_raw,
        final_ln=final_ln, cross_ws=tuple(cross_ws),
        chains=chains, head_phased=head_phased,
        stops=None
        if stop_lengths is None
        else jnp.asarray(stop_lengths, jnp.int32).reshape(batch, 1),
    )
    return tokens_bt, lengths_b1[:, 0]
