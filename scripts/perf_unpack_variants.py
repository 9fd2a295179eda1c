"""Device-side unpack formulations for the packed wire format.

The element-granular gather (flat[off + clip(i)*w + clip(j)]) measured
34 ms for a [256, 128, 128] batch — XLA lowers millions of independent
uint8 indices to scalar-unit work, erasing the ~30% wire saving.  Probe
cheaper formulations:

  a) element gather (baseline, known bad)
  b) take_along_axis on per-crop over-read segments
  c) ROW gather from a row-packed layout [H_total, bw] (heights tight,
     widths padded host-side): one index per 128-byte row — 128x fewer
     gather units, lane-aligned rows.

Usage: python scripts/perf_unpack_variants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.utils import jax_cache

jax_cache.enable()

B, BH, BW = 256, 128, 128
rng = np.random.default_rng(0)
H = rng.integers(96, 127, size=B).astype(np.int32)
W = rng.integers(80, 120, size=B).astype(np.int32)
SIZES = jnp.asarray(np.stack([H, W], 1))

# element-packed flat
eoffs = np.zeros(B, np.int64)
tot = 0
for b in range(B):
    eoffs[b] = tot
    tot += int(H[b] * W[b])
EFLAT = jnp.asarray(rng.integers(0, 256, size=tot).astype(np.uint8))
EOFFS = jnp.asarray(eoffs.astype(np.int32))

# row-packed flat [H_total, BW]
roffs = np.zeros(B, np.int64)
rt = 0
for b in range(B):
    roffs[b] = rt
    rt += int(H[b])
RFLAT = jnp.asarray(rng.integers(0, 256, size=(rt, BW)).astype(np.uint8))
ROFFS = jnp.asarray(roffs.astype(np.int32))


def elem_gather(flat, sizes, offs):
    h = sizes[:, 0][:, None, None]
    w = sizes[:, 1][:, None, None]
    i = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (B, BH, BW), 1), h - 1)
    j = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (B, BH, BW), 2), w - 1)
    idx = offs[:, None, None] + i * w + j
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(B, BH, BW)


def seg_taa(flat, sizes, offs):
    segs = jax.vmap(
        lambda o: jax.lax.dynamic_slice(flat, (jnp.minimum(o, flat.shape[0] - BH * BW),), (BH * BW,))
    )(offs)
    h = sizes[:, 0][:, None, None]
    w = sizes[:, 1][:, None, None]
    i = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (B, BH, BW), 1), h - 1)
    j = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (B, BH, BW), 2), w - 1)
    # NB: over-read segments are only valid because offs are clamped; the
    # tail crop reads junk past its extent that the clip keeps in-bounds of
    # the segment, not of the crop — fine for a PERF probe only.
    idx = (i * w + j).reshape(B, BH * BW)
    return jnp.take_along_axis(segs, idx, axis=1).reshape(B, BH, BW)


def row_gather(flat2d, sizes, roffs):
    h = sizes[:, 0][:, None]
    i = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (B, BH), 1), h - 1)
    ridx = roffs[:, None] + i
    return jnp.take(flat2d, ridx.reshape(-1), axis=0).reshape(B, BH, BW)


def slope(make_step, *args):
    def scan_n(n):
        @jax.jit
        def f(a0, *rest):
            def step(c, _):
                out = make_step(c, a0, *rest)
                return out, None

            c, _ = jax.lax.scan(step, jnp.int32(0), None, length=n)
            return c

        return f

    t = {}
    for n in (2, 10):
        fn = scan_n(n)
        _ = int(fn(*args))
        t0 = time.perf_counter()
        for _ in range(4):
            _ = int(fn(*args))
        t[n] = (time.perf_counter() - t0) / 4
    return (t[10] - t[2]) / 8 * 1e3


def main():
    # carry chained through a one-byte write so XLA cannot hoist the body
    def estep(c, flat, sizes, offs):
        f2 = flat.at[0].set(c.astype(jnp.uint8))
        u = elem_gather(f2, sizes, offs)
        return (c + jnp.sum(u[:1, :8].astype(jnp.int32))) & 0xFF

    def sstep(c, flat, sizes, offs):
        f2 = flat.at[0].set(c.astype(jnp.uint8))
        u = seg_taa(f2, sizes, offs)
        return (c + jnp.sum(u[:1, :8].astype(jnp.int32))) & 0xFF

    def rstep(c, flat2d, sizes, roffs):
        f2 = flat2d.at[0, 0].set(c.astype(jnp.uint8))
        u = row_gather(f2, sizes, roffs)
        return (c + jnp.sum(u[:1, :8].astype(jnp.int32))) & 0xFF

    print(f"row-packed wire: {RFLAT.size/1e6:.2f} MB vs padded {B*BH*BW/1e6:.2f} MB "
          f"vs element-packed {EFLAT.size/1e6:.2f} MB", flush=True)
    for name, step, args in (
        ("row_gather ", rstep, (RFLAT, SIZES, ROFFS)),
        ("seg_taa    ", sstep, (EFLAT, SIZES, EOFFS)),
        ("elem_gather", estep, (EFLAT, SIZES, EOFFS)),
    ):
        try:
            ms = slope(step, *args)
            print(f"{name}: {ms:8.3f} ms per [{B},{BH},{BW}] unpack", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
