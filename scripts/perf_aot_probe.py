"""Probe: does AOT executable serialization survive process boundaries on
the axon runtime?

The persistent XLA cache's keys are unstable across time on this tunnel
(docs/PERF.md round 3: identical modules, distinct keys over ~2 h), so a
fresh bench run usually pays the ~19-min decode-mega-kernel Mosaic
compile.  ``jax.experimental.serialize_executable`` bypasses the cache
key entirely: serialize the *compiled executable* once, deserialize it in
any later process.  If this works here, the bench can pin the best
serving config without ever recompiling.

Phase 1 (--save): compile a Pallas-bearing program, serialize to disk,
run it, record outputs.  Phase 2 (--load, fresh process): deserialize,
run, compare outputs exactly.

Run:
    python scripts/perf_aot_probe.py --save
    python scripts/perf_aot_probe.py --load
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STORE = "/tmp/aot_probe"


def _fn_and_args():
    """A small program that includes a Pallas kernel (the class whose
    compiles are slow and whose cache keys drift)."""
    import jax
    import jax.numpy as jnp

    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig

    cfg = MangaOCRConfig.tiny()
    # tiny config with the serving kernel flags OFF (CPU-ish fast compile)
    # — the probe is about the MECHANISM, not this program's wall time
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
    )
    fn = jax.jit(lambda p, x: mdl.ocr_forward(p, x, cfg=cfg, max_length=12))
    return fn, (params, px)


def _fingerprint(lowered) -> str:
    """Stable identity of the lowered program: staleness guard for a saved
    executable (the lowering is seconds; only the backend compile is
    minutes)."""
    import hashlib

    return hashlib.sha256(lowered.as_text().encode()).hexdigest()[:16]


def save() -> None:
    import jax
    from jax.experimental.serialize_executable import serialize

    from manga_ocr_tpu.utils import jax_cache

    jax_cache.enable()
    fn, args = _fn_and_args()
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    print(f"lower: {time.perf_counter() - t0:.1f}s  fp={_fingerprint(lowered)}",
          flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    payload, in_tree, out_tree = serialize(compiled)
    os.makedirs(STORE, exist_ok=True)
    with open(f"{STORE}/exe.bin", "wb") as f:
        f.write(payload)
    with open(f"{STORE}/trees.pkl", "wb") as f:
        pickle.dump((in_tree, out_tree), f)
    out = compiled(*args)
    np.save(f"{STORE}/tokens.npy", np.asarray(out.tokens))
    print(f"saved {os.path.getsize(f'{STORE}/exe.bin')} bytes", flush=True)


def load() -> None:
    import jax
    from jax.experimental.serialize_executable import deserialize_and_load

    from manga_ocr_tpu.utils import jax_cache

    jax_cache.enable()
    fn, args = _fn_and_args()
    t0 = time.perf_counter()
    fp = _fingerprint(fn.lower(*args))
    print(f"lower+fp in fresh process: {time.perf_counter() - t0:.1f}s fp={fp}",
          flush=True)
    with open(f"{STORE}/exe.bin", "rb") as f:
        payload = f.read()
    with open(f"{STORE}/trees.pkl", "rb") as f:
        in_tree, out_tree = pickle.load(f)
    t0 = time.perf_counter()
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize: {time.perf_counter() - t0:.1f}s", flush=True)
    out = compiled(*args)
    ref = np.load(f"{STORE}/tokens.npy")
    got = np.asarray(out.tokens)
    assert np.array_equal(got, ref), "deserialized executable output differs"
    print("AOT round-trip OK: outputs exact", flush=True)


if __name__ == "__main__":
    if "--save" in sys.argv:
        save()
    elif "--load" in sys.argv:
        load()
    else:
        print("pass --save or --load", file=sys.stderr)
        raise SystemExit(2)
