"""AOT executable store: compile once, reuse across processes *reliably*.

The persistent XLA compilation cache is the first line of defense against
the multi-minute Mosaic compiles of the big Pallas-bearing programs — but
its keys are unstable across time on the tunneled runtime (docs/PERF.md
round 3: identical modules, distinct keys over ~2 h), so fresh processes
routinely pay the ~19-min decode-mega-kernel compile again.  This store
sidesteps the cache key entirely with
``jax.experimental.serialize_executable``: after a successful compile the
*executable* is serialized to disk under a fingerprint of the lowered
program (lowering costs seconds; only the backend compile is minutes),
and any later process deserializes it directly.

Staleness is impossible by construction: the fingerprint hashes the
lowered MLIR text plus the jax/jaxlib versions and backend identity, so a
code or toolchain change produces a different key and falls back to a
real compile (which then refreshes the store).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

DEFAULT_DIR = os.path.expanduser("~/.cache/manga_ocr_tpu/aot")


def _fingerprint(traced) -> str:
    """Hash of the traced computation (jaxpr text) + toolchain + device
    set.  NOT the lowered MLIR text: that was observed to drift between
    runs with identical model code (round-4 finding — a stored executable
    stopped matching within the hour), while the jaxpr is the actual
    program semantics and reproduces bit-for-bit across processes."""
    import jax
    import jaxlib

    h = hashlib.sha256()
    h.update(str(traced.jaxpr).encode())
    h.update(jax.__version__.encode())
    h.update(getattr(jaxlib, "__version__", "?").encode())
    h.update(jax.default_backend().encode())
    h.update(",".join(str(d) for d in jax.devices()).encode())
    return h.hexdigest()[:20]


def stored(fn, args, name: str, store_dir: str | None = None) -> bool:
    """True when a serialized executable for ``fn(*args)`` exists — lets a
    budget-limited caller decide whether attempting this program risks a
    multi-minute cold compile (lowering for the fingerprint costs
    seconds)."""
    store = store_dir or os.environ.get("MANGA_OCR_TPU_AOT_DIR", DEFAULT_DIR)
    try:
        fp = _fingerprint(fn.trace(*args))
    except Exception:
        return False
    return os.path.exists(os.path.join(store, f"{name}-{fp}.aot"))


def load_or_compile(fn, args, name: str, store_dir: str | None = None, note=None):
    """Return a compiled executable for ``fn(*args)``, from the store when
    a matching serialized executable exists, else by compiling (and then
    populating the store).  ``fn`` must be a ``jax.jit``-wrapped callable;
    the result is invoked exactly like ``fn``.

    Failures at every stage degrade to a normal compile — the store is a
    pure accelerator, never a correctness dependency."""
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    say = note or (lambda _msg: None)
    store = store_dir or os.environ.get("MANGA_OCR_TPU_AOT_DIR", DEFAULT_DIR)
    traced = fn.trace(*args)
    fp = _fingerprint(traced)
    path = os.path.join(store, f"{name}-{fp}.aot")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            # Validation call: deserialization binds to the process's
            # current device set, which can mismatch the compile-time one
            # (e.g. a multi-device virtual mesh) in ways only execution
            # reveals — a store hit must never crash the caller later.
            compiled(*args)
            say(f"aot: loaded {name} ({fp}) from store")
            return compiled
        except Exception as e:  # corrupt/incompatible blob: recompile
            say(f"aot: stored {name} unusable ({type(e).__name__}: {e}); recompiling")
    compiled = traced.lower().compile()
    try:
        os.makedirs(store, exist_ok=True)
        payload, in_tree, out_tree = serialize(compiled)
        fd, tmp = tempfile.mkstemp(dir=store, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        say(f"aot: saved {name} ({fp}, {os.path.getsize(path)} bytes)")
    except Exception as e:
        say(f"aot: could not save {name}: {type(e).__name__}: {e}")
    return compiled
