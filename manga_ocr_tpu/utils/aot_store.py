"""AOT executable store: compile once, reuse across processes *reliably*.

The persistent XLA compilation cache is the first line of defense against
the multi-minute Mosaic compiles of the big Pallas-bearing programs — but
its keys are unstable across time on the tunneled runtime (docs/PERF.md
round 3: identical modules, distinct keys over ~2 h), so fresh processes
routinely pay the ~19-min decode-mega-kernel compile again.  This store
sidesteps the cache key entirely with
``jax.experimental.serialize_executable``: after a successful compile the
*executable* is serialized to disk under a fingerprint of the traced
program (tracing costs seconds; only the backend compile is minutes),
and any later process deserializes it directly.

Staleness is impossible by construction: the fingerprint hashes the traced
jaxpr text AND the values of its closure-captured constants, plus the
jax/jaxlib versions and backend identity, so a code, constant, or
toolchain change produces a different key and falls back to a real compile
(which then refreshes the store).  (NOT the lowered MLIR text: that was
observed to drift between runs with identical model code — round-4
finding.)

Security note: deserialization ultimately runs through JAX's executable
unpickler, so the store directory must be trusted — it defaults to a
per-user cache dir created with mode 0700, blobs are integrity-hashed
(detects corruption and casual tampering), and an attacker-writable
``MANGA_OCR_TPU_AOT_DIR`` must simply not be configured.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

import numpy as np

DEFAULT_DIR = os.path.expanduser("~/.cache/manga_ocr_tpu/aot")

# Magic prefixing every blob; bump when the on-disk layout changes (old
# files then fail the header check and degrade to a recompile).
_MAGIC = b"MOCRAOT2"

# Keep the newest N blobs per program name: code/toolchain churn strands
# ~20 MB executables forever otherwise (VERDICT r4).  A handful per name
# covers the shapes a process legitimately alternates between.
KEEP_PER_NAME = 4


def _fingerprint(traced) -> str:
    """Hash of the traced computation (jaxpr text + the VALUES of its
    closure-captured constants) + toolchain + device set.  Consts matter:
    two programs identical in structure but with different baked arrays
    (e.g. a closed-over stop-length table) print identical jaxprs, and a
    collision would silently serve stale behavior (ADVICE r4)."""
    import jax
    import jaxlib

    h = hashlib.sha256()
    h.update(str(traced.jaxpr).encode())
    for const in getattr(traced.jaxpr, "consts", ()):
        try:
            arr = np.asarray(const)
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
        except Exception:
            h.update(repr(const).encode())
    h.update(jax.__version__.encode())
    h.update(getattr(jaxlib, "__version__", "?").encode())
    h.update(jax.default_backend().encode())
    h.update(",".join(str(d) for d in jax.devices()).encode())
    return h.hexdigest()[:20]


def _store_dir(store_dir: str | None) -> str:
    return store_dir or os.environ.get("MANGA_OCR_TPU_AOT_DIR", DEFAULT_DIR)


def _evict(store: str, name: str, keep: int = KEEP_PER_NAME) -> None:
    """Drop all but the ``keep`` most-recent blobs for ``name`` (by mtime).
    Best-effort: eviction must never break the caller."""
    try:
        blobs = []
        for fname in os.listdir(store):
            if fname.startswith(f"{name}-") and fname.endswith(".aot"):
                p = os.path.join(store, fname)
                blobs.append((os.path.getmtime(p), p))
        blobs.sort(reverse=True)
        for _, p in blobs[keep:]:
            os.unlink(p)
    except OSError:
        pass


def _candidates(store: str, name: str, fp: str) -> list[str]:
    """Blob paths for this program: the exact name first, then any blob
    with the SAME fingerprint under another name (the fingerprint IS the
    program identity — two callers labeling the identical jaxpr
    differently, e.g. ``bench-serving-b256`` and ``trained-eos32-b256``,
    share one compile).  Only current-format blobs count."""
    paths = []
    exact = os.path.join(store, f"{name}-{fp}.aot")
    try:
        names = os.listdir(store)
    except OSError:
        names = []
    for fname in sorted(names):
        if fname.endswith(f"-{fp}.aot"):
            paths.append(os.path.join(store, fname))
    if exact in paths:
        paths.remove(exact)
        paths.insert(0, exact)
    valid = []
    for p in paths:
        try:
            with open(p, "rb") as f:
                if f.read(len(_MAGIC)) == _MAGIC:
                    valid.append(p)
        except OSError:
            pass
    return valid


def stored(fn, args, name: str, store_dir: str | None = None) -> bool:
    """True when a LOADABLE serialized executable for ``fn(*args)`` exists
    — lets a budget-limited caller decide whether attempting this program
    risks a multi-minute cold compile (tracing for the fingerprint costs
    seconds).  Checks the format header, not bare file existence: a
    prior-format blob would fail at load time and the caller would walk
    into the cold compile it was promised to avoid."""
    store = _store_dir(store_dir)
    try:
        fp = _fingerprint(fn.trace(*args))
    except Exception:
        return False
    return bool(_candidates(store, name, fp))


def _read_blob(path: str):
    """Header-checked read: magic + sha256(body) + body.  Raises on any
    mismatch (corruption, tampering, old format) — caller recompiles."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError("unknown blob format")
        digest = f.read(32)
        body = f.read()
    if hashlib.sha256(body).digest() != digest:
        raise ValueError("blob integrity hash mismatch")
    return pickle.loads(body)


def _write_blob(store: str, path: str, obj) -> None:
    body = pickle.dumps(obj)
    fd, tmp = tempfile.mkstemp(dir=store, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(_MAGIC)
        f.write(hashlib.sha256(body).digest())
        f.write(body)
    os.replace(tmp, path)


def load_or_compile(fn, args, name: str, store_dir: str | None = None, note=None):
    """Return a compiled executable for ``fn(*args)``, from the store when
    a matching serialized executable exists, else by compiling (and then
    populating the store).  ``fn`` must be a ``jax.jit``-wrapped callable;
    the result is invoked exactly like ``fn``.

    Failures at every stage degrade to a normal compile — the store is a
    pure accelerator, never a correctness dependency."""
    import jax
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    say = note or (lambda _msg: None)
    store = _store_dir(store_dir)
    traced = fn.trace(*args)
    fp = _fingerprint(traced)
    path = os.path.join(store, f"{name}-{fp}.aot")
    for cand in _candidates(store, name, fp):
        try:
            payload, in_tree, out_tree = _read_blob(cand)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            # Validation call: deserialization binds to the process's
            # current device set, which can mismatch the compile-time one
            # (e.g. a multi-device virtual mesh) in ways only execution
            # reveals — a store hit must never crash the caller later.
            # Deliberately runs on the caller's args: they are already
            # device-resident, the result is discarded, and the cost is
            # one execution (~ms at serving shapes) against the
            # multi-minute compile a hit avoids.  Zero-filled dummy args
            # were tried and MEASURED catastrophic on this runtime: the
            # per-leaf jnp.zeros programs (~150 distinct param shapes)
            # each round-trip the remote compile service in a fresh
            # process — ~500 s before the first real dispatch
            # (docs/PERF.md round 5).  The readback of one output leaf is
            # what makes this a validation at all: dispatch is async, so
            # without it a blob whose execution errors (or never
            # completes) would "pass" and fail in the caller instead.
            out = compiled(*args)
            leaves = [
                x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "shape")
            ]
            if leaves:
                np.asarray(leaves[0])
            os.utime(cand)  # refresh mtime: LRU eviction keys on it
            say(f"aot: loaded {name} ({fp}) from store"
                + ("" if cand == path else f" (via {os.path.basename(cand)})"))
            return compiled
        except Exception as e:  # corrupt/incompatible blob: try the next
            say(f"aot: stored {name} unusable ({type(e).__name__}: {e}); "
                "recompiling")
    compiled = traced.lower().compile()
    try:
        os.makedirs(store, mode=0o700, exist_ok=True)
        payload, in_tree, out_tree = serialize(compiled)
        _write_blob(store, path, (payload, in_tree, out_tree))
        say(f"aot: saved {name} ({fp}, {os.path.getsize(path)} bytes)")
        _evict(store, name)
    except Exception as e:
        say(f"aot: could not save {name}: {type(e).__name__}: {e}")
    return compiled
