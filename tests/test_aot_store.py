"""AOT executable store tests (utils/aot_store.py): serialized compiled
executables reused across processes, with fingerprint-guarded staleness
and execution-validated loads.  The store exists because the persistent
XLA cache's keys are unstable across time on the tunneled runtime
(docs/PERF.md round 3), so production cold-starts and bench runs were
paying multi-minute Pallas recompiles; the cross-process mechanism is
validated on the real chip by scripts/perf_aot_probe.py.

NB: the pytest session runs on an 8-virtual-device backend, where
deserialization binds executables to all 8 devices and the validation
call rejects them — exactly the degrade-to-recompile path one of these
tests pins down.  The true load path runs in a 1-device subprocess."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_ocr_tpu.utils import aot_store

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ONE_DEVICE_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys, os
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from manga_ocr_tpu.utils import aot_store

msgs = []
fn = jax.jit(lambda a, b: (a @ b).sum(axis=0))
args = (jnp.ones((8, 8)), jnp.arange(32, dtype=jnp.float32).reshape(8, 4))
c1 = aot_store.load_or_compile(fn, args, "probe", note=msgs.append)
assert msgs[-1].startswith("aot: saved probe"), msgs
c2 = aot_store.load_or_compile(fn, args, "probe", note=msgs.append)
assert msgs[-1].startswith("aot: loaded probe"), msgs
np.testing.assert_array_equal(np.asarray(c1(*args)), np.asarray(c2(*args)))

# a DIFFERENT program under the same name gets a different fingerprint
# file — a stale executable can never be silently loaded
fn2 = jax.jit(lambda a, b: (a @ b).sum(axis=1))
c3 = aot_store.load_or_compile(fn2, args, "probe", note=msgs.append)
assert msgs[-1].startswith("aot: saved probe"), msgs
files = [f for f in os.listdir(os.environ["MANGA_OCR_TPU_AOT_DIR"]) if f.endswith(".aot")]
assert len(files) == 2, files

# the SAME program under a DIFFERENT name loads the existing blob via the
# fingerprint (the fingerprint is the program identity, the name a label)
c4 = aot_store.load_or_compile(fn, args, "other-label", note=msgs.append)
assert msgs[-1].startswith("aot: loaded other-label"), msgs
assert "via probe-" in msgs[-1], msgs
np.testing.assert_array_equal(np.asarray(c1(*args)), np.asarray(c4(*args)))
print("ONE_DEVICE_OK")
"""


def test_store_roundtrip_single_device(tmp_path):
    """Save → load → exact outputs, plus fingerprint separation, in a
    1-device process (the deployment shape: one chip per process)."""
    script = tmp_path / "probe.py"
    script.write_text(_ONE_DEVICE_SCRIPT.format(repo=REPO))
    env = dict(os.environ)
    env["MANGA_OCR_TPU_AOT_DIR"] = str(tmp_path / "store")
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, env=env,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ONE_DEVICE_OK" in proc.stdout


def test_corrupt_store_entry_recompiles(tmp_path, monkeypatch):
    """A blob without the format magic (garbage, or a prior-format file)
    is treated as absent: ``stored`` says False and ``load_or_compile``
    recompiles (and re-banks) without ever unpickling it."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    msgs = []
    fn = jax.jit(lambda a: a * 2)
    args = (jnp.ones((4,)),)
    aot_store.load_or_compile(fn, args, "x", note=msgs.append)
    (path,) = [tmp_path / f for f in os.listdir(tmp_path) if f.endswith(".aot")]
    path.write_bytes(b"garbage")
    assert aot_store.stored(fn, args, "x") is False
    c = aot_store.load_or_compile(fn, args, "x", note=msgs.append)
    assert msgs[-1].startswith("aot: saved x"), msgs  # re-banked
    assert aot_store.stored(fn, args, "x") is True
    np.testing.assert_array_equal(np.asarray(c(*args)), np.full((4,), 2.0))


def test_same_fingerprint_visible_across_names(tmp_path, monkeypatch):
    """The fingerprint IS the program identity: ``stored`` under a
    different name sees a blob banked under another (e.g. the bench
    rung-2 program and the trained fixed-32 program are the same jaxpr).
    The LOAD half of cross-name sharing runs in the 1-device subprocess
    test (this backend's 8-virtual-device shards reject deserialized
    executables — the documented degrade path)."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    msgs = []
    fn = jax.jit(lambda a: a + 1)
    args = (jnp.ones((4,)),)
    aot_store.load_or_compile(fn, args, "first-name", note=msgs.append)
    assert msgs[-1].startswith("aot: saved first-name")
    assert aot_store.stored(fn, args, "second-name") is True
    c = aot_store.load_or_compile(fn, args, "second-name", note=msgs.append)
    np.testing.assert_array_equal(np.asarray(c(*args)), np.full((4,), 2.0))


def test_fingerprint_distinguishes_closure_constants(tmp_path, monkeypatch):
    """Two programs identical in structure but with different baked
    constants print identical jaxprs; the fingerprint must hash the const
    VALUES or a stored executable with OLD constants is silently served
    (ADVICE r4 — e.g. the bench's closed-over stop-length table)."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    args = (jnp.ones((4,)),)

    def make(const_vec):
        c = np.asarray(const_vec, np.float32)
        return jax.jit(lambda a: a + c)

    fp1 = aot_store._fingerprint(make([1, 2, 3, 4]).trace(*args))
    fp2 = aot_store._fingerprint(make([9, 9, 9, 9]).trace(*args))
    assert fp1 != fp2
    # and the behavioral end-to-end: the second program must NOT load the
    # first one's executable
    msgs = []
    c1 = aot_store.load_or_compile(make([1, 2, 3, 4]), args, "c", note=msgs.append)
    c2 = aot_store.load_or_compile(make([9, 9, 9, 9]), args, "c", note=msgs.append)
    np.testing.assert_array_equal(np.asarray(c1(*args)), [2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(c2(*args)), [10, 10, 10, 10])
    assert sum(m.startswith("aot: saved c") for m in msgs) == 2, msgs


def test_eviction_keeps_newest_per_name(tmp_path, monkeypatch):
    """The store is bounded: only the KEEP_PER_NAME most-recent blobs per
    program name survive; other names are untouched (VERDICT r4 #6)."""
    import time as _time

    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    args = (jnp.ones((4,)),)
    for i in range(aot_store.KEEP_PER_NAME + 3):
        c = np.full(4, float(i), np.float32)
        aot_store.load_or_compile(jax.jit(lambda a, c=c: a + c), args, "ev")
        _time.sleep(0.01)  # distinct mtimes for deterministic LRU order
    aot_store.load_or_compile(jax.jit(lambda a: a * 3), args, "other")
    ev = sorted(f for f in os.listdir(tmp_path) if f.startswith("ev-"))
    other = [f for f in os.listdir(tmp_path) if f.startswith("other-")]
    assert len(ev) == aot_store.KEEP_PER_NAME, ev
    assert len(other) == 1
    # the newest program must be among the survivors (reload hits)
    msgs = []
    c = np.full(4, float(aot_store.KEEP_PER_NAME + 2), np.float32)
    aot_store.load_or_compile(
        jax.jit(lambda a, c=c: a + c), args, "ev", note=msgs.append
    )
    assert msgs and ("loaded ev" in msgs[-1] or "unusable" in msgs[0]), msgs


def test_blob_integrity_hash_rejects_tampering(tmp_path, monkeypatch):
    """A bit-flipped body fails the sha256 header check BEFORE any
    unpickling happens, and the store degrades to a recompile."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    msgs = []
    fn = jax.jit(lambda a: a - 1)
    args = (jnp.ones((4,)),)
    aot_store.load_or_compile(fn, args, "t", note=msgs.append)
    (path,) = [tmp_path / f for f in os.listdir(tmp_path) if f.endswith(".aot")]
    raw = bytearray(path.read_bytes())
    raw[-1] ^= 0xFF
    path.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="integrity"):
        aot_store._read_blob(str(path))
    c = aot_store.load_or_compile(fn, args, "t", note=msgs.append)
    assert any("unusable" in m for m in msgs)
    np.testing.assert_array_equal(np.asarray(c(*args)), np.zeros(4))


def test_incompatible_device_set_degrades_to_recompile(tmp_path, monkeypatch):
    """On this 8-virtual-device backend a stored 1-device-style executable
    fails the validation call; the store must degrade to a working compile,
    never surface the failure to the caller."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    msgs = []
    fn = jax.jit(lambda a, b: (a @ b).sum(axis=0))
    args = (jnp.ones((8, 8)), jnp.arange(32, dtype=jnp.float32).reshape(8, 4))
    c1 = aot_store.load_or_compile(fn, args, "p", note=msgs.append)
    c2 = aot_store.load_or_compile(fn, args, "p", note=msgs.append)
    # either the load validated fine (8-device serialize round-trips) or it
    # degraded to a recompile — both must yield a working executable
    np.testing.assert_array_equal(np.asarray(c1(*args)), np.asarray(c2(*args)))


def test_engine_aot_parity(tmp_path, monkeypatch):
    """aot=True engine produces the same texts as aot=False and populates
    the store (load-vs-recompile depends on the backend's device set; both
    are valid here — the parity and the store write are the contract)."""
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    tok = CharTokenizer.synthetic()
    rng = np.random.default_rng(0)
    crops = [
        rng.integers(0, 256, size=(40, 60, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(30, 30, 3)).astype(np.uint8),
    ]

    plain = TpuMangaOcrEngine(params, cfg, tok, max_length=8, dtype=jnp.float32)
    eng1 = TpuMangaOcrEngine(
        params, cfg, tok, max_length=8, dtype=jnp.float32, aot=True
    )
    assert eng1.ocr_page(crops) == plain.ocr_page(crops)
    assert [f for f in os.listdir(tmp_path) if f.endswith(".aot")], (
        "aot engine did not populate the store"
    )
    eng2 = TpuMangaOcrEngine(
        params, cfg, tok, max_length=8, dtype=jnp.float32, aot=True
    )
    assert eng2.ocr_page(crops) == plain.ocr_page(crops)


def test_engine_aot_mesh_is_disabled():
    """shard_map executables are not serialized: aot silently stays off
    under a mesh (the flag is a pure accelerator)."""
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.parallel import mesh as meshlib

    cfg = MangaOCRConfig.tiny()
    eng = TpuMangaOcrEngine(
        mdl.init_params(cfg, jax.random.PRNGKey(0)),
        cfg,
        CharTokenizer.synthetic(),
        max_length=8,
        dtype=jnp.float32,
        mesh=meshlib.make_mesh(8, 1),
        aot=True,
    )
    assert eng._aot is False
