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
    monkeypatch.setenv("MANGA_OCR_TPU_AOT_DIR", str(tmp_path))
    msgs = []
    fn = jax.jit(lambda a: a * 2)
    args = (jnp.ones((4,)),)
    aot_store.load_or_compile(fn, args, "x", note=msgs.append)
    (path,) = [tmp_path / f for f in os.listdir(tmp_path) if f.endswith(".aot")]
    path.write_bytes(b"garbage")
    c = aot_store.load_or_compile(fn, args, "x", note=msgs.append)
    assert any("unusable" in m for m in msgs)
    np.testing.assert_array_equal(np.asarray(c(*args)), np.full((4,), 2.0))


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
