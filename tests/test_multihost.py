"""Multi-host mesh tests: two REAL processes form one global mesh over the
distributed runtime (Gloo on CPU — the same ``jax.distributed`` plane a
TPU pod slice uses over DCN) and run the batched OCR forward with each
host contributing its local shard.  Output must equal the single-process
run bit-for-bit: the forward is per-sample independent, so data-axis
sharding across hosts may not change a single token.

SURVEY §5.8 names DCN/multi-host as the layer above single-host ICI
sharding; this is that layer, tested for real (not simulated devices).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
pid, port = int(sys.argv[1]), sys.argv[2]
from manga_ocr_tpu.parallel import multihost as mh
mh.initialize(f"localhost:{{port}}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
import numpy as np
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig

mesh = mh.make_global_mesh()
assert dict(mesh.shape) == {{"data": 2, "model": 1}}, mesh.shape
cfg = MangaOCRConfig.tiny()
params = mdl.init_params(cfg, jax.random.PRNGKey(0))  # same seed everywhere
local = np.random.default_rng(100 + pid).normal(size=(2, 32, 32, 3)).astype(np.float32)
px = mh.global_batch(local, mesh)
assert px.shape == (4, 32, 32, 3)
out = mdl.make_jitted_ocr(cfg, max_length=8)(params, px)
tokens = mh.gather_to_hosts(out.tokens)
lengths = mh.gather_to_hosts(out.lengths)

# One TRAIN step over the global mesh: the gradient mean over the global
# batch is a cross-host all-reduce (Gloo here; DCN on a pod).
from manga_ocr_tpu import train as trainlib
opt = trainlib.make_optimizer()
opt_state = opt.init(params)
step = trainlib.make_train_step(cfg, opt, mesh)
tok_rng = np.random.default_rng(7)
tok_all = tok_rng.integers(4, cfg.decoder.vocab_size, size=(4, 8)).astype(np.int32)
tok_all[:, 0] = cfg.decoder.bos_token_id
batch = trainlib.TrainBatch(
    pixel_values=px,
    tokens=mh.global_batch(tok_all[2 * pid : 2 * pid + 2], mesh),
    loss_mask=mh.global_batch(np.ones((2, 8), np.float32), mesh),
)
_, _, loss = step(params, opt_state, batch)
mh.sync("done")
print("RESULT " + json.dumps(
    {{"pid": pid, "tokens": tokens.tolist(), "lengths": lengths.tolist(),
      "loss": float(loss)}}
), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    port = _free_port()
    env = dict(os.environ)
    # the pytest session's 8-virtual-device flag (tests/conftest.py) must
    # NOT leak into the workers: each host contributes exactly 1 device
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                d = json.loads(line[len("RESULT "):])
                results[d["pid"]] = d
    assert set(results) == {0, 1}

    # both hosts gathered identical global results
    np.testing.assert_array_equal(results[0]["tokens"], results[1]["tokens"])
    np.testing.assert_array_equal(results[0]["lengths"], results[1]["lengths"])

    # and they equal the single-process computation on the same global batch
    import jax

    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    full = np.concatenate(
        [
            np.random.default_rng(100).normal(size=(2, 32, 32, 3)),
            np.random.default_rng(101).normal(size=(2, 32, 32, 3)),
        ]
    ).astype(np.float32)
    ref = mdl.make_jitted_ocr(cfg, max_length=8)(params, jax.numpy.asarray(full))
    np.testing.assert_array_equal(np.asarray(results[0]["tokens"]), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(results[0]["lengths"]), np.asarray(ref.lengths)
    )

    # the cross-host train step agrees across hosts and with the
    # single-process loss on the same global batch (all-reduce tolerance)
    assert results[0]["loss"] == results[1]["loss"]
    from manga_ocr_tpu import train as trainlib

    opt = trainlib.make_optimizer()
    tok_rng = np.random.default_rng(7)
    tok_all = tok_rng.integers(4, cfg.decoder.vocab_size, size=(4, 8)).astype(np.int32)
    tok_all[:, 0] = cfg.decoder.bos_token_id
    batch = trainlib.TrainBatch(
        pixel_values=jax.numpy.asarray(full),
        tokens=jax.numpy.asarray(tok_all),
        loss_mask=jax.numpy.asarray(np.ones((4, 8), np.float32)),
    )
    step = trainlib.make_train_step(cfg, opt)
    _, _, ref_loss = step(params, opt.init(params), batch)
    np.testing.assert_allclose(results[0]["loss"], float(ref_loss), rtol=2e-5)


def test_make_global_mesh_validation():
    from manga_ocr_tpu.parallel import multihost as mh

    with pytest.raises(ValueError, match="do not divide"):
        mh.make_global_mesh(n_model=3)
    # model axis larger than the local device count must be rejected
    # (tensor-parallel shards crossing hosts would put TP traffic on DCN)
    n = len(__import__("jax").devices())
    if n >= 2:
        mesh = mh.make_global_mesh(n_model=2)
        assert dict(mesh.shape)["model"] == 2


def test_make_global_mesh_rejects_cross_host_model_shard():
    """Globally-divisible but per-host-indivisible device sets must be
    rejected, not silently reshaped across host boundaries (ADVICE r4:
    4+2 devices with n_model=3 would straddle a TP shard over DCN)."""
    from manga_ocr_tpu.parallel import multihost as mh

    class FakeDev:
        def __init__(self, pid):
            self.process_index = pid

    devs = [FakeDev(0)] * 4 + [FakeDev(1)] * 2
    with pytest.raises(ValueError, match="not divisible"):
        mh.make_global_mesh(n_model=3, devices=devs)
