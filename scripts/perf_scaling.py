"""Virtual-mesh weak-scaling measurement (VERDICT round-1 #7).

Runs the sharded batched inference path (``ocr_forward`` under a data-axis
``Mesh``) on 1/2/4/8 virtual CPU devices with a FIXED per-device batch.
On real chips ideal weak scaling keeps time/step flat; virtual CPU devices
all share the host's physical cores, so the achievable ideal here is
time ∝ devices — efficiency is therefore reported as (n x t1) / tn.
Values near (or above) 1.0 mean the shardings introduce no hidden
cross-device serialization or collective overhead beyond the shared-core
compute itself.

Usage: python scripts/perf_scaling.py (forces an 8-device virtual CPU mesh)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.parallel import mesh as meshlib

PER_DEVICE_BATCH = 4


def main() -> None:
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    img = cfg.encoder.image_size
    fn = mdl.make_jitted_ocr(cfg, max_length=8, chunk_size=8)
    print(f"| devices | batch | ms/dispatch | crops/s | efficiency |")
    base = None
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
        sharded = meshlib.shard_params(params, mesh)
        b = PER_DEVICE_BATCH * n
        px = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (b, img, img, 3), jnp.float32),
            meshlib.batch_sharding(mesh),
        )
        np.asarray(fn(sharded, px).lengths)  # compile + warm
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = fn(sharded, px)
        np.asarray(out.lengths)
        dt = (time.perf_counter() - t0) / iters * 1e3
        if base is None:
            base = dt
        eff = (n * base) / dt  # shared-core ideal: time ∝ devices
        print(f"| {n} | {b} | {dt:.1f} | {b / dt * 1000:.0f} | {eff:.2f} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
