"""Multi-host (multi-process) mesh support — the DCN-scale story.

The reference is a single desktop process (SURVEY §5.8: no distributed
backend at all); single-host multi-chip is covered by ``parallel.mesh``
(batch sharding over ICI).  This module adds the layer above: N hosts,
each with its own local devices, forming ONE global mesh — TPU pod slices
over DCN, or multi-process CPU (Gloo) in tests.  Everything rides JAX's
runtime: ``jax.distributed`` for the coordination plane, XLA-inserted
collectives for data movement; nothing is hand-rolled.

Deployment shape (one process per host):

    from manga_ocr_tpu.parallel import multihost as mh
    mh.initialize()                        # env-driven on TPU pods
    mesh = mh.make_global_mesh(n_model=1)  # all hosts' devices, data-major
    batch = mh.global_batch(local_crops, mesh)   # host-local shard in
    out = jitted_fn(params, batch)               # SPMD across hosts
    tokens = mh.gather_to_hosts(out.tokens)      # replicated readback

Cited reference behavior being scaled out: the per-page crop fan-out the
GUI runs on 15 local threads (``/root/reference/src/ui/
main_window.py:4317-4335``) becomes a global-batch dispatch where every
host contributes its local pages.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from manga_ocr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the distributed runtime (idempotent).

    On TPU pod slices all three arguments are discovered from the
    environment — call with no args.  For manual/CPU clusters pass them
    explicitly or via JAX's standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)."""
    # NB: only the client-handle check — jax.process_count() would itself
    # initialize the XLA backend, after which initialize() is rejected.
    if _initialized():
        return
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
        )
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = (
            num_processes
            if num_processes is not None
            else int(os.environ["JAX_NUM_PROCESSES"])
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = (
            process_id if process_id is not None else int(os.environ["JAX_PROCESS_ID"])
        )
    jax.distributed.initialize(**kwargs)


def _initialized() -> bool:
    # Prefer the public probe; fall back to the private client handle on
    # jax versions without it. Either must NOT initialize the XLA backend.
    probe = getattr(jax.distributed, "is_initialized", None)
    if probe is not None:
        return bool(probe())
    try:
        from jax._src.distributed import global_state
    except ImportError:  # private module moved: assume uninitialized
        return False
    return global_state.client is not None


def make_global_mesh(n_model: int = 1, devices: list | None = None):
    """A (data, model) mesh over EVERY process's devices.

    The model axis is kept within a host (tensor-parallel traffic stays on
    the fast local interconnect); the data axis spans hosts (per-batch
    collectives — there are none in serving, and in training one gradient
    all-reduce — ride DCN)."""
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1 or len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} global devices do not divide into model={n_model}"
        )
    # Build the device grid from per-process blocks, NOT a flat reshape of
    # jax.devices(): with e.g. 4 local devices and n_model=3 a flat
    # reshape would straddle one model shard across two hosts, silently
    # routing per-token collectives over DCN (ADVICE r4).  Each host's
    # block must itself divide into model groups.
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    rows = []
    for pid in sorted(by_proc):
        block = by_proc[pid]
        if len(block) % n_model:
            raise ValueError(
                f"process {pid} has {len(block)} devices, not divisible by "
                f"model={n_model}: tensor-parallel shards must not cross hosts"
            )
        rows.extend(
            block[i : i + n_model] for i in range(0, len(block), n_model)
        )
    return Mesh(np.asarray(rows, dtype=object), (DATA_AXIS, MODEL_AXIS))


def global_batch(local_array: np.ndarray, mesh):
    """Per-host local batch shard -> one global data-sharded jax.Array.

    Every process passes ITS rows; the global leading dim is the sum over
    processes.  This is the multi-host replacement for the single-host
    ``device_put(x, batch_sharding(mesh))`` (which cannot address other
    hosts' devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_array))


def gather_to_hosts(arr) -> np.ndarray:
    """Gather a (possibly sharded) array to every host as numpy — the
    result-readback path (token matrices are tiny next to pixels)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def sync(name: str = "barrier") -> None:
    """Cross-host barrier (e.g. around checkpoint writes)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
