"""Device mesh construction and sharding rules.

The reference's only parallelism is N Python worker threads each running the
whole per-crop pipeline (``/root/reference/src/ui/main_window.py:4317-4327``);
there is no distributed backend at all (SURVEY §2.7/§5.8).  The TPU-native
equivalent is SPMD over a ``jax.sharding.Mesh``:

- **data axis** — batch-of-crops data parallelism (the rebuild of the
  reference's thread pool: every crop of a page, sharded across chips,
  collectives riding ICI),
- **model axis** — tensor parallelism over attention heads / MLP hidden dim
  (not required at manga-ocr's ~110M params, but the kernels and shardings
  are written to scale).

All collectives are XLA-inserted from sharding annotations; nothing is
hand-rolled.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh.  Defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need <= 0:
        raise ValueError(f"mesh needs a positive device count, got {n_data}x{n_model}")
    if len(devices) < need:
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs {need} devices but only "
            f"{len(devices)} are visible; for a virtual mesh run under "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count={need}"
        )
    if len(devices) > need:
        devices = devices[:need]
    use = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Data-parallel dispatch helpers for the secondary models
# ---------------------------------------------------------------------------
# The detection (U-Net/ONNX), CRAFT/CRNN and LaMa models are all small and
# embarrassingly batch-parallel; at their sizes plain batch-dim sharding is
# the whole multi-chip story (SURVEY §5.8) — params replicated once, input
# batches padded to the data-axis size and device_put with a sharded
# layout, XLA partitioning the jitted graph from the annotations.

def dp_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def pad_batch_to_multiple(arr: np.ndarray, m: int) -> np.ndarray:
    """Zero-pad the leading dim up to a multiple of ``m`` (shard rows must
    divide evenly; padded rows are sliced off after the dispatch)."""
    pad = (-arr.shape[0]) % m
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], axis=0
        )
    return arr


def dp_shard_batch(arr_np, mesh: Mesh):
    """np batch -> device array sharded on the data axis (leading dim
    padded to the axis size)."""
    arr = pad_batch_to_multiple(np.asarray(arr_np), dp_size(mesh))
    return jax.device_put(arr, batch_sharding(mesh))


def dp_replicate(params, mesh: Mesh):
    """Place a param pytree replicated across the mesh (device_put once at
    engine construction, not per dispatch)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


# ---------------------------------------------------------------------------
# Parameter shardings (tensor parallelism over the model axis)
# ---------------------------------------------------------------------------

def _attn_spec(stacked: bool):
    """q/k/v shard the head (output) dim; o shards its input dim."""
    lead = (None,) if stacked else ()  # leading stacked-layer axis
    # kernels are [L?, din, dout]
    qkv = P(*lead, None, MODEL_AXIS)
    o = P(*lead, MODEL_AXIS, None)
    qkv_b = P(*lead, MODEL_AXIS)
    o_b = P(*lead, None)
    return {
        "q": {"kernel": qkv, "bias": qkv_b},
        "k": {"kernel": qkv, "bias": qkv_b},
        "v": {"kernel": qkv, "bias": qkv_b},
        "o": {"kernel": o, "bias": o_b},
    }


def _mlp_spec(stacked: bool):
    lead = (None,) if stacked else ()
    return {
        "fc1": {"kernel": P(*lead, None, MODEL_AXIS), "bias": P(*lead, MODEL_AXIS)},
        "fc2": {"kernel": P(*lead, MODEL_AXIS, None), "bias": P(*lead, None)},
    }


def _ln_spec(stacked: bool):
    lead = (None,) if stacked else ()
    return {"scale": P(*lead, None), "bias": P(*lead, None)}


def param_specs() -> dict:
    """PartitionSpec pytree matching ``model.init_params`` structure."""
    return {
        "encoder": {
            "patch_embed": {"kernel": P(None, None, None, MODEL_AXIS), "bias": P(MODEL_AXIS)},
            "cls_token": P(None, None, None),
            "pos_embed": P(None, None, None),
            "layers": {
                "ln1": _ln_spec(True),
                "attn": _attn_spec(True),
                "ln2": _ln_spec(True),
                "mlp": _mlp_spec(True),
            },
            "final_ln": _ln_spec(False),
        },
        "decoder": {
            "tok_embed": P(MODEL_AXIS, None),
            "pos_embed": P(None, None),
            "tok_type": P(None),
            "emb_ln": _ln_spec(False),
            "layers": {
                "self_attn": _attn_spec(True),
                "self_ln": _ln_spec(True),
                "cross_attn": _attn_spec(True),
                "cross_ln": _ln_spec(True),
                "mlp": _mlp_spec(True),
                "mlp_ln": _ln_spec(True),
            },
            "head": {
                "transform": {
                    "dense": {"kernel": P(None, None), "bias": P(None)},
                    "ln": _ln_spec(False),
                },
                "proj": {"kernel": P(None, MODEL_AXIS), "bias": P(MODEL_AXIS)},
            },
        },
    }


def param_shardings(mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a param pytree onto the mesh with tensor-parallel shardings.

    Note: the patch_embed kernel sharding requires hidden % n_model == 0 etc.;
    with n_model == 1 everything degenerates to replication.
    """
    shardings = param_shardings(mesh)
    return jax.tree.map(jax.device_put, params, shardings)
