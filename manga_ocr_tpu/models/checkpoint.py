"""Native checkpoint store for converted param pytrees.

Converting the HF torch checkpoint (``models/convert.py``) takes torch +
transposes every load; this module saves the converted JAX pytree once and
reloads it fast thereafter — flat ``.npz`` tensors plus a JSON manifest of
the model config.  (Orbax also works with these trees; this format has zero
async machinery and survives environment changes.)
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.models.config import MangaOCRConfig

MANIFEST = "manifest.json"
WEIGHTS = "weights.npz"


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def save_checkpoint(path: str, params: dict, cfg: MangaOCRConfig) -> None:
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    np.savez(os.path.join(path, WEIGHTS), **flat)
    manifest = {
        "format": 1,
        "encoder": dataclasses.asdict(cfg.encoder),
        "decoder": dataclasses.asdict(cfg.decoder),
        "max_length": cfg.max_length,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def load_checkpoint(path: str, dtype=jnp.float32) -> tuple[dict, MangaOCRConfig]:
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    from manga_ocr_tpu.models.config import DecoderConfig, EncoderConfig

    cfg = MangaOCRConfig(
        encoder=EncoderConfig(**manifest["encoder"]),
        decoder=DecoderConfig(**manifest["decoder"]),
        max_length=manifest.get("max_length", 300),
    )
    data = np.load(os.path.join(path, WEIGHTS))

    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        node[parts[-1]] = jnp.asarray(
            arr, dtype if np.issubdtype(arr.dtype, np.floating) else None
        )
    return _relistify(tree), cfg


def _relistify(node):
    """Rebuild list nodes that ``_flatten`` encoded as numeric path segments
    — a tree saved with a list (e.g. a U-Net's ``down``/``up`` stacks) must
    round-trip as a list, not as ``{"0": ..., "1": ...}``."""
    if not isinstance(node, dict):
        return node
    out = {k: _relistify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        if idx == [str(i) for i in range(len(idx))]:
            return [out[k] for k in idx]
    return out
