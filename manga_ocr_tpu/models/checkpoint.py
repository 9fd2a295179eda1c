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
    return tree, cfg
