"""HF ``VisionEncoderDecoderModel`` checkpoint -> JAX param pytree.

The reference treats the manga-ocr model as an opaque pip package
(``/root/reference/src/ui/main_window.py:9801``); here we instead convert its
underlying HuggingFace checkpoint (ViT encoder + BertLMHeadModel decoder)
into the stacked-layer pytree layout used by ``models/vit.py`` and
``models/decoder.py``:

- torch ``Linear`` weights are ``[out, in]`` -> transposed to ``[in, out]``,
- the patch-embedding conv ``[D, C, P, P]`` -> HWIO-flattenable ``[P, P, C, D]``,
- per-layer tensors are stacked on a leading layer axis (scan-ready),
- the LM head vocab projection ``[V, D]`` -> ``[D, V]``.

Works from a raw state-dict (numpy arrays), a checkpoint directory
(``model.safetensors`` or ``pytorch_model.bin`` + ``config.json``), or an
in-memory torch module (used by the parity tests, since the environment has
no network access to download the real checkpoint).
"""

from __future__ import annotations

import os
from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.models.config import DecoderConfig, EncoderConfig, MangaOCRConfig


def _ln(get: Callable[[str], np.ndarray], prefix: str) -> dict:
    return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}


def _linear(get: Callable[[str], np.ndarray], prefix: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(get(f"{prefix}.weight").T),
        "bias": get(f"{prefix}.bias"),
    }


def _stack(dicts: list[dict]) -> dict:
    """Stack a list of identically-structured nested dicts on axis 0."""
    out: dict = {}
    for key, val in dicts[0].items():
        if isinstance(val, dict):
            out[key] = _stack([d[key] for d in dicts])
        else:
            out[key] = np.stack([d[key] for d in dicts], axis=0)
    return out


def convert_encoder(get, cfg: EncoderConfig, prefix: str = "encoder.") -> dict:
    p = prefix
    conv_w = get(f"{p}embeddings.patch_embeddings.projection.weight")  # [D,C,P,P]
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}."
        layers.append(
            {
                "ln1": _ln(get, f"{lp}layernorm_before"),
                "attn": {
                    "q": _linear(get, f"{lp}attention.attention.query"),
                    "k": _linear(get, f"{lp}attention.attention.key"),
                    "v": _linear(get, f"{lp}attention.attention.value"),
                    "o": _linear(get, f"{lp}attention.output.dense"),
                },
                "ln2": _ln(get, f"{lp}layernorm_after"),
                "mlp": {
                    "fc1": _linear(get, f"{lp}intermediate.dense"),
                    "fc2": _linear(get, f"{lp}output.dense"),
                },
            }
        )
    return {
        "patch_embed": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),  # -> [P,P,C,D]
            "bias": get(f"{p}embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": get(f"{p}embeddings.cls_token"),
        "pos_embed": get(f"{p}embeddings.position_embeddings"),
        "layers": _stack(layers),
        "final_ln": _ln(get, f"{p}layernorm"),
    }


def convert_decoder(get, cfg: DecoderConfig, prefix: str = "decoder.") -> dict:
    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}bert.encoder.layer.{i}."
        layers.append(
            {
                "self_attn": {
                    "q": _linear(get, f"{lp}attention.self.query"),
                    "k": _linear(get, f"{lp}attention.self.key"),
                    "v": _linear(get, f"{lp}attention.self.value"),
                    "o": _linear(get, f"{lp}attention.output.dense"),
                },
                "self_ln": _ln(get, f"{lp}attention.output.LayerNorm"),
                "cross_attn": {
                    "q": _linear(get, f"{lp}crossattention.self.query"),
                    "k": _linear(get, f"{lp}crossattention.self.key"),
                    "v": _linear(get, f"{lp}crossattention.self.value"),
                    "o": _linear(get, f"{lp}crossattention.output.dense"),
                },
                "cross_ln": _ln(get, f"{lp}crossattention.output.LayerNorm"),
                "mlp": {
                    "fc1": _linear(get, f"{lp}intermediate.dense"),
                    "fc2": _linear(get, f"{lp}output.dense"),
                },
                "mlp_ln": _ln(get, f"{lp}output.LayerNorm"),
            }
        )
    # The MLM-head bias key shifted across transformers versions.
    try:
        head_bias = get(f"{p}cls.predictions.bias")
    except KeyError:
        head_bias = get(f"{p}cls.predictions.decoder.bias")
    return {
        "tok_embed": get(f"{p}bert.embeddings.word_embeddings.weight"),
        "pos_embed": get(f"{p}bert.embeddings.position_embeddings.weight"),
        "tok_type": get(f"{p}bert.embeddings.token_type_embeddings.weight")[0],
        "emb_ln": _ln(get, f"{p}bert.embeddings.LayerNorm"),
        "layers": _stack(layers),
        "head": {
            "transform": {
                "dense": _linear(get, f"{p}cls.predictions.transform.dense"),
                "ln": _ln(get, f"{p}cls.predictions.transform.LayerNorm"),
            },
            "proj": {
                "kernel": np.ascontiguousarray(
                    get(f"{p}cls.predictions.decoder.weight").T
                ),
                "bias": head_bias,
            },
        },
    }


def convert_state_dict(
    sd: Mapping[str, np.ndarray], cfg: MangaOCRConfig, dtype=jnp.float32
) -> dict:
    """Full conversion from a numpy state dict to the JAX param pytree."""

    def get(name: str) -> np.ndarray:
        if name not in sd:
            raise KeyError(f"missing checkpoint tensor: {name}")
        return np.asarray(sd[name], np.float32)

    params = {
        "encoder": convert_encoder(get, cfg.encoder),
        "decoder": convert_decoder(get, cfg.decoder),
    }
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def torch_state_dict_to_numpy(module_or_sd) -> dict[str, np.ndarray]:
    """Accept a torch module or state dict; return plain numpy arrays."""
    if hasattr(module_or_sd, "state_dict"):
        sd = module_or_sd.state_dict()
    else:
        sd = module_or_sd
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_hf_checkpoint(
    path: str, dtype=jnp.float32
) -> tuple[dict, MangaOCRConfig]:
    """Load a HF checkpoint directory: config.json + weights file."""
    cfg = MangaOCRConfig.from_json_file(os.path.join(path, "config.json"))
    st_path = os.path.join(path, "model.safetensors")
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        sd = torch_state_dict_to_numpy(
            torch.load(bin_path, map_location="cpu", weights_only=True)
        )
    else:
        raise FileNotFoundError(f"no model weights found under {path}")
    return convert_state_dict(sd, cfg, dtype), cfg
