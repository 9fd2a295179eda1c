"""Training / fine-tuning step for the manga-ocr model.

The reference does no training (inference-only, SURVEY §5.4); this module
exists because a complete framework must be able to (re)train or fine-tune
the OCR model.  It is also the multi-chip entry the driver dry-runs: a full
teacher-forcing cross-entropy step, jitted over a (data, model) mesh with
batch sharded on the data axis and tensor-parallel params on the model axis
— all collectives XLA-inserted from the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from manga_ocr_tpu.models import decoder as dec
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.parallel import mesh as meshlib


class TrainBatch(NamedTuple):
    pixel_values: jax.Array  # [B, H, W, C] float
    tokens: jax.Array  # [B, T] int32, BOS ... EOS PAD*
    loss_mask: jax.Array  # [B, T] float, 1 where the *label* at t counts


def loss_fn(params: dict, batch: TrainBatch, cfg: MangaOCRConfig) -> jax.Array:
    """Teacher-forcing cross-entropy over next-token prediction."""
    enc_out = mdl.encode(params, batch.pixel_values, cfg)
    inputs = batch.tokens[:, :-1]
    labels = batch.tokens[:, 1:]
    mask = batch.loss_mask[:, 1:].astype(jnp.float32)
    logits = dec.forward_full(params["decoder"], inputs, enc_out, cfg.decoder)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: MangaOCRConfig, optimizer, mesh: Mesh | None = None):
    """Build the jitted train step.  With a mesh, the batch is constrained to
    the data axis inside the step; param shardings flow in from the arrays
    themselves (place them with ``parallel.mesh.shard_params``)."""

    def step(params, opt_state, batch: TrainBatch):
        if mesh is not None:
            bs = NamedSharding(mesh, P(meshlib.DATA_AXIS))
            batch = TrainBatch(
                jax.lax.with_sharding_constraint(batch.pixel_values, bs),
                jax.lax.with_sharding_constraint(batch.tokens, bs),
                jax.lax.with_sharding_constraint(batch.loss_mask, bs),
            )
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def init_train_state(
    cfg: MangaOCRConfig,
    optimizer,
    key: jax.Array,
    mesh: Mesh | None = None,
    dtype=jnp.float32,
):
    """Initialize (params, opt_state), placed onto the mesh if given."""
    params = mdl.init_params(cfg, key, dtype)
    if mesh is not None:
        params = meshlib.shard_params(params, mesh)
    opt_state = optimizer.init(params)
    return params, opt_state
