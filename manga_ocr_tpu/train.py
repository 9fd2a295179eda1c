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
import json
import os
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


def make_lr_schedule(
    peak_lr: float = 1e-4,
    warmup_steps: int = 500,
    decay_steps: int = 20_000,
    end_lr_ratio: float = 0.1,
):
    """Linear warmup → cosine decay (the standard fine-tuning schedule)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=decay_steps,
        end_value=peak_lr * end_lr_ratio,
    )


def init_train_state(
    cfg: MangaOCRConfig,
    optimizer,
    key: jax.Array,
    mesh: Mesh | None = None,
    dtype=jnp.float32,
    init_params: dict | None = None,
):
    """Initialize (params, opt_state), placed onto the mesh if given.

    ``init_params``: start from these weights (e.g. a converted HF
    checkpoint for fine-tuning) instead of random init."""
    params = (
        mdl.cast_params(init_params, dtype)
        if init_params is not None
        else mdl.init_params(cfg, key, dtype)
    )
    if mesh is not None:
        params = meshlib.shard_params(params, mesh)
    opt_state = optimizer.init(params)
    return params, opt_state


# ---------------------------------------------------------------------------
# Data pipeline
# ---------------------------------------------------------------------------


def pattern_glyph(ch: str, size: int = 12) -> "np.ndarray":
    """A deterministic, per-character-DISTINCT glyph: a 4x4 binary pattern
    hashed from the codepoint, scaled to ``size`` (uint8, 0=ink/255=paper).

    Why not a font: PIL's default bitmap font renders every non-latin
    character as the SAME tofu box (measured: pixel diff 0 between あ and
    い), which silently turns synthetic OCR training into marginal-
    distribution fitting — the image carries no label information.  Pattern
    glyphs make the synthetic task a real read-the-image task."""
    import numpy as np

    bits = (ord(ch) * 2654435761) & 0xFFFF
    g = np.array([(bits >> i) & 1 for i in range(16)], np.uint8).reshape(4, 4)
    g[0, 0] = 1  # anchor cell: no glyph is empty
    cell = max(1, size // 4)
    return 255 - np.kron(g, np.ones((cell, cell), np.uint8)) * 255


def render_text_crop(
    text: str, rng, image_size: int, font=None, hw: tuple[int, int] | None = None
) -> "np.ndarray":
    """Render a bubble-like training crop: white ellipse on page tone, text
    drawn VERTICALLY as distinct pattern glyphs (see ``pattern_glyph``) —
    the synthetic-data path for smoke training and the closed-loop accuracy
    test; real fine-tuning feeds ``directory_dataset``.

    ``hw``: optional (height, width) for non-square crops (exercises the
    engine's bucketing + valid-region resize)."""
    import numpy as np

    h, w = hw if hw is not None else (image_size, image_size)
    img = np.full((h, w), int(rng.integers(140, 220)), np.uint8)
    # white bubble interior with a 2px border of page tone
    img[2 : h - 2, 2 : w - 2] = 255
    gs = max(4, min(12, (h - 8) // max(len(text), 1) - 2, w - 8))
    y = 4
    for ch in text:
        gl = pattern_glyph(ch, gs)
        if y + gl.shape[0] > h - 2:
            break
        x = max(2, (w - gl.shape[1]) // 2)
        gw = min(gl.shape[1], max(0, w - 2 - x))  # clip BOTH sides alike
        img[y : y + gl.shape[0], x : x + gw] = gl[:, :gw]
        y += gl.shape[0] + 2
    return np.repeat(img[..., None], 3, axis=2)


def synthetic_dataset(
    cfg: MangaOCRConfig,
    tokenizer,
    batch_size: int,
    seq_len: int,
    seed: int = 0,
):
    """Infinite generator of TrainBatches with rendered text crops.

    Texts are random character runs from the tokenizer vocab; images render
    them into bubble-ish crops.  Good for smoke training / overfit tests and
    the multi-chip dryrun; swap in ``directory_dataset`` for real data."""
    import numpy as np

    rng = np.random.default_rng(seed)
    img = cfg.encoder.image_size
    # printable vocab entries (skip specials) whose ids fit the MODEL vocab
    # (tiny test configs use a smaller vocab than the full tokenizer)
    chars = [
        t
        for t in tokenizer.id_to_token[4 : cfg.decoder.vocab_size]
        if len(t) == 1
    ]

    while True:
        pixels = np.zeros((batch_size, img, img, 3), np.float32)
        tokens = np.full((batch_size, seq_len), cfg.decoder.pad_token_id, np.int32)
        mask = np.zeros((batch_size, seq_len), np.float32)
        for i in range(batch_size):
            n = int(rng.integers(1, max(2, seq_len - 2)))
            text = "".join(rng.choice(chars) for _ in range(n))
            crop = render_text_crop(text, rng, img)
            pixels[i] = (crop.astype(np.float32) / 255.0 - 0.5) / 0.5
            ids = tokenizer.encode(text)[: seq_len]
            tokens[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1.0
        yield TrainBatch(
            jnp.asarray(pixels), jnp.asarray(tokens), jnp.asarray(mask)
        )


def directory_dataset(
    path: str,
    cfg: MangaOCRConfig,
    tokenizer,
    batch_size: int,
    seq_len: int,
    seed: int = 0,
):
    """Infinite generator over a directory of (crop.png, crop.txt) pairs —
    the same format as the eval fixtures, so recorded reference outputs
    double as fine-tuning data."""
    import numpy as np

    from manga_ocr_tpu.eval import load_fixtures
    from manga_ocr_tpu.ops import preprocess as pp

    fixtures = load_fixtures(path)
    if not fixtures:
        raise ValueError(f"no (image, txt) pairs under {path}")
    rng = np.random.default_rng(seed)
    img = cfg.encoder.image_size

    from PIL import Image

    while True:
        idxs = rng.integers(0, len(fixtures), size=batch_size)
        pixels = np.zeros((batch_size, img, img, 3), np.float32)
        tokens = np.full((batch_size, seq_len), cfg.decoder.pad_token_id, np.int32)
        mask = np.zeros((batch_size, seq_len), np.float32)
        for row, i in enumerate(idxs):
            fx = fixtures[int(i)]
            crop, text = fx["crop"], fx["ref"]
            gray = np.asarray(
                Image.fromarray(crop[..., ::-1]).convert("L").resize((img, img))
            )
            rgbish = np.repeat(gray[..., None], 3, axis=-1)
            pixels[row] = (rgbish.astype(np.float32) / 255.0 - 0.5) / 0.5
            ids = [
                t if t < cfg.decoder.vocab_size else cfg.decoder.unk_token_id
                for t in tokenizer.encode(text)
            ][:seq_len]
            tokens[row, : len(ids)] = ids
            mask[row, : len(ids)] = 1.0
        yield TrainBatch(jnp.asarray(pixels), jnp.asarray(tokens), jnp.asarray(mask))


class Prefetcher:
    """One-batch host prefetch: the next batch builds on a worker thread
    while the current step runs on the device."""

    def __init__(self, iterator):
        import queue
        import threading

        self._it = iterator
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._stop = threading.Event()

        def pump():
            while not self._stop.is_set():
                try:
                    item = next(self._it)
                except StopIteration:
                    self._q.put(None)
                    return
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Train-state checkpointing + loop
# ---------------------------------------------------------------------------


def _shard_opt_state(opt_state, mesh: Mesh):
    """Place a restored optimizer state onto the mesh: any state field whose
    pytree mirrors the params (adam's mu/nu) gets the param shardings;
    scalars (step counts) are replicated."""
    shardings = meshlib.param_shardings(mesh)
    repl = meshlib.replicated(mesh)

    def place_state(s):
        if hasattr(s, "_replace"):  # NamedTuple optax states
            fields = {}
            for name in s._fields:
                v = getattr(s, name)
                if isinstance(v, dict):  # param-shaped tree (mu / nu)
                    v = jax.tree.map(jax.device_put, v, shardings)
                elif isinstance(v, jax.Array):
                    v = jax.device_put(v, repl)
                fields[name] = v
            return s._replace(**fields)
        return s

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_replace"):
        return tuple(place_state(s) for s in opt_state)
    return place_state(opt_state)


def save_train_state(path: str, params, opt_state, step: int, cfg: MangaOCRConfig):
    """Checkpoint params + optimizer state + step (npz store, resumable)."""
    import numpy as np

    from manga_ocr_tpu.models import checkpoint as ckpt

    ckpt.save_checkpoint(path, params, cfg)
    flat_opt = ckpt._flatten(jax.tree.map(np.asarray, opt_state))
    np.savez(os.path.join(path, "opt_state.npz"), **flat_opt)
    with open(os.path.join(path, "train_state.json"), "w") as f:
        json.dump({"step": int(step)}, f)


def load_train_state(path: str, optimizer, dtype=jnp.float32):
    """Restore (params, opt_state, step, cfg); opt_state re-hydrated into
    the optimizer's structure."""
    import numpy as np

    from manga_ocr_tpu.models import checkpoint as ckpt

    params, cfg = ckpt.load_checkpoint(path, dtype)
    template = optimizer.init(params)
    data = np.load(os.path.join(path, "opt_state.npz"))
    flat_tpl = ckpt._flatten(template)
    leaves = {
        k: jnp.asarray(data[k]) if k in data.files else jnp.asarray(v)
        for k, v in flat_tpl.items()
    }
    opt_state = jax.tree.unflatten(
        jax.tree.structure(template),
        [leaves[k] for k in flat_tpl],
    )
    with open(os.path.join(path, "train_state.json")) as f:
        step = json.load(f)["step"]
    return params, opt_state, step, cfg


def train(
    cfg: MangaOCRConfig,
    dataset,
    steps: int,
    mesh: Mesh | None = None,
    peak_lr: float = 1e-4,
    warmup_steps: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1000,
    resume: bool = False,
    log_every: int = 50,
    seed: int = 0,
    init_params: dict | None = None,
):
    """The training loop: schedule, prefetch, periodic resumable checkpoints.

    Returns (params, losses).  ``dataset`` is any TrainBatch iterator
    (``synthetic_dataset`` / ``directory_dataset``).  ``init_params``:
    fine-tune from these weights instead of random init (ignored when
    resuming from a saved train state, which carries its own params)."""
    schedule = make_lr_schedule(peak_lr, warmup_steps, max(steps, warmup_steps + 1))
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    start = 0
    if resume and checkpoint_dir and os.path.exists(
        os.path.join(checkpoint_dir, "train_state.json")
    ):
        params, opt_state, start, cfg = load_train_state(checkpoint_dir, optimizer)
        if mesh is not None:
            params = meshlib.shard_params(params, mesh)
            # the restored adam moments mirror the param tree — place them
            # with the SAME shardings, or the train step runs with sharded
            # params against single-device moments (transfers each step;
            # OOM for models that only fit sharded)
            opt_state = _shard_opt_state(opt_state, mesh)
    else:
        params, opt_state = init_train_state(
            cfg, optimizer, jax.random.PRNGKey(seed), mesh,
            init_params=init_params,
        )
    step_fn = make_train_step(cfg, optimizer, mesh)
    losses = []
    it = Prefetcher(iter(dataset))
    try:
        for i in range(start, steps):
            batch = next(it)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            if (i + 1) % log_every == 0 or i + 1 == steps:
                losses.append(float(loss))
            if checkpoint_dir and ((i + 1) % checkpoint_every == 0 or i + 1 == steps):
                save_train_state(checkpoint_dir, params, opt_state, i + 1, cfg)
    finally:
        it.close()
    return params, losses


def main(argv=None) -> int:
    """CLI fine-tuning entry: ``python -m manga_ocr_tpu.train``.

    Synthetic data by default (smoke/overfit runs); pass ``--data DIR`` of
    (crop.png, crop.txt) pairs for real fine-tuning.  ``--mesh-data N``
    shards the batch over N devices (data parallelism); ``--mesh-model M``
    adds tensor-parallel param shardings.
    """
    import argparse

    p = argparse.ArgumentParser(prog="manga-ocr-tpu-train")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--data", default="", help="dir of (crop.png, crop.txt) pairs; default: synthetic")
    p.add_argument("--config", default="base", choices=("base", "tiny"))
    p.add_argument("--init-checkpoint", default="", help="HF checkpoint dir to fine-tune from")
    p.add_argument("--checkpoint-dir", default="", help="where to write resumable train state")
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--mesh-data", type=int, default=0, help="data-parallel mesh size (0 = no mesh)")
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--export-hf",
        default="",
        help="after training, write the final weights as an HF-format "
        "checkpoint dir (model.safetensors + config.json + vocab.txt) — "
        "loadable by load_hf_checkpoint, the CLI/serve --checkpoint flag, "
        "and upstream HF consumers",
    )
    args = p.parse_args(argv)

    from manga_ocr_tpu.models.tokenizer import CharTokenizer
    from manga_ocr_tpu.utils import jax_cache

    jax_cache.enable()
    cfg = MangaOCRConfig.base() if args.config == "base" else MangaOCRConfig.tiny()
    tok = CharTokenizer.synthetic()
    init_params = None
    if args.init_checkpoint:
        from manga_ocr_tpu.models.convert import load_hf_checkpoint

        init_params, cfg = load_hf_checkpoint(args.init_checkpoint)
        vocab = os.path.join(args.init_checkpoint, "vocab.txt")
        if os.path.exists(vocab):
            tok = CharTokenizer.from_vocab_file(vocab)
    # A model axis > 1 implies a mesh even without --mesh-data (data size
    # defaults to all-devices/model inside make_mesh).
    mesh = (
        meshlib.make_mesh(args.mesh_data or None, args.mesh_model)
        if (args.mesh_data or args.mesh_model > 1)
        else None
    )
    if args.data:
        dataset = directory_dataset(
            args.data, cfg, tok, args.batch_size, args.seq_len, seed=args.seed
        )
    else:
        dataset = synthetic_dataset(
            cfg, tok, args.batch_size, args.seq_len, seed=args.seed
        )
    trained_params, losses = train(
        cfg,
        dataset,
        steps=args.steps,
        mesh=mesh,
        peak_lr=args.lr,
        warmup_steps=args.warmup_steps,
        checkpoint_dir=args.checkpoint_dir or None,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        seed=args.seed,
        init_params=init_params,
    )
    for i, loss in enumerate(losses):
        print(f"log[{i}] loss={loss:.4f}")
    if args.export_hf:
        import numpy as np

        from manga_ocr_tpu.models.convert import save_hf_checkpoint

        save_hf_checkpoint(
            args.export_hf,
            jax.tree.map(np.asarray, trained_params),
            cfg,
            tokenizer=tok,
        )
        print(f"exported HF-format checkpoint to {args.export_hf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
