"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu import train as trainlib
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.parallel import mesh as meshlib


def _tiny_batch(cfg, b=8, t=8):
    rng = np.random.default_rng(0)
    img = cfg.encoder.image_size
    tokens = rng.integers(4, cfg.decoder.vocab_size, size=(b, t)).astype(np.int32)
    tokens[:, 0] = cfg.decoder.bos_token_id
    return trainlib.TrainBatch(
        pixel_values=jnp.asarray(rng.normal(size=(b, img, img, 3)).astype(np.float32)),
        tokens=jnp.asarray(tokens),
        loss_mask=jnp.ones((b, t), jnp.float32),
    )


def test_train_step_dp8():
    """Data-parallel over all 8 virtual devices."""
    assert len(jax.devices()) == 8
    cfg = MangaOCRConfig.tiny()
    mesh = meshlib.make_mesh(n_data=8, n_model=1)
    opt = trainlib.make_optimizer()
    params, opt_state = trainlib.init_train_state(cfg, opt, jax.random.PRNGKey(0), mesh)
    step = trainlib.make_train_step(cfg, opt, mesh)
    batch = _tiny_batch(cfg)
    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_train_step_dp4_tp2_matches_dp():
    """2-way tensor parallel must produce the same loss as pure DP."""
    cfg = MangaOCRConfig.tiny()
    batch = _tiny_batch(cfg)
    opt = trainlib.make_optimizer()

    losses = []
    for (nd, nm) in [(8, 1), (4, 2)]:
        mesh = meshlib.make_mesh(n_data=nd, n_model=nm)
        params, opt_state = trainlib.init_train_state(
            cfg, opt, jax.random.PRNGKey(0), mesh
        )
        step = trainlib.make_train_step(cfg, opt, mesh)
        _, _, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_sharded_inference_dp():
    """Batched greedy decode with the batch sharded over the data axis."""
    cfg = MangaOCRConfig.tiny()
    mesh = meshlib.make_mesh(n_data=8, n_model=1)
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    params = meshlib.shard_params(params, mesh)
    px = jax.device_put(
        jnp.zeros((16, 32, 32, 3), jnp.float32), meshlib.batch_sharding(mesh)
    )
    fn = mdl.make_jitted_ocr(cfg, max_length=8)
    out = fn(params, px)
    assert out.tokens.shape == (16, 8)


def test_resume_with_mesh_shards_opt_state(tmp_path):
    """Resuming under a mesh must place the restored adam moments with the
    param shardings (regression: params sharded, moments single-device)."""
    from manga_ocr_tpu import train as trainlib
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.parallel import mesh as meshlib

    cfg = MangaOCRConfig.tiny()
    opt = trainlib.make_optimizer(lr=1e-3)
    params, opt_state = trainlib.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    trainlib.save_train_state(str(tmp_path), params, opt_state, 3, cfg)

    mesh = meshlib.make_mesh(4, 2)
    p2, s2, step, _ = trainlib.load_train_state(str(tmp_path), opt)
    p2 = meshlib.shard_params(p2, mesh)
    s2 = trainlib._shard_opt_state(s2, mesh)
    assert step == 3
    ref_shardings = meshlib.param_shardings(mesh)
    mu = s2[0].mu
    leaf = mu["encoder"]["patch_embed"]["kernel"]
    want = ref_shardings["encoder"]["patch_embed"]["kernel"]
    assert leaf.sharding == want
    # and one sharded train step runs from the restored state
    step_fn = trainlib.make_train_step(cfg, opt, mesh)
    img = cfg.encoder.image_size
    rng = np.random.default_rng(0)
    tokens = rng.integers(4, cfg.decoder.vocab_size, size=(8, 6)).astype(np.int32)
    batch = trainlib.TrainBatch(
        jnp.asarray(rng.normal(size=(8, img, img, 3)).astype(np.float32)),
        jnp.asarray(tokens),
        jnp.ones((8, 6), jnp.float32),
    )
    p3, s3, loss = step_fn(p2, s2, batch)
    assert np.isfinite(float(loss))
