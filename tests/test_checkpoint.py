"""Native checkpoint roundtrip tests."""

import numpy as np

import jax

from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from manga_ocr_tpu.models.config import MangaOCRConfig


def test_checkpoint_roundtrip(tmp_path):
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), params, cfg)
    loaded, cfg2 = load_checkpoint(str(tmp_path))
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_outputs_match(tmp_path):
    import jax.numpy as jnp

    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path), params, cfg)
    loaded, cfg2 = load_checkpoint(str(tmp_path))
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    a = mdl.ocr_forward(params, px, cfg, max_length=6)
    b = mdl.ocr_forward(loaded, px, cfg2, max_length=6)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_checkpoint_roundtrips_list_nodes(tmp_path):
    """Trees with list nodes (U-Net-style 'down'/'up' stacks) must come back
    as lists, not {'0': ...} dicts (regression)."""
    cfg = MangaOCRConfig.tiny()
    tree = {
        "down": [
            {"kernel": np.ones((2, 2), np.float32) * i} for i in range(12)
        ],
        "head": {"bias": np.zeros((3,), np.float32)},
    }
    save_checkpoint(str(tmp_path), tree, cfg)
    loaded, _ = load_checkpoint(str(tmp_path))
    assert isinstance(loaded["down"], list) and len(loaded["down"]) == 12
    # order preserved numerically (not lexicographic: 10 after 9)
    for i, leaf in enumerate(loaded["down"]):
        assert float(np.asarray(leaf["kernel"])[0, 0]) == float(i)
    assert isinstance(loaded["head"], dict)
