"""CTC text recognizer in JAX (VGG–BiLSTM–CTC, the EasyOCR recognition net).

The reference's Latin OCR engines recognize text through pip black boxes
(EasyOCR dispatch at ``/root/reference/src/ui/main_window.py:9805-9810``).
EasyOCR's recognizer is the "None-VGG-BiLSTM-CTC" configuration of the
public deep-text-recognition-benchmark model zoo:

- feature extractor: 7-conv VGG over gray line crops (H fixed, W variable),
  pooling H fully away → a per-column feature sequence [B, T, C]
  (T = W/4 − 1 at the default geometry),
- sequence model: two bidirectional LSTMs (torch gate order i,f,g,o), each
  followed by a linear projection,
- prediction: linear to charset+1 logits per column; CTC greedy decode
  (collapse repeats, drop blank index 0).

TPU-first design: line crops are batched and width-padded to shape buckets
so a whole page's lines recognize in ONE dispatch; the LSTMs run as
``lax.scan`` over the (short, static) column axis with the batch dim on the
MXU.  Real EasyOCR checkpoints (e.g. ``english_g2``) convert via
``models/convert_latin.py`` (flagged *verify against upstream* — no network
in this environment); tests use channel-scaled twins
(``tests/test_latin_ocr.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CrnnConfig:
    num_classes: int = 97  # charset + blank(0); easyocr english_g2 ~97
    input_height: int = 32
    output_channel: int = 512  # VGG final width; stage widths derive /8,/4,/2
    hidden_size: int = 256
    blank_id: int = 0

    @property
    def stage_channels(self) -> tuple:
        oc = self.output_channel
        return (oc // 8, oc // 4, oc // 2, oc)


def _conv(x, p, stride=1, pad=None):
    k = p["kernel"].shape[0]
    if pad is None:
        pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _pool(x, kh, kw):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
    )


def features_forward(params: dict, x: jax.Array) -> jax.Array:
    """Gray line crops [B, H, W, 1] (float, (v/255 − .5)/.5) →
    per-column features [B, T, C]; T = W/4 − 1 at the default geometry."""
    r = jax.nn.relu
    x = _pool(r(_conv(x, params["conv0"])), 2, 2)
    x = _pool(r(_conv(x, params["conv1"])), 2, 2)
    x = r(_conv(x, params["conv2"]))
    x = _pool(r(_conv(x, params["conv3"])), 2, 1)
    x = r(_conv(x, params["conv4"]))  # BN folded into kernel+bias
    x = _pool(r(_conv(x, params["conv5"])), 2, 1)
    x = r(_conv(x, params["conv6"], pad=0))  # 2x2 conv, valid
    # H is pooled to 1 at input_height=32 (32→16→8→4→2→1); adaptive-avg-pool
    # over any residual H (identity when H==1), matching the torch model
    x = jnp.mean(x, axis=1)  # [B, W', C]
    return x


def _lstm_scan(p: dict, x: jax.Array, reverse: bool) -> jax.Array:
    """One direction of a torch LSTM over [B, T, I] → [B, T, H].

    torch packs gates as (i, f, g, o) rows of weight_ih [4H, I] /
    weight_hh [4H, H]; both biases add."""
    w_ih = p["w_ih"]  # [I, 4H] (pre-transposed at conversion)
    w_hh = p["w_hh"]  # [H, 4H]
    bias = p["bias"]  # [4H]
    hdim = w_hh.shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # [T, B, I]
    # hoist the input projection out of the scan: one big MXU matmul
    xproj = xs.astype(jnp.float32) @ w_ih.astype(jnp.float32) + bias

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    b = x.shape[0]
    init = (
        jnp.zeros((b, hdim), jnp.float32),
        jnp.zeros((b, hdim), jnp.float32),
    )
    _, hs = jax.lax.scan(step, init, xproj, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1).astype(x.dtype)  # [B, T, H]


def bilstm_forward(p: dict, x: jax.Array) -> jax.Array:
    """BidirectionalLSTM block: biLSTM + linear (torch module shape)."""
    fwd = _lstm_scan(p["fwd"], x, reverse=False)
    bwd = _lstm_scan(p["bwd"], x, reverse=True)
    h = jnp.concatenate([fwd, bwd], axis=-1)
    return h @ p["linear"]["kernel"].astype(h.dtype) + p["linear"]["bias"].astype(
        h.dtype
    )


def crnn_forward(params: dict, x: jax.Array) -> jax.Array:
    """[B, H, W, 1] normalized gray crops → per-column logits [B, T, K]."""
    h = features_forward(params["features"], x)
    h = bilstm_forward(params["rnn0"], h)
    h = bilstm_forward(params["rnn1"], h)
    out = params["head"]
    return h @ out["kernel"].astype(h.dtype) + out["bias"].astype(h.dtype)


def ctc_greedy(logits: np.ndarray, lengths: np.ndarray | None, blank_id: int = 0):
    """Host-side CTC best-path decode: argmax per column, collapse repeats,
    drop blanks.  ``lengths``: optional valid column count per row (width-
    padded batches).  Returns list of id lists."""
    ids = np.asarray(logits).argmax(axis=-1)  # [B, T]
    out = []
    for b in range(ids.shape[0]):
        t_end = int(lengths[b]) if lengths is not None else ids.shape[1]
        row, prev = [], blank_id
        for t in range(t_end):
            k = int(ids[b, t])
            if k != blank_id and k != prev:
                row.append(k)
            prev = k
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# Init (random; real weights via models/convert_latin.py)
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, bias=True) -> dict:
    # He-normal, not torch's uniform 1/sqrt(fan): the torch net trains with
    # BatchNorm re-normalizing mid-stack, which conversion folds away; a
    # trainable-from-scratch init must preserve ReLU signal through all 7
    # convs itself or features collapse (~0.02 std) and CTC sticks at the
    # all-blank plateau
    scale = np.sqrt(2.0 / (kh * kw * cin))
    k1, _ = jax.random.split(key)
    p = {"kernel": scale * jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_linear(key, cin, cout) -> dict:
    scale = 1.0 / np.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (cin, cout), jnp.float32, -scale, scale),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -scale, scale),
    }


def _init_lstm_dir(key, cin, hidden) -> dict:
    scale = 1.0 / np.sqrt(hidden)
    ks = jax.random.split(key, 3)
    return {
        "w_ih": jax.random.uniform(ks[0], (cin, 4 * hidden), jnp.float32, -scale, scale),
        "w_hh": jax.random.uniform(ks[1], (hidden, 4 * hidden), jnp.float32, -scale, scale),
        "bias": jax.random.uniform(ks[2], (4 * hidden,), jnp.float32, -scale, scale),
    }


def init_crnn_params(cfg: CrnnConfig, key) -> dict:
    c1, c2, c3, c4 = cfg.stage_channels
    hs = cfg.hidden_size
    keys = iter(jax.random.split(key, 16))
    features = {
        "conv0": _init_conv(next(keys), 3, 3, 1, c1),
        "conv1": _init_conv(next(keys), 3, 3, c1, c2),
        "conv2": _init_conv(next(keys), 3, 3, c2, c3),
        "conv3": _init_conv(next(keys), 3, 3, c3, c3),
        "conv4": _init_conv(next(keys), 3, 3, c3, c4),  # torch: bias=False+BN;
        "conv5": _init_conv(next(keys), 3, 3, c4, c4),  # folded at conversion
        "conv6": _init_conv(next(keys), 2, 2, c4, c4),
    }
    return {
        "features": features,
        "rnn0": {
            "fwd": _init_lstm_dir(next(keys), c4, hs),
            "bwd": _init_lstm_dir(next(keys), c4, hs),
            "linear": _init_linear(next(keys), 2 * hs, hs),
        },
        "rnn1": {
            "fwd": _init_lstm_dir(next(keys), hs, hs),
            "bwd": _init_lstm_dir(next(keys), hs, hs),
            "linear": _init_linear(next(keys), 2 * hs, hs),
        },
        "head": _init_linear(next(keys), hs, cfg.num_classes),
    }


def make_jitted_crnn(cfg: CrnnConfig):
    """jitted normalized gray crops [B,H,W,1] -> logits [B,T,K]."""
    return jax.jit(crnn_forward)
