"""The historical model families from the reference's ``inactive/`` scripts.

Each variant keeps the reference architecture and checkpoint-importability
(core/torch_import.py) behind a uniform interface:

    init(key, ...) -> params
    forward(params, X, ...) -> logits

Families (reference source):
- TemporalCNN            inactive/dataset_eval.py:5-16, live_lower_half.py:55-71
- GRUWordClassifier      inactive/live_feed.py:29-50 (2-layer BiGRU, mean pool)
- UniGRUClassifier       inactive/train_model_1130pm.py:88-98 (final hidden)
- ReducedBiGRU           inactive/train_reduced.py:129-145 (1-layer BiGRU)
- SummaryMLP             inactive/train_5_quick.py:36-50 (mean+std clip summary)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import gru as gru_ops
from ..ops.nn import (
    conv1d_init,
    conv1d_nwc,
    dense,
    dropout,
    gru_dir_init,
    layer_norm,
    layer_norm_init,
    linear_init,
)
from ..ops.pooling import masked_mean_pool


# ----------------------------------------------------------------------------
# TemporalCNN: two 1-D convs (k=5) + global average + linear head
# ----------------------------------------------------------------------------

def init_temporal_cnn(key, d_in: int, num_classes: int, width: int = 128):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "conv0": conv1d_init(k0, 5, d_in, width),
        "conv1": conv1d_init(k1, 5, width, width),
        "head": linear_init(k2, width, num_classes),
    }


def temporal_cnn_forward(params, X: jnp.ndarray,
                         lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """X: (B, T, D) -> logits (B, C). Averages over all T (as the reference's
    AdaptiveAvgPool1d(1) with full-length single clips).

    With ``lengths``, padded positions are zero-masked after every conv and
    excluded from the mean — bitwise-equal to running each clip unpadded
    (SAME convs zero-pad past the boundary either way), which lets callers
    pad variable-length clips to shape buckets and reuse one compiled
    program instead of recompiling per clip length."""
    if lengths is None:
        h = jax.nn.relu(conv1d_nwc(X, params["conv0"]))
        h = jax.nn.relu(conv1d_nwc(h, params["conv1"]))
        return dense(jnp.mean(h, axis=1), params["head"])
    mask = (jnp.arange(X.shape[1])[None, :] < lengths[:, None]).astype(X.dtype)
    m3 = mask[..., None]
    h = jax.nn.relu(conv1d_nwc(X * m3, params["conv0"])) * m3
    h = jax.nn.relu(conv1d_nwc(h, params["conv1"])) * m3
    n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    pooled = jnp.sum(h, axis=1) / n
    return dense(pooled, params["head"])


# ----------------------------------------------------------------------------
# GRUWordClassifier: 2-layer BiGRU(h=128) + mean pool + LN/MLP head
# ----------------------------------------------------------------------------

def init_gru_word_classifier(key, d_in: int, num_classes: int, hidden: int = 128,
                             num_layers: int = 2):
    keys = jax.random.split(key, 3 + 2 * num_layers)
    layers = []
    d = d_in
    for li in range(num_layers):
        layers.append({
            "fwd": gru_dir_init(keys[3 + 2 * li], d, hidden),
            "bwd": gru_dir_init(keys[4 + 2 * li], d, hidden),
        })
        d = 2 * hidden
    return {
        "gru": layers,
        "head": {
            "ln": layer_norm_init(2 * hidden),
            "fc1": linear_init(keys[0], 2 * hidden, 128),
            "fc2": linear_init(keys[1], 128, num_classes),
        },
    }


def gru_word_classifier_forward(params, X, *, train=False, rng=None,
                                dropout_rate=0.1, head_dropout=0.2):
    """X: (B, T, D) -> logits. Unmasked mean pool over all T, matching the
    reference's ``out.mean(dim=1)`` on zero-padded windows."""
    B, T, _ = X.shape
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    use_dropout = train and rng is not None  # rng=None -> eval-style, no crash
    if use_dropout:
        rng, gru_rng, head_rng = jax.random.split(rng, 3)
    else:
        gru_rng = head_rng = None
    out, _ = gru_ops.bigru(X, lengths, params["gru"], bidirectional=True,
                           dropout_rate=dropout_rate, train=use_dropout,
                           rng=gru_rng)
    pooled = masked_mean_pool(out)
    h = layer_norm(pooled, params["head"]["ln"])
    h = jax.nn.relu(dense(h, params["head"]["fc1"]))
    if use_dropout:
        h = dropout(h, head_dropout, head_rng, True)
    return dense(h, params["head"]["fc2"])


# ----------------------------------------------------------------------------
# UniGRUClassifier: 1-layer GRU, classify from final hidden state
# ----------------------------------------------------------------------------

def init_unigru_classifier(key, d_in: int, num_classes: int, hidden: int = 128):
    k0, k1 = jax.random.split(key)
    return {
        "gru": [{"fwd": gru_dir_init(k0, d_in, hidden)}],
        "head": linear_init(k1, hidden, num_classes),
    }


def unigru_classifier_forward(params, X, *, train=False, rng=None,
                              dropout_rate=0.2):
    B, T, _ = X.shape
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    _, h_last = gru_ops.bigru(X, lengths, params["gru"], bidirectional=False)
    if train and rng is not None:
        h_last = dropout(h_last, dropout_rate, rng, train)
    return dense(h_last, params["head"])


# ----------------------------------------------------------------------------
# ReducedBiGRU: 1-layer BiGRU(h=64) + mean pool + linear head
# ----------------------------------------------------------------------------

def init_reduced_bigru(key, d_in: int, num_classes: int, hidden: int = 64):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "gru": [{
            "fwd": gru_dir_init(k0, d_in, hidden),
            "bwd": gru_dir_init(k1, d_in, hidden),
        }],
        "head": linear_init(k2, 2 * hidden, num_classes),
    }


def reduced_bigru_forward(params, X):
    B, T, _ = X.shape
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    out, _ = gru_ops.bigru(X, lengths, params["gru"], bidirectional=True)
    return dense(masked_mean_pool(out), params["head"])


# ----------------------------------------------------------------------------
# SummaryMLP: clip -> [mean(D), std(D)] summary -> 3-layer MLP
# ----------------------------------------------------------------------------

def clip_to_summary(X: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
    """(B, T, D) -> (B, 2D) [per-dim mean, per-dim std] summary feature
    (inactive/train_5_quick.py:13-17; population std like np.std)."""
    if lengths is None:
        mu = jnp.mean(X, axis=1)
        sd = jnp.std(X, axis=1)
    else:
        mask = (jnp.arange(X.shape[1])[None, :] < lengths[:, None]).astype(X.dtype)
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mu = jnp.sum(X * mask[..., None], axis=1) / n
        var = jnp.sum(jnp.square(X - mu[:, None, :]) * mask[..., None], axis=1) / n
        sd = jnp.sqrt(var)
    return jnp.concatenate([mu, sd], axis=-1)


def init_mlp(key, in_dim: int, num_classes: int):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "fc0": linear_init(k0, in_dim, 128),
        "fc1": linear_init(k1, 128, 64),
        "fc2": linear_init(k2, 64, num_classes),
    }


def mlp_forward(params, feat, *, train=False, rng=None, dropout_rate=0.2):
    h = jax.nn.relu(dense(feat, params["fc0"]))
    if train and rng is not None:
        rng, r0 = jax.random.split(rng)
        h = dropout(h, dropout_rate, r0, train)
    h = jax.nn.relu(dense(h, params["fc1"]))
    if train and rng is not None:
        rng, r1 = jax.random.split(rng)
        h = dropout(h, dropout_rate, r1, train)
    return dense(h, params["fc2"])
