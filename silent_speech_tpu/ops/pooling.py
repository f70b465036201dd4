"""Temporal pooling ops.

``attn_pool`` is the learned 1-query pooling of the official model
(reference: train_model_official.py:231-248); ``masked_mean_pool`` covers the
mean-pool variants (inactive/train_reduced.py:142-145, live_feed.py:47-50).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

NEG_INF = -1e9  # masked-score fill, matching the reference's masked_fill(-1e9)


def length_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) bool validity mask."""
    return jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]


def attn_pool(h: jnp.ndarray, lengths: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Masked single-query attention pooling.

    h: (B, T, H); params: {'score': {'w': (H, 1), 'b': (1,)}}.
    Returns (B, H).
    """
    B, T, H = h.shape
    scores = (
        jnp.einsum("bth,ho->bto", h, params["score"]["w"].astype(h.dtype))
        + params["score"]["b"].astype(h.dtype)
    ).squeeze(-1)  # (B, T)
    mask = length_mask(lengths, T)
    scores = jnp.where(mask, scores, NEG_INF)
    w = jnn.softmax(scores, axis=1)[..., None]  # (B, T, 1)
    return jnp.sum(h * w, axis=1)


def masked_mean_pool(h: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean over time. With ``lengths=None`` averages all T positions
    (the reference mean-pool models average padding too — kept for parity);
    with lengths, averages only valid frames."""
    if lengths is None:
        return jnp.mean(h, axis=1)
    mask = length_mask(lengths, h.shape[1]).astype(h.dtype)[..., None]
    s = jnp.sum(h * mask, axis=1)
    n = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return s / n
