"""Pallas GRU sequence kernel vs the scan reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.ops.gru import bigru, gru_layer_single_direction
from silent_speech_tpu.ops.nn import gru_dir_init
from silent_speech_tpu.ops.pallas_gru import bigru_pallas, gru_layer_pallas


def _params(key, d, h):
    return gru_dir_init(key, d, h)


def test_pallas_matches_scan_forward(rng):
    B, T, D, H = 12, 9, 16, 8
    p = _params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([9, 3, 7, 1, 9, 5, 2, 8, 4, 6, 9, 9], np.int32))
    ref, _ = gru_layer_single_direction(x, lengths, p)
    got = gru_layer_pallas(x, lengths, p, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_matches_scan_reverse(rng):
    B, T, D, H = 4, 7, 6, 8
    p = _params(jax.random.PRNGKey(1), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([7, 2, 5, 6], np.int32))
    ref, _ = gru_layer_single_direction(x, lengths, p, reverse=True)
    got = gru_layer_pallas(x, lengths, p, reverse=True, batch_tile=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_bigru_stack(rng):
    B, T, D, H = 6, 11, 10, 8
    layers = [
        {"fwd": _params(jax.random.PRNGKey(2), D, H),
         "bwd": _params(jax.random.PRNGKey(3), D, H)},
        {"fwd": _params(jax.random.PRNGKey(4), 2 * H, H),
         "bwd": _params(jax.random.PRNGKey(5), 2 * H, H)},
    ]
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([11, 4, 8, 2, 11, 6], np.int32))
    ref, _ = bigru(x, lengths, layers)
    got = bigru_pallas(x, lengths, layers, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_batch_padding(rng):
    """B not divisible by the tile: padding rows must not leak into output."""
    B, T, D, H = 5, 6, 4, 8
    p = _params(jax.random.PRNGKey(6), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([6, 1, 3, 6, 2], np.int32))
    ref, _ = gru_layer_single_direction(x, lengths, p)
    got = gru_layer_pallas(x, lengths, p, batch_tile=4, interpret=True)
    assert got.shape == (B, T, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
