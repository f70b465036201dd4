"""Fused Pallas TinyROICNN vs the XLA reference path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.models.bigru import (
    init_roi_cnn,
    preprocess_roi,
    roi_cnn_forward,
)
from silent_speech_tpu.ops.pallas_cnn import pack_roi_cnn_params, roi_cnn_pallas


def _ref(params, roi_u8, standardize):
    r = preprocess_roi(roi_u8[None], standardize)  # (1, N, H, W)
    return np.asarray(roi_cnn_forward(params, r))[0]


def test_fused_cnn_matches_xla(rng):
    params = init_roi_cnn(jax.random.PRNGKey(0))
    packed = pack_roi_cnn_params(params)
    roi = rng.integers(0, 256, (16, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    got = np.asarray(roi_cnn_pallas(jnp.asarray(roi), packed, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused_cnn_standardize_path(rng):
    params = init_roi_cnn(jax.random.PRNGKey(1))
    packed = pack_roi_cnn_params(params)
    roi = rng.integers(0, 256, (16, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=True)
    got = np.asarray(
        roi_cnn_pallas(jnp.asarray(roi), packed, standardize=True, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_cnn_ragged_batch(rng):
    """N not divisible by the 16-frame tile."""
    params = init_roi_cnn(jax.random.PRNGKey(2))
    packed = pack_roi_cnn_params(params)
    roi = rng.integers(0, 256, (21, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    got = np.asarray(roi_cnn_pallas(jnp.asarray(roi), packed, interpret=True))
    assert got.shape == (21, 32)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
