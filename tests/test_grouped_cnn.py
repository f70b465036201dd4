"""Grouped-conv TinyROICNN: bitwise parity with the per-frame path."""

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.models.bigru import (
    BiGRUConfig,
    init_params,
    init_roi_cnn,
    live_forward,
    preprocess_roi,
    roi_cnn_forward,
)
from silent_speech_tpu.ops.grouped_cnn import roi_cnn_grouped


def test_grouped_matches_per_frame(rng):
    params = init_roi_cnn(jax.random.PRNGKey(0))
    roi = rng.integers(0, 256, (32, 48, 96), dtype=np.uint8)
    r = preprocess_roi(jnp.asarray(roi)[None], False)[0]  # (32, 48, 96) f32
    ref = np.asarray(roi_cnn_forward(params, r[None]))[0]
    got = np.asarray(roi_cnn_grouped(params, r, group=16))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_grouped_ragged_batch_falls_back(rng):
    """N not divisible by the group size: divisor fallback keeps parity."""
    params = init_roi_cnn(jax.random.PRNGKey(1))
    roi = rng.integers(0, 256, (30, 48, 96), dtype=np.uint8)  # 30 = 2*15
    r = preprocess_roi(jnp.asarray(roi)[None], False)[0]
    ref = np.asarray(roi_cnn_forward(params, r[None]))[0]
    got = np.asarray(roi_cnn_grouped(params, r, group=16))  # falls to G=2
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_train_step_with_grouped_impl_matches_xla(rng):
    """roi_impl='grouped' is differentiable and trains identically: one full
    Adam step (gather+augment off, fixed rng) lands on the same params as the
    per-frame path to fp32 round-off."""
    import optax

    from silent_speech_tpu.train.step import StepConfig, make_batch_train_step, make_optimizer

    cfg = BiGRUConfig(x_dim=12, num_classes=4, use_roi=True, hidden=16,
                      roi_emb=8, head_hidden=8)
    params = init_params(jax.random.PRNGKey(3), cfg)
    opt = make_optimizer(1e-3)
    X = jnp.asarray(rng.standard_normal((4, 12, 12)).astype(np.float32))
    L = jnp.asarray(np.asarray([12, 7, 9, 12], np.int32))
    R = jnp.asarray(rng.integers(0, 256, (4, 12, 48, 96), dtype=np.uint8))
    y = jnp.asarray(np.asarray([0, 1, 2, 3], np.int32))

    outs = {}
    for impl in ("xla", "grouped"):
        scfg = StepConfig(model=cfg, augment=None, roi_impl=impl)
        step = make_batch_train_step(scfg, opt)
        p, _, _, m = step(jax.tree.map(jnp.copy, params), opt.init(params),
                          jax.random.PRNGKey(9), X, L, R, y)
        outs[impl] = (p, float(m["loss"]))

    assert np.isclose(outs["xla"][1], outs["grouped"][1], atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        outs["xla"][0], outs["grouped"][0],
    )


def test_model_forward_with_grouped_impl(rng):
    cfg = BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = init_params(jax.random.PRNGKey(2), cfg)
    X = jnp.asarray(rng.standard_normal((2, 16, 180)).astype(np.float32))
    L = jnp.asarray(np.asarray([16, 9], np.int32))
    R = jnp.asarray(rng.integers(0, 256, (2, 16, 48, 96), dtype=np.uint8))
    ref = np.asarray(live_forward(params, cfg, X, L, R))
    got = np.asarray(live_forward(params, cfg, X, L, R, roi_impl="grouped"))
    np.testing.assert_allclose(got, ref, atol=1e-5)
