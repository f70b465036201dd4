"""Training path of the fused TinyROICNN kernel (ops/pallas_cnn2_grad.py).

The backward is a recompute-in-VMEM Pallas kernel emitting weight grads
only; these tests pin it against the XLA autodiff path ('xla' roi_impl),
which itself is parity-tested against torch (test_train.py). All runs are
interpret-mode on the CPU backend (conftest pins the default device).

Reference protocol: train_model_official.py:426-443.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from silent_speech_tpu.models import bigru as model
from silent_speech_tpu.ops.pallas_cnn2_grad import roi_cnn_fused_train
from silent_speech_tpu.train.step import (
    StepConfig,
    make_batch_train_step,
    make_optimizer,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _grad_pair(p, roi, proj, standardize, f_tile):
    """(fused, xla) value+grads of a nonlinear scalar readout."""

    def loss_fused(p):
        out = roi_cnn_fused_train(roi, p, standardize=standardize,
                                  f_tile=f_tile, interpret=True)
        return jnp.sum(jnp.tanh(out) @ proj)

    def loss_xla(p):
        N = roi.shape[0]
        r = model.preprocess_roi(roi.reshape(1, N, 48, 96), standardize)
        return jnp.sum(jnp.tanh(model.roi_cnn_forward(p, r)[0]) @ proj)

    return (jax.value_and_grad(loss_fused)(p),
            jax.value_and_grad(loss_xla)(p))


def _assert_grads_close(g1, g2, tol):
    for k in g2:
        for kk in g2[k]:
            a, b = np.asarray(g1[k][kk]), np.asarray(g2[k][kk])
            scale = max(1e-6, float(np.abs(b).max()))
            assert np.abs(a - b).max() / scale < tol, (
                f"{k}/{kk}: rel err {np.abs(a - b).max() / scale:.2e}")


@pytest.mark.parametrize("standardize", [True, False])
def test_fused_train_grad_parity(rng, standardize):
    """Weight grads match XLA autodiff to f32 reassociation — both
    normalize modes, with the N % f_tile padding path exercised."""
    p = model.init_roi_cnn(jax.random.PRNGKey(1), 32)
    roi = jnp.asarray(rng.integers(0, 256, (10, 48, 96)), jnp.uint8)
    proj = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    (f1, g1), (f2, g2) = _grad_pair(p, roi, proj, standardize, f_tile=4)
    assert abs(float(f1) - float(f2)) < 1e-4
    _assert_grads_close(g1, g2, 5e-5)


def test_fused_train_tie_routing(rng):
    """Exact pool ties (constant frames -> equal conv outputs across w/h
    positions) must route gradient to the SAME first-match window slot as
    XLA's select-and-scatter (== torch MaxPool2d backward)."""
    p = model.init_roi_cnn(jax.random.PRNGKey(2), 32)
    # constant frames at several levels: every 2x2 window is an exact tie
    roi = jnp.broadcast_to(
        jnp.asarray([0, 37, 128, 255], jnp.uint8)[:, None, None],
        (4, 48, 96))
    proj = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    (_, g1), (_, g2) = _grad_pair(p, roi, proj, False, f_tile=4)
    _assert_grads_close(g1, g2, 5e-5)


def test_fused_train_input_cotangent_is_zero(rng):
    """The frame input is data: differentiating a float ROI through the
    fused path yields an exactly-zero input cotangent."""
    p = model.init_roi_cnn(jax.random.PRNGKey(3), 32)
    roi_f = jnp.asarray(rng.integers(0, 256, (4, 48, 96)), jnp.float32)

    g = jax.grad(lambda r: jnp.sum(roi_cnn_fused_train(
        r, p, standardize=True, f_tile=4, interpret=True)))(roi_f)
    assert np.asarray(g).max() == 0.0


def test_fused_train_rejects_bad_geometry():
    p = model.init_roi_cnn(jax.random.PRNGKey(4), 32)
    with pytest.raises(ValueError, match="48x96"):
        roi_cnn_fused_train(jnp.zeros((2, 96, 48), jnp.uint8), p)


def test_resolve_roi_impl(monkeypatch):
    """'auto' takes fused only on a real TPU, unsharded, 48x96 ROI, and
    >=2048 frames/step (the measured crossover: 1.08x at 2048 frames T=32,
    1.24x at 2560 frames T=80 — docs/TRAIN_PERF.md + docs/CTC_PERF.md);
    explicit impls pass through untouched."""
    from silent_speech_tpu.ops import pallas_gru
    from silent_speech_tpu.train.step import resolve_roi_impl

    mcfg = model.BiGRUConfig(x_dim=8, num_classes=3, use_roi=True)
    # CPU backend (default_interpret() True): auto always resolves to xla
    assert resolve_roi_impl("auto", mcfg, 8192) == "xla"
    for explicit in ("xla", "grouped", "fused"):
        assert resolve_roi_impl(explicit, mcfg, 8192) == explicit
    # pretend-TPU: the gates flip it
    monkeypatch.setattr(pallas_gru, "default_interpret", lambda: False)
    assert resolve_roi_impl("auto", mcfg, 8192) == "fused"
    assert resolve_roi_impl("auto", mcfg, 2048) == "fused"   # gate edge
    assert resolve_roi_impl("auto", mcfg, 512) == "xla"      # small batch
    assert resolve_roi_impl("auto", mcfg, 8192, sharded=True) == "xla"
    no_roi = model.BiGRUConfig(x_dim=8, num_classes=3, use_roi=False)
    assert resolve_roi_impl("auto", no_roi, 8192) == "xla"
    odd = model.BiGRUConfig(x_dim=8, num_classes=3, use_roi=True,
                            roi_h=96, roi_w=192)
    assert resolve_roi_impl("auto", odd, 8192) == "xla"


def test_sharded_train_step_fused(rng):
    """The fused custom-VJP kernel pair composes with the GSPMD-sharded
    train step (8-way DP on the virtual mesh) — the partitioner must not
    choke on the pallas_call boundary in either direction."""
    from silent_speech_tpu.parallel.mesh import mesh_from_shape
    from silent_speech_tpu.parallel.train_sharded import (
        make_sharded_train_step)

    mcfg = model.BiGRUConfig(x_dim=12, num_classes=4, hidden=16,
                             gru_layers=1, roi_emb=8, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    mesh = mesh_from_shape({"data": 8})
    scfg = StepConfig(model=mcfg, roi_impl="fused")
    opt = make_optimizer(1e-3)
    sp, ss, run = make_sharded_train_step(scfg, opt, mesh, params)
    B, T = 8, 4
    X = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    L = jnp.asarray(rng.integers(2, T + 1, B), jnp.int32)
    R = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96)), jnp.uint8)
    y = jnp.asarray(rng.integers(0, 4, B), jnp.int32)
    p2, _, m = run(sp, ss, jax.random.PRNGKey(1), X, L, R, y)
    assert np.isfinite(float(m["loss"]))
    # params actually moved
    d0 = np.abs(np.asarray(p2["roi_cnn"]["conv0"]["w"])
                - np.asarray(params["roi_cnn"]["conv0"]["w"])).max()
    assert d0 > 0


def test_one_step_training_parity_fused(rng):
    """A full train step (forward, CE loss, backward, clip, Adam) with
    roi_impl='fused' lands within f32 reassociation of the 'xla' step —
    every parameter, including the non-CNN ones whose grads flow through
    the fused embedding."""
    mcfg = model.BiGRUConfig(x_dim=12, num_classes=4, hidden=16,
                             gru_layers=1, roi_emb=8, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(5), mcfg)
    B, T = 3, 8
    X = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    lengths = jnp.asarray([8, 6, 5], jnp.int32)
    roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96)), jnp.uint8)
    y = jnp.asarray([0, 2, 1], jnp.int32)

    outs = {}
    for impl in ("xla", "fused"):
        scfg = StepConfig(model=mcfg, roi_impl=impl)
        opt = make_optimizer(1e-3)
        opt_state = opt.init(params)
        step = make_batch_train_step(scfg, opt)
        p2, _, _, metrics = step(jax.tree.map(jnp.copy, params),
                                 opt_state, jax.random.PRNGKey(0),
                                 X, lengths, roi, y)
        outs[impl] = (p2, metrics)

    m_x, m_f = outs["xla"][1], outs["fused"][1]
    assert abs(float(m_x["loss"]) - float(m_f["loss"])) < 1e-5
    flat_x = jax.tree_util.tree_leaves_with_path(outs["xla"][0])
    flat_f = dict(jax.tree_util.tree_leaves_with_path(outs["fused"][0]))
    for path, leaf_x in flat_x:
        leaf_f = flat_f[path]
        diff = np.abs(np.asarray(leaf_x) - np.asarray(leaf_f)).max()
        # Adam normalizes each grad by its own magnitude, so f32
        # reassociation noise on near-zero grads is amplified toward the
        # lr (1e-3) scale — 3e-4 bounds that without masking real bugs
        assert diff < 3e-4, f"{jax.tree_util.keystr(path)}: {diff:.2e}"
