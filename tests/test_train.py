"""End-to-end training on a synthetic corpus + checkpoint round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.core.config import TrainConfig
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.models import bigru as model
from silent_speech_tpu.train import (
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    smoothed_cross_entropy,
    train,
)


def test_smoothed_ce_matches_torch():
    import torch

    logits = np.array([[2.0, 0.5, -1.0], [0.1, 0.2, 0.3]], np.float32)
    y = np.array([0, 2])
    ref = torch.nn.CrossEntropyLoss(label_smoothing=0.05)(
        torch.from_numpy(logits), torch.from_numpy(y)
    ).item()
    got = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(y), 3, 0.05))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_train_overfits_synthetic_corpus(tmp_path):
    corpus = tmp_path / "clips_npz"
    generate_corpus(str(corpus), clips_per_word=6,
                    words=["yes", "no", "hello", "thanks", "please"], seed=7)
    cfg = TrainConfig(
        clip_dir=str(corpus),
        out_path=str(tmp_path / "model.ckpt"),
        epochs=12,
        patience=12,
        batch_size=10,
        max_t=60,
        lr=1e-3,
    )
    result = train(cfg, verbose=False)
    # separable synthetic classes: must beat 5-way chance (0.2) decisively
    assert result["best_acc"] >= 0.4
    assert result["history"][-1]["train_acc"] >= 0.5
    assert (tmp_path / "model.ckpt").exists()

    params, meta, _ = load_checkpoint(cfg.out_path)
    assert meta["x_dim"] == 180 and meta["use_roi"] is True
    assert meta["labels"] == ["hello", "no", "please", "thanks", "yes"]
    assert meta["gru_layers"] == 2

    # restored params give identical logits to the in-memory best params
    mcfg = result["model_config"]
    rng = np.random.default_rng(0)
    X = rng.standard_normal((2, 60, 180)).astype(np.float32)
    roi = rng.integers(0, 256, (2, 60, 48, 96), dtype=np.uint8)
    lengths = np.array([60, 31], np.int32)
    a = model.live_forward(result["params"], mcfg, jnp.asarray(X),
                           jnp.asarray(lengths), jnp.asarray(roi))
    b = model.live_forward(params, mcfg, jnp.asarray(X),
                           jnp.asarray(lengths), jnp.asarray(roi))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_bf16_compute_learns(tmp_path):
    """The advertised bf16 training mode (compute_dtype='bfloat16') must
    actually learn, not just run: params stay f32 (the optimizer state and
    updates are full precision), only activations compute in bf16."""
    corpus = tmp_path / "clips_npz"
    generate_corpus(str(corpus), clips_per_word=5,
                    words=["yes", "no", "hello"], seed=3)
    cfg = TrainConfig(
        clip_dir=str(corpus),
        out_path=str(tmp_path / "model_bf16.ckpt"),
        epochs=10,
        patience=10,
        batch_size=8,
        max_t=40,
        lr=1e-3,
        compute_dtype="bfloat16",
    )
    result = train(cfg, verbose=False)
    assert result["history"][-1]["train_acc"] >= 0.5  # beats 3-way chance
    # master params remained f32
    leaf = jax.tree.leaves(result["params"])[0]
    assert leaf.dtype == jnp.float32


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    key = jax.random.PRNGKey(0)
    mcfg = model.BiGRUConfig(x_dim=16, num_classes=3, use_roi=False, hidden=8)
    params = model.init_params(key, mcfg)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    # take one step so opt state is non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = opt.update(grads, opt_state, params)

    leaves = jax.tree.leaves(opt_state)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, params, {"x_dim": 16}, opt_state_arrays=leaves)
    p2, meta, opt_leaves = load_checkpoint(path)
    assert meta["x_dim"] == 16
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(leaves, opt_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_host_data_path(tmp_path):
    """host_data=True: corpus stays in host RAM, batches ship per step."""
    corpus = tmp_path / "hc"
    generate_corpus(str(corpus), clips_per_word=4, words=["yes", "no"], seed=8)
    cfg = TrainConfig(
        clip_dir=str(corpus), out_path=str(tmp_path / "hm.ckpt"),
        epochs=2, patience=5, batch_size=4, max_t=40, host_data=True,
    )
    r = train(cfg, verbose=False)
    assert len(r["history"]) == 2
    assert (tmp_path / "hm.ckpt").exists()
