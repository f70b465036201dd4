"""CTC flagship treatment: serving/training knob parity on the CTC model
(models/ctc_model.forward gained the official model's roi_impl/gru_impl/
matmul_precision surface), batched dictionary sweeps, and the sharded
eval-ctc path. All on the CPU backend (fused kernel in interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.infer.ctc_decode import CTCDecoder, Dictionary
from silent_speech_tpu.models import ctc_model


@pytest.fixture(scope="module")
def ctc_setup():
    params = ctc_model.init_params(
        jax.random.PRNGKey(3), 180, hidden=24, gru_layers=2, roi_emb=8)
    rng = np.random.default_rng(7)
    B, T = 3, 12
    X = rng.standard_normal((B, T, 180)).astype(np.float32)
    R = rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8)
    L = np.array([12, 7, 3], np.int32)
    return params, jnp.asarray(X), jnp.asarray(R), jnp.asarray(L)


def _fwd(params, X, R, L, **kw):
    return np.asarray(ctc_model.forward(params, X, R, L, **kw))


def test_u8_input_matches_float_collate(ctc_setup):
    """Shipping raw uint8 and normalizing on-device must be bitwise the
    reference collate division (inactive/train_model.py:109)."""
    params, X, R, L = ctc_setup
    ref = _fwd(params, X, R.astype(jnp.float32) / 255.0, L)
    got = _fwd(params, X, R, L)
    np.testing.assert_array_equal(got, ref)


def test_roi_impl_parity(ctc_setup):
    """grouped is bitwise the xla path; fused (interpret) within kernel
    reassociation tolerance — the same bars as the official model's
    (tests/test_grouped_cnn.py, tests/test_pallas_cnn2.py)."""
    params, X, R, L = ctc_setup
    ref = _fwd(params, X, R, L)
    np.testing.assert_array_equal(_fwd(params, X, R, L, roi_impl="grouped"),
                                  ref)
    got = _fwd(params, X, R, L, roi_impl="fused")
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_rejects_float_input(ctc_setup):
    params, X, R, L = ctc_setup
    with pytest.raises(ValueError, match="uint8"):
        _fwd(params, X, R.astype(jnp.float32) / 255.0, L, roi_impl="fused")


def test_gru_impl_pallas_parity(ctc_setup):
    """The Pallas sequence kernel on the 3-layer CTC stack (interpret mode
    = bit-identical math to on-chip; drift bar mirrors docs/GRU_PERF.md)."""
    params, X, R, L = ctc_setup
    ref = _fwd(params, X, R, L)
    got = _fwd(params, X, R, L, gru_impl="pallas")
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
    # per-frame argmax (the decode-relevant quantity) must be exact
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_precision_modes_and_bf16(ctc_setup):
    """'parity' is exact on the CPU backend (true-f32 matmuls already);
    bf16 compute returns finite f32 log-probs."""
    params, X, R, L = ctc_setup
    ref = _fwd(params, X, R, L)
    np.testing.assert_array_equal(
        _fwd(params, X, R, L, matmul_precision="parity"), ref)
    np.testing.assert_array_equal(
        _fwd(params, X, R, L, matmul_precision="highest"), ref)
    with pytest.raises(ValueError, match="sites"):
        _fwd(params, X, R, L, matmul_precision={"bogus": "highest"})
    lp16 = _fwd(params, X, R, L, compute_dtype=jnp.bfloat16)
    assert lp16.dtype == np.float32 and np.isfinite(lp16).all()


def test_train_forward_fused_vjp(ctc_setup):
    """CTC loss grads through roi_impl='fused' (the custom-VJP pair) match
    XLA autodiff — the train-ctc fast path."""
    from silent_speech_tpu.ops.ctc import ctc_loss

    params, X, R, L = ctc_setup
    y = jnp.asarray([[8, 9, 0], [3, 0, 0], [5, 2, 1]], jnp.int32)
    ylen = jnp.asarray([2, 1, 3], jnp.int32)
    rng = jax.random.PRNGKey(0)

    def loss(params, roi_impl):
        lp = ctc_model.forward(params, X, R, L, train=True, rng=rng,
                               roi_impl=roi_impl)
        return ctc_loss(lp, L, y, ylen)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_fused = jax.grad(lambda p: loss(p, "fused"))(params)
    for ref, got in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        scale = max(1e-3, float(jnp.max(jnp.abs(ref))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5 * scale, rtol=5e-4)


def _mk_decoder(params, words, **kw):
    return CTCDecoder(params, Dictionary.from_words(words), max_t=16, **kw)


def test_score_batch_matches_per_clip(ctc_setup):
    """The batched corpus sweep (eval-ctc) must reproduce the per-clip
    scores, including the chunked dictionary path."""
    params, X, R, L = ctc_setup
    words = ["yes", "no", "hello", "please", "thanks"]
    rng = np.random.default_rng(11)
    B, T = 4, 16
    Xc = rng.standard_normal((B, T, 180)).astype(np.float32)
    Xc[:, :, -3] = 1.0  # openness active: trim keeps all frames
    Rc = rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8)

    for cw in (0, 2):
        dec = _mk_decoder(params, words, chunk_words=cw)
        got = dec.score_batch(Xc, Rc, np.full((B,), T, np.int32))
        assert got.shape == (B, len(words))
        for b in range(B):
            per_clip = dec.score_clip(Xc[b], Rc[b])
            ref = {w: s for w, s in per_clip}
            np.testing.assert_allclose(
                got[b], [ref[w] for w in words], rtol=1e-5, atol=1e-5)


def test_ctc_decoder_sharded_sweep(ctc_setup):
    """CTCDecoder.shard over the virtual mesh: exact parity with the
    unsharded batched sweep, including the ragged pad/slice."""
    from silent_speech_tpu.parallel.mesh import mesh_from_shape

    params, X, R, L = ctc_setup
    words = ["yes", "no", "hello"]
    rng = np.random.default_rng(13)
    B, T = 5, 16  # 5 % 4 != 0: exercises the pad path
    Xc = rng.standard_normal((B, T, 180)).astype(np.float32)
    Rc = rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8)
    Lc = np.array([16, 9, 4, 12, 7], np.int32)

    ref = _mk_decoder(params, words).score_batch(Xc, Rc, Lc)
    dec = _mk_decoder(params, words).shard(mesh_from_shape({"data": 4}))
    got = dec.score_batch(Xc, Rc, Lc)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_evaluate_ctc_dataset_batched_and_sharded(tmp_path):
    """eval-ctc end-to-end on a synthetic corpus: the batched sweep scores
    every clip, and mesh_shape produces identical accuracy/confusions."""
    from silent_speech_tpu.core.config import CTCTrainConfig
    from silent_speech_tpu.data.synthetic import generate_corpus
    from silent_speech_tpu.infer.evaluator import evaluate_ctc_dataset
    from silent_speech_tpu.train import train_ctc

    corpus = tmp_path / "clips"
    generate_corpus(str(corpus), clips_per_word=3, words=["yes", "no"],
                    seed=5)
    cfg = CTCTrainConfig(
        clip_dir=str(corpus), out_path=str(tmp_path / "ctc.ckpt"),
        epochs=1, patience=1, batch_size=4, max_t=40,
        hidden=16, gru_layers=2, roi_emb=8,
    )
    train_ctc(cfg, verbose=False)

    r1 = evaluate_ctc_dataset(cfg.out_path, str(corpus), verbose=False,
                              batch_size=4)
    assert r1["n"] == 6
    r2 = evaluate_ctc_dataset(cfg.out_path, str(corpus), verbose=False,
                              batch_size=4, mesh_shape={"data": 2},
                              chunk_words=1)
    assert r2["accuracy"] == r1["accuracy"]
    assert r2["n"] == r1["n"]
    assert sorted(r2["confusions"]) == sorted(r1["confusions"])
