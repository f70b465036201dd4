"""CTC loss vs torch.nn.CTCLoss; dictionary word scoring vs a from-spec
numpy port of the reference forward algorithm (inactive/train_model.py:167-189)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from silent_speech_tpu.ops.ctc import (
    ctc_loss,
    ctc_word_logprob,
    ctc_word_logprobs_batch,
    length_prior_penalty,
)


def _rand_log_probs(rng, B, T, C):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    return np.asarray(
        F.log_softmax(torch.from_numpy(logits), dim=-1).numpy(), np.float32
    )


def _np_word_logprob(lp_tc, word_ids, blank=0):
    """Direct numpy port of the reference recursion (spec, not code)."""
    ext = [blank]
    for c in word_ids:
        ext += [c, blank]
    S, T = len(ext), lp_tc.shape[0]
    alpha = np.full(S, -1e9)
    alpha[0] = lp_tc[0, blank]
    if S > 1:
        alpha[1] = lp_tc[0, ext[1]]
    for t in range(1, T):
        prev = alpha.copy()
        for s in range(S):
            cand = [prev[s]]
            if s > 0:
                cand.append(prev[s - 1])
            if s > 1 and ext[s] != blank and ext[s] != ext[s - 2]:
                cand.append(prev[s - 2])
            alpha[s] = np.logaddexp.reduce(cand) + lp_tc[t, ext[s]]
    return np.logaddexp(alpha[-1], alpha[-2])


def test_ctc_loss_matches_torch(rng):
    B, T, C = 4, 25, 27
    lp = _rand_log_probs(rng, B, T, C)
    input_lengths = np.array([25, 18, 25, 9], np.int32)
    label_lengths = np.array([5, 3, 7, 2], np.int32)
    L = label_lengths.max()
    labels = np.zeros((B, L), np.int64)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(1, C, size=label_lengths[b])

    ref = torch.nn.CTCLoss(blank=0, zero_infinity=True)(
        torch.from_numpy(lp).transpose(0, 1),
        torch.from_numpy(labels),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
    ).item()

    got = ctc_loss(
        jnp.asarray(lp), jnp.asarray(input_lengths),
        jnp.asarray(labels.astype(np.int32)), jnp.asarray(label_lengths),
    )
    np.testing.assert_allclose(float(got), ref, atol=1e-4, rtol=1e-4)


def test_word_logprob_matches_reference_spec(rng):
    T, C = 30, 27
    lp = _rand_log_probs(rng, 1, T, C)[0]
    for word in [[8, 5, 12, 12, 15], [1], [3, 3, 3]]:  # incl. repeated chars
        ref = _np_word_logprob(lp, word)
        L_pad = 8
        ids = np.zeros(L_pad, np.int32)
        ids[: len(word)] = word
        got = ctc_word_logprob(
            jnp.asarray(lp), jnp.asarray(ids),
            jnp.asarray(np.int32(len(word))), jnp.asarray(np.int32(T)),
        )
        np.testing.assert_allclose(float(got), ref, atol=1e-4, rtol=1e-4)


def test_word_logprob_respects_input_length(rng):
    """Scoring a truncated clip must equal scoring lp[:T_true]."""
    T, C = 40, 27
    lp = _rand_log_probs(rng, 1, T, C)[0]
    word = [20, 5, 19]
    ids = np.zeros(6, np.int32)
    ids[:3] = word
    got = ctc_word_logprob(
        jnp.asarray(lp), jnp.asarray(ids),
        jnp.asarray(np.int32(3)), jnp.asarray(np.int32(22)),
    )
    ref = _np_word_logprob(lp[:22], word)
    np.testing.assert_allclose(float(got), ref, atol=1e-4, rtol=1e-4)


def test_dictionary_batch_scoring(rng):
    T, C = 26, 27
    lp = _rand_log_probs(rng, 1, T, C)[0]
    words = [[25, 5, 19], [14, 15], [8, 5, 12, 12, 15], [1, 21, 18, 1]]
    L = max(len(w) for w in words)
    ids = np.zeros((len(words), L), np.int32)
    lens = np.zeros(len(words), np.int32)
    for i, w in enumerate(words):
        ids[i, : len(w)] = w
        lens[i] = len(w)
    scores = ctc_word_logprobs_batch(
        jnp.asarray(lp), jnp.asarray(ids), jnp.asarray(lens),
        jnp.asarray(np.int32(T)),
    )
    for i, w in enumerate(words):
        np.testing.assert_allclose(
            float(scores[i]), _np_word_logprob(lp, w), atol=1e-4, rtol=1e-4
        )
    # length-prior penalty (inactive/train_model.py:245-248)
    pen = length_prior_penalty(scores, jnp.asarray(lens), jnp.asarray(np.int32(T)),
                               len_lambda=0.02)
    ref_pen = np.asarray(scores) - 0.02 * np.abs(T - lens * 5)
    np.testing.assert_allclose(np.asarray(pen), ref_pen, atol=1e-5)


def test_ctc_dict_chunked_equals_oneshot(rng):
    """chunk_words=N (the open-vocabulary HBM bound, docs/CTC_PERF.md) must
    reproduce the one-shot vmapped sweep exactly, including the padded
    ragged tail chunk."""
    import jax

    from silent_speech_tpu.infer.ctc_decode import CTCDecoder, Dictionary
    from silent_speech_tpu.models import ctc_model

    params = ctc_model.init_params(jax.random.PRNGKey(0), 180, hidden=16,
                                   gru_layers=2, roi_emb=4)
    words = ["yes", "no", "hello", "please", "thanks", "six", "seven",
             "lebron", "aura", "fahhh"]
    d = Dictionary.from_words(words)
    X = rng.standard_normal((20, 180)).astype(np.float32)
    X[:, -3] = 1.0  # openness channel active: silence trim keeps all frames
    R = rng.integers(0, 256, (20, 48, 96), dtype=np.uint8)

    one = CTCDecoder(params, d, max_t=24).score_clip(X, R)
    for cw in (3, 4, 10, 64):  # ragged tail, exact division, >N
        chunked = CTCDecoder(params, d, max_t=24,
                             chunk_words=cw).score_clip(X, R)
        assert [w for w, _ in chunked] == [w for w, _ in one]
        np.testing.assert_allclose([s for _, s in chunked],
                                   [s for _, s in one], rtol=1e-5, atol=1e-5)

    import pytest

    with pytest.raises(ValueError, match="chunk_words"):
        CTCDecoder(params, d, max_t=24, chunk_words=-1)
