"""Trained-golden parity: retrain the PyTorch reference protocol on a
synthetic corpus, then require our framework to reproduce its logits and
argmax decisions corpus-wide through weight import.

The reference's official checkpoint was stripped from the snapshot
(.MISSING_LARGE_BLOBS), so SURVEY.md's parity protocol is to create the
golden by training the reference architecture ourselves (pinned seed) and
locking both frameworks to it. This is BASELINE config #1's acceptance bar:
argmax-word parity and logits within 1e-3 of the torch live forward.
"""

import glob

import numpy as np
import torch

import jax.numpy as jnp

from silent_speech_tpu.core.schema import load_clip
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.infer import Predictor
from tests.test_model_parity import _TorchBiGRUClassifier

WORDS5 = ["yes", "no", "hello", "thanks", "please"]


def _train_torch_golden(files, label_to_id, max_t=48, epochs=4, seed=42):
    """A compact torch training loop with the reference protocol's loss and
    optimizer (Adam 3e-4, CE ls=0.05, grad clip 1.0) on padded batches."""
    torch.manual_seed(seed)
    tm = _TorchBiGRUClassifier(180, len(label_to_id), use_roi=True,
                               standardize_roi=True)
    opt = torch.optim.Adam(tm.parameters(), lr=3e-4)
    loss_fn = torch.nn.CrossEntropyLoss(label_smoothing=0.05)

    clips = [load_clip(f).aligned() for f in files]
    X = np.zeros((len(clips), max_t, 180), np.float32)
    R = np.zeros((len(clips), max_t, 48, 96), np.uint8)
    L = np.zeros(len(clips), np.int64)
    y = np.zeros(len(clips), np.int64)
    for i, c in enumerate(clips):
        T = min(c.T, max_t)
        X[i, :T] = c.X[:T]
        R[i, :T] = c.roi[:T]
        L[i] = T
        y[i] = label_to_id[c.label]

    tm.train()
    for _ in range(epochs):
        for s in range(0, len(clips), 8):
            e = s + 8
            logits = tm(torch.from_numpy(X[s:e]), torch.from_numpy(L[s:e]),
                        torch.from_numpy(R[s:e]))
            loss = loss_fn(logits, torch.from_numpy(y[s:e]))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
            opt.step()
    tm.eval()
    return tm, (X, R, L, y)


def test_trained_golden_corpus_parity(tmp_path):
    corpus = tmp_path / "clips"
    generate_corpus(str(corpus), clips_per_word=4, words=WORDS5, seed=42)
    files = sorted(glob.glob(str(corpus / "*.npz")))
    labels = sorted(WORDS5)
    label_to_id = {l: i for i, l in enumerate(labels)}

    tm, (X, R, L, y) = _train_torch_golden(files, label_to_id)

    # golden checkpoint in the reference schema
    ckpt = {
        "model": tm.state_dict(), "x_dim": 180, "max_t": 48, "use_roi": True,
        "roi_w": 96, "roi_h": 48, "labels": labels,
        "label_to_id": label_to_id,
        "id_to_label": {i: l for l, i in label_to_id.items()}, "seed": 42,
    }
    golden = str(tmp_path / "golden.pt")
    torch.save(ckpt, golden)

    # the torch LIVE forward (no ROI standardization) is the parity target
    live = _TorchBiGRUClassifier(180, len(labels), use_roi=True,
                                 standardize_roi=False)
    live.load_state_dict(tm.state_dict())
    live.eval()
    with torch.no_grad():
        ref_logits = live(torch.from_numpy(X), torch.from_numpy(L),
                          torch.from_numpy(R)).numpy()

    pred = Predictor.from_torch_checkpoint(golden)
    ours = pred.predict_batch(X, L.astype(np.int32), R)

    np.testing.assert_allclose(ours, ref_logits, atol=1e-3, rtol=1e-4)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()

    # the fused Pallas CNN path must hold the same bar on REAL torch weights
    fused = Predictor.from_torch_checkpoint(golden, roi_impl="fused")
    ours_f = fused.predict_batch(X, L.astype(np.int32), R)
    np.testing.assert_allclose(ours_f, ref_logits, atol=1e-3, rtol=1e-4)
    assert (ours_f.argmax(-1) == ref_logits.argmax(-1)).all()

    # the trained golden must have learned something (sanity: beats chance)
    acc = float((ref_logits.argmax(-1) == y).mean())
    assert acc > 0.3
