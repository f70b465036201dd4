"""VariantPredictor: dispatch by model tag + legacy torch schema loaders."""

import numpy as np
import torch
import torch.nn as nn

from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.infer import VariantPredictor
from silent_speech_tpu.train.legacy_loops import (
    MLPQuickConfig,
    ReducedConfig,
    UniGRUConfig,
    train_mlp_quick,
    train_reduced,
    train_unigru,
)


def test_variant_predictor_roundtrips(tmp_path, rng):
    corpus = tmp_path / "c"
    generate_corpus(str(corpus), clips_per_word=4,
                    words=["hello", "water", "thanks", "please", "apple"],
                    seed=6, with_roi=False)

    train_reduced(ReducedConfig(clip_dir=str(corpus),
                                out_path=str(tmp_path / "r.ckpt"),
                                epochs=2, batch_size=8, max_t=40), verbose=False)
    p = VariantPredictor.from_checkpoint(str(tmp_path / "r.ckpt"))
    X = rng.standard_normal((25, 180)).astype(np.float32)
    top = p.predict_features(X, k=3)
    assert len(top) == 3 and abs(sum(x[1] for x in
                                     p.predict_features(X, k=5)) - 1.0) < 1e-4

    train_unigru(UniGRUConfig(clip_dir=str(corpus),
                              out_path=str(tmp_path / "u.ckpt"),
                              epochs=2, batch_size=4, t_target=24), verbose=False)
    pu = VariantPredictor.from_checkpoint(str(tmp_path / "u.ckpt"))
    assert pu.zscore and pu.add_deltas
    assert len(pu.predict_features(X, k=2)) == 2

    train_mlp_quick(MLPQuickConfig(clip_dir=str(corpus),
                                   out_path=str(tmp_path / "m.ckpt"),
                                   epochs=2), verbose=False)
    pm = VariantPredictor.from_checkpoint(str(tmp_path / "m.ckpt"))
    assert len(pm.predict_features(X, k=1)) == 1


def test_temporal_cnn_torch_schema(tmp_path, rng):
    """The legacy word_model.pt schema (d_in/num_classes/model_state/id_to_word)."""

    class TorchTemporalCNN(nn.Module):
        def __init__(self, d_in, num_classes):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv1d(d_in, 128, 5, padding=2), nn.ReLU(),
                nn.Conv1d(128, 128, 5, padding=2), nn.ReLU(),
                nn.AdaptiveAvgPool1d(1))
            self.head = nn.Linear(128, num_classes)

        def forward(self, x):
            return self.head(self.net(x.transpose(1, 2)).squeeze(-1))

    torch.manual_seed(0)
    tm = TorchTemporalCNN(100, 7).eval()
    path = str(tmp_path / "word_model.pt")
    torch.save({
        "model_state": tm.state_dict(), "d_in": 100, "num_classes": 7,
        "id_to_word": {i: f"w{i}" for i in range(7)},
    }, path)

    p = VariantPredictor.from_torch_temporal_cnn(path)
    X = rng.standard_normal((30, 120)).astype(np.float32)  # wider: fix_dim trims
    top = p.predict_features(X, k=3)

    # reference pipeline: fix_dim then z-score then model
    Xf = X[:, :100]
    Xz = (Xf - Xf.mean(0, keepdims=True)) / (Xf.std(0, keepdims=True) + 1e-6)
    with torch.no_grad():
        ref = torch.softmax(tm(torch.from_numpy(Xz[None])), -1)[0].numpy()
    order = ref.argsort()[::-1]
    assert [w for w, _ in top] == [f"w{i}" for i in order[:3]]
    np.testing.assert_allclose([pr for _, pr in top], ref[order[:3]], atol=1e-3)
