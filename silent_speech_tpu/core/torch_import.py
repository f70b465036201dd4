"""One-way PyTorch -> JAX weight conversion.

Maps the reference checkpoints' ``state_dict`` layouts onto this framework's
param pytrees so models trained with the reference scripts load directly
(SURVEY.md section 5, checkpoint/resume: gate order r,z,n and
``weight_ih_l{k}{_reverse}`` conventions).

Layout transforms:
- Linear:  torch (out, in) -> ours (in, out): transpose.
- Conv2d:  torch OIHW -> ours HWIO: transpose (2, 3, 1, 0).
- Conv1d:  torch OIW -> ours WIO: transpose (2, 1, 0).
- GRU:     torch ``weight_ih_l{k}``: (3H, in) with gate rows ordered r,z,n ->
  ours ``wi``: (in, 3H) with gate *columns* r,z,n: plain transpose preserves
  gate order. Same for ``weight_hh`` / biases; ``_reverse`` suffix -> 'bwd'.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor or ndarray -> float32 ndarray."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, prefix):
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _conv2d(sd, prefix):
    return {
        "w": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _conv1d(sd, prefix):
    return {
        "w": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _layer_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _gru_dir(sd, prefix, layer, reverse):
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": _np(sd[f"{prefix}.weight_ih_{sfx}"]).T,
        "wh": _np(sd[f"{prefix}.weight_hh_{sfx}"]).T,
        "bi": _np(sd[f"{prefix}.bias_ih_{sfx}"]),
        "bh": _np(sd[f"{prefix}.bias_hh_{sfx}"]),
    }


def import_gru_stack(sd, prefix, num_layers, bidirectional=True):
    layers = []
    for li in range(num_layers):
        lp = {"fwd": _gru_dir(sd, prefix, li, False)}
        if bidirectional:
            lp["bwd"] = _gru_dir(sd, prefix, li, True)
        layers.append(lp)
    return layers


def import_roi_cnn(sd, prefix="roi_cnn"):
    """TinyROICNN: Sequential indices 0/3/6 are the convs, plus fc
    (train_model_official.py:209-229)."""
    return {
        "conv0": _conv2d(sd, f"{prefix}.net.0"),
        "conv1": _conv2d(sd, f"{prefix}.net.3"),
        "conv2": _conv2d(sd, f"{prefix}.net.6"),
        "fc": _linear(sd, f"{prefix}.fc"),
    }


def import_bigru_classifier(state_dict, *, gru_layers: int = 2, use_roi: bool = True):
    """Reference BiGRUClassifier state_dict -> models/bigru.py param pytree.

    Head Sequential layout: 0=LayerNorm, 1=Linear, 4=Linear
    (train_model_official.py:271-277).
    """
    sd = state_dict
    params = {
        "gru": import_gru_stack(sd, "gru", gru_layers, bidirectional=True),
        "pool": {"score": _linear(sd, "pool.score")},
        "head": {
            "ln": _layer_norm(sd, "head.0"),
            "fc1": _linear(sd, "head.1"),
            "fc2": _linear(sd, "head.4"),
        },
    }
    if use_roi:
        params["roi_cnn"] = import_roi_cnn(sd)
    return params


def import_bigru_ctc(state_dict, *, gru_layers: int = 3):
    """Reference BiGRUCTCWithROI state_dict -> models/ctc_model.py pytree
    (inactive/train_model.py:141-164: roi cnn + 3-layer BiGRU + proj)."""
    sd = state_dict
    return {
        "roi_cnn": import_roi_cnn(sd, "roi"),
        "gru": import_gru_stack(sd, "gru", gru_layers, bidirectional=True),
        "proj": _linear(sd, "proj"),
    }


def import_temporal_cnn(state_dict):
    """Reference TemporalCNN (inactive/dataset_eval.py:5-16)."""
    sd = state_dict
    return {
        "conv0": _conv1d(sd, "net.0"),
        "conv1": _conv1d(sd, "net.2"),
        "head": _linear(sd, "head"),
    }


def import_gru_word_classifier(state_dict, *, num_layers=2, bidirectional=True):
    """Reference GRUWordClassifier (inactive/live_feed.py:29-50): BiGRU +
    mean-pool + LN/MLP head."""
    sd = state_dict
    return {
        "gru": import_gru_stack(sd, "gru", num_layers, bidirectional),
        "head": {
            "ln": _layer_norm(sd, "head.0"),
            "fc1": _linear(sd, "head.1"),
            "fc2": _linear(sd, "head.4"),
        },
    }


def import_unigru_classifier(state_dict):
    """Reference 1130pm GRUClassifier (inactive/train_model_1130pm.py:88-98):
    uni-GRU + dropout + linear head."""
    sd = state_dict
    return {
        "gru": import_gru_stack(sd, "gru", 1, bidirectional=False),
        "head": _linear(sd, "head"),
    }


def import_reduced_bigru(state_dict):
    """Reference train_reduced GRUClassifier (inactive/train_reduced.py:129-145):
    1-layer BiGRU + mean-pool + single linear head (head.0)."""
    sd = state_dict
    return {
        "gru": import_gru_stack(sd, "gru", 1, bidirectional=True),
        "head": _linear(sd, "head.0"),
    }


def import_mlp(state_dict):
    """Reference quick MLP (inactive/train_5_quick.py:36-50): 3 Linears at
    Sequential indices 0/3/6."""
    sd = state_dict
    return {
        "fc0": _linear(sd, "net.0"),
        "fc1": _linear(sd, "net.3"),
        "fc2": _linear(sd, "net.6"),
    }
