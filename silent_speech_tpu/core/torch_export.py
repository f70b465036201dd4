"""One-way JAX -> PyTorch weight conversion (the inverse of torch_import).

Lets models trained with this framework be consumed by the reference
ecosystem: ``export_bigru_classifier`` produces the exact ``state_dict``
layout `live_infer_official.py:198-221` loads, and
``export_reference_checkpoint`` writes a complete ``word_model_points_roi.pt``
style file (train_model_official.py:489-500 schema).
"""

from __future__ import annotations

import numpy as np


def _t(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32).T)


def _conv2d_out(p: dict) -> tuple[np.ndarray, np.ndarray]:
    # ours HWIO -> torch OIHW
    w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)
    return np.ascontiguousarray(w), np.asarray(p["b"], np.float32)


def _gru_dir_out(sd: dict, prefix: str, layer: int, reverse: bool, p: dict):
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    sd[f"{prefix}.weight_ih_{sfx}"] = _t(p["wi"])
    sd[f"{prefix}.weight_hh_{sfx}"] = _t(p["wh"])
    sd[f"{prefix}.bias_ih_{sfx}"] = np.asarray(p["bi"], np.float32)
    sd[f"{prefix}.bias_hh_{sfx}"] = np.asarray(p["bh"], np.float32)


def export_bigru_classifier(params: dict) -> dict[str, np.ndarray]:
    """models/bigru.py param pytree -> reference BiGRUClassifier state_dict
    (numpy values; wrap with torch.as_tensor for torch.save)."""
    sd: dict[str, np.ndarray] = {}
    if "roi_cnn" in params:
        rc = params["roi_cnn"]
        for name, key in (("net.0", "conv0"), ("net.3", "conv1"),
                          ("net.6", "conv2")):
            w, b = _conv2d_out(rc[key])
            sd[f"roi_cnn.{name}.weight"] = w
            sd[f"roi_cnn.{name}.bias"] = b
        sd["roi_cnn.fc.weight"] = _t(rc["fc"]["w"])
        sd["roi_cnn.fc.bias"] = np.asarray(rc["fc"]["b"], np.float32)
    for li, layer in enumerate(params["gru"]):
        _gru_dir_out(sd, "gru", li, False, layer["fwd"])
        if "bwd" in layer:
            _gru_dir_out(sd, "gru", li, True, layer["bwd"])
    sd["pool.score.weight"] = _t(params["pool"]["score"]["w"])
    sd["pool.score.bias"] = np.asarray(params["pool"]["score"]["b"], np.float32)
    head = params["head"]
    sd["head.0.weight"] = np.asarray(head["ln"]["scale"], np.float32)
    sd["head.0.bias"] = np.asarray(head["ln"]["bias"], np.float32)
    sd["head.1.weight"] = _t(head["fc1"]["w"])
    sd["head.1.bias"] = np.asarray(head["fc1"]["b"], np.float32)
    sd["head.4.weight"] = _t(head["fc2"]["w"])
    sd["head.4.bias"] = np.asarray(head["fc2"]["b"], np.float32)
    return sd


def export_reference_checkpoint(params: dict, meta: dict, path: str) -> str:
    """Write a reference-consumable .pt checkpoint from our params + meta
    (the metadata keys already follow the reference schema,
    train/checkpoint.reference_meta)."""
    import torch

    sd = {k: torch.as_tensor(v) for k, v in export_bigru_classifier(params).items()}
    ckpt = {
        "model": sd,
        "x_dim": int(meta["x_dim"]),
        "max_t": int(meta["max_t"]),
        "use_roi": bool(meta["use_roi"]),
        "roi_w": int(meta["roi_w"]),
        "roi_h": int(meta["roi_h"]),
        "labels": list(meta["labels"]),
        "label_to_id": {str(k): int(v) for k, v in meta["label_to_id"].items()},
        "id_to_label": {int(k): str(v) for k, v in meta["id_to_label"].items()},
        "seed": int(meta.get("seed", 42)),
        "gru_layers": int(meta.get("gru_layers", 2)),
    }
    torch.save(ckpt, path)
    return path
