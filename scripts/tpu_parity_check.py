"""On-TPU fidelity audit: logits vs the PyTorch reference ON THE REAL CHIP.

The parity tests (tests/test_model_parity.py, test_golden_parity.py) pin
logits <= 1e-3 vs torch on the CPU backend at fp32. The BASELINE bar,
however, is stated for TPU v5e-1 — where f32 matmuls at default precision
run as bf16x3 decompositions — so this script re-checks the bar where it
matters: trains the torch golden (reference protocol), imports the weights,
and compares live-forward logits computed on the TPU against torch CPU for
every impl combination.

Usage: python scripts/tpu_parity_check.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import glob
import json
import tempfile

import numpy as np
import torch

import jax
import jax.numpy as jnp

from silent_speech_tpu.core.torch_import import import_bigru_classifier
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.models import bigru as model


def main():
    assert jax.default_backend() == "tpu", "run on the TPU backend"
    import sys

    sys.path.insert(0, ".")
    from tests.test_golden_parity import WORDS5, _train_torch_golden
    from tests.test_model_parity import _TorchBiGRUClassifier

    with tempfile.TemporaryDirectory() as td:
        corpus = f"{td}/clips"
        generate_corpus(corpus, clips_per_word=6, words=WORDS5, seed=7)
        files = sorted(glob.glob(f"{corpus}/*.npz"))
        labels = sorted(WORDS5)
        label_to_id = {w: i for i, w in enumerate(labels)}
        tm, (X, R, L, _y) = _train_torch_golden(files, label_to_id)

        # the torch LIVE forward (no ROI standardization) is the parity target
        live = _TorchBiGRUClassifier(180, len(labels), use_roi=True,
                                     standardize_roi=False)
        live.load_state_dict(tm.state_dict())
        live.eval()
        with torch.no_grad():
            ref = live(torch.from_numpy(X), torch.from_numpy(L),
                       torch.from_numpy(R)).numpy()

        params = import_bigru_classifier(tm.state_dict(), gru_layers=2,
                                         use_roi=True)
        params = jax.tree.map(jnp.asarray, params)
        mcfg = model.BiGRUConfig(x_dim=180, num_classes=5, use_roi=True)

        out = {}
        for roi_impl, gru_impl, dtype, prec, tag in (
            ("xla", "scan", jnp.float32, None, "xla/scan/f32"),
            ("grouped", "scan", jnp.float32, None, "grouped/scan/f32"),
            ("grouped", "pallas", jnp.float32, None, "grouped/pallas/f32"),
            ("grouped", "pallas", jnp.bfloat16, None, "grouped/pallas/bf16"),
            ("xla", "scan", jnp.float32, "highest", "xla/scan/f32/highest"),
            ("grouped", "scan", jnp.float32, "highest",
             "grouped/scan/f32/highest"),
            # the serving default (per-site raise, docs/PRECISION.md):
            # must stay <= 1e-3
            ("xla", "scan", jnp.float32, "parity", "xla/scan/f32/parity"),
            ("grouped", "scan", jnp.float32, "parity",
             "grouped/scan/f32/parity"),
            # round-4 parity-packed fused CNN (ops/pallas_cnn2.py): in-kernel
            # f32 matmul accumulation, so no precision raise applies inside
            # the CNN; the head raise still comes from 'parity'
            ("fused", "scan", jnp.float32, "parity",
             "fused/scan/f32/parity"),
            ("fused", "pallas", jnp.float32, None, "fused/pallas/f32"),
            ("fused", "pallas", jnp.bfloat16, None, "fused/pallas/bf16"),
            # THE serving default (Predictor 'auto' on TPU f32 since
            # 2026-08-18): fused CNN + pallas GRU + parity head raise —
            # the audited mode must be the shipped mode
            ("fused", "pallas", jnp.float32, "parity",
             "fused/pallas/f32/parity"),
            # int8 fused CNN (variant='tiled3_q8'): opt-in fast serving
            # mode; its bar is the bf16-style guardrail (argmax 1.000 +
            # bounded drift), not 1e-3 — quantization noise is ~1e-2 class
            ("fused-q8", "pallas", jnp.float32, "parity",
             "fused-q8/pallas/f32/parity"),
        ):
            roi_variant = "tiled3_q8" if roi_impl == "fused-q8" else "tiled3"
            logits = np.asarray(model.live_forward(
                params, mcfg, jnp.asarray(X), jnp.asarray(L.astype(np.int32)),
                jnp.asarray(R), compute_dtype=dtype,
                roi_impl="fused" if roi_impl == "fused-q8" else roi_impl,
                gru_impl=gru_impl, roi_variant=roi_variant,
                matmul_precision=prec))
            err = float(np.max(np.abs(logits - ref)))
            agree = float(np.mean(logits.argmax(-1) == ref.argmax(-1)))
            out[tag] = {"max_logit_err": round(err, 6),
                        "argmax_agreement": agree}
            print(f"{tag:>22s}: max|dlogits|={err:.2e} argmax={agree:.3f}",
                  flush=True)

        # --- CTC family (round-5 flagship treatment): per-frame log-probs
        # vs the torch BiGRUCTCWithROI (inactive/train_model.py:141-164) on
        # valid frames; the serving default row is fused/pallas/f32/parity
        from silent_speech_tpu.core.torch_import import import_bigru_ctc
        from silent_speech_tpu.models import ctc_model
        from tests.test_variants import _TorchCTC

        torch.manual_seed(5)
        tctc = _TorchCTC(180).eval()
        Bc, Tc = 8, 40
        rngc = np.random.default_rng(11)
        Xc = rngc.standard_normal((Bc, Tc, 180)).astype(np.float32)
        Rc = rngc.integers(0, 256, (Bc, Tc, 48, 96), dtype=np.uint8)
        Lc = np.linspace(6, Tc, Bc).astype(np.int64)
        with torch.no_grad():
            ctc_ref = tctc(
                torch.from_numpy(Xc),
                (torch.from_numpy(Rc).float() / 255.0).unsqueeze(2),
                torch.from_numpy(Lc)).numpy()
        cparams = jax.tree.map(jnp.asarray, import_bigru_ctc(tctc.state_dict()))
        valid = np.arange(Tc)[None, :] < Lc[:, None]
        for roi_impl, gru_impl, dtype, prec, tag in (
            ("xla", "scan", jnp.float32, None, "ctc:xla/scan/f32"),
            ("xla", "scan", jnp.float32, "parity", "ctc:xla/scan/f32/parity"),
            ("fused", "scan", jnp.float32, "parity",
             "ctc:fused/scan/f32/parity"),
            # THE CTC serving default (CTCDecoder 'auto' on TPU)
            ("fused", "pallas", jnp.float32, "parity",
             "ctc:fused/pallas/f32/parity"),
            ("fused", "pallas", jnp.bfloat16, None, "ctc:fused/pallas/bf16"),
        ):
            lp = np.asarray(ctc_model.forward(
                cparams, jnp.asarray(Xc), jnp.asarray(Rc),
                jnp.asarray(Lc.astype(np.int32)), compute_dtype=dtype,
                roi_impl=roi_impl, gru_impl=gru_impl, matmul_precision=prec))
            err = float(np.max(np.abs(lp - ctc_ref)[valid]))
            agree = float(np.mean(
                (lp.argmax(-1) == ctc_ref.argmax(-1))[valid]))
            out[tag] = {"max_logit_err": round(err, 6),
                        "argmax_agreement": agree}
            print(f"{tag:>28s}: max|dlp|={err:.2e} argmax={agree:.3f}",
                  flush=True)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
