"""The official model: TinyROICNN + 2-layer BiGRU + AttnPool + MLP head.

Re-implements the architecture of reference train_model_official.py:209-310 as
pure functions over a param pytree, with the reference's *dual forward*
preserved explicitly (SURVEY.md section 2.5 item 1):

- ``forward(..., roi_standardize=True)`` — the training-path forward:
  ROI is /255 then per-frame mean/std standardized
  (train_model_official.py:286-291).
- ``forward(..., roi_standardize=False)`` — the live-inference forward:
  ROI is only /255 (live_infer_official.py:124-128). The same weights produce
  different logits on the two paths; parity targets are defined against the
  live path.

The per-frame ROI std uses Bessel's correction (ddof=1) to match
``torch.Tensor.std``'s default.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..ops import gru as gru_ops
from ..ops import pooling
from ..ops.nn import (
    conv2d_nhwc,
    conv_init,
    dense,
    dropout,
    gru_dir_init,
    layer_norm,
    layer_norm_init,
    linear_init,
    max_pool_2x2,
)


# Per-site matmul-precision spec. Keys name the four matmul families of the
# official model; values are None (backend default), 'high' (bf16_3x on TPU)
# or 'highest' (true f32). Measured on v5e-1 (scripts/precision_bisect.py):
# the on-chip 2.6e-3 logit drift vs torch comes from the bf16-decomposed
# default-precision matmuls; PARITY_PRECISION is the cheapest per-site
# combination that holds corpus-wide logits <= 1e-3 vs the torch live
# forward (live_infer_official.py:338-359) — the named mode
# matmul_precision='parity' on forward()/Predictor.
# Measured on v5e-1 (docs/PRECISION.md, scripts/precision_bisect.py):
# default-precision drift 2.62e-3 vs torch; raising ONLY the head site ->
# 8.75e-4 (under the 1e-3 bar; argmax exact everywhere). The ROI convs —
# the expensive matmuls — stay at default, so the mode costs ~1% throughput
# instead of the 43% a global 'highest' costs (19.2k vs 33.7k clips/s).
#
# The GRU sites stay at default deliberately: a precision override on the
# in-scan recurrent dot makes the TPU compiler blow up at small batches
# (B<=12 never finished compiling in 10 min; B=30 took 262s with both GRU+
# head raised) — and gru_wh's drift share was only 1.3e-4 anyway. Raising
# gru_wh/gru_wi via an explicit dict spec is supported for LARGE-batch
# offline use (B>=256 compiles fine) but is not part of the serving default.
PARITY_PRECISION: dict = {
    "roi": None,        # TinyROICNN convs + fc: no measurable drift share
    "gru_wi": None,     # GRU input projections: no measurable drift share
    "gru_wh": None,     # see compile-pathology note above
    "head": "highest",  # attn-pool score + MLP head: the dominant share
}

PrecisionLike = Union[None, str, dict]


def _prec_scope(p: Optional[str]):
    """Scoped matmul-precision override (no-op when p is falsy)."""
    return jax.default_matmul_precision(p) if p else contextlib.nullcontext()


@dataclasses.dataclass(frozen=True)
class BiGRUConfig:
    """Architecture hyperparameters (reference defaults,
    train_model_official.py:254,402)."""

    x_dim: int = 180
    num_classes: int = 10
    use_roi: bool = True
    roi_emb: int = 32
    hidden: int = 192
    gru_layers: int = 2
    gru_dropout: float = 0.1
    head_dropout: float = 0.2
    head_hidden: int = 128
    roi_h: int = 48
    roi_w: int = 96


# ----------------------------------------------------------------------------
# TinyROICNN (train_model_official.py:209-229)
# ----------------------------------------------------------------------------

def init_roi_cnn(key, out_dim: int = 32, dtype=jnp.float32) -> dict:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    return {
        "conv0": conv_init(k0, 3, 3, 1, 8, dtype),
        "conv1": conv_init(k1, 3, 3, 8, 16, dtype),
        "conv2": conv_init(k2, 3, 3, 16, 24, dtype),
        "fc": linear_init(k3, 24, out_dim, dtype),
    }


def roi_cnn_forward(params: dict, roi: jnp.ndarray) -> jnp.ndarray:
    """roi: (B, T, H, W) float (already normalized) -> (B, T, out_dim).

    The frames fold into the batch axis so the convs see one large NHWC batch
    (B*T, H, W, 1) — MXU-friendly. AdaptiveAvgPool2d((1,1)) over the 12x24
    post-pool map is a plain global mean (SURVEY.md section 2.5 item 4).
    """
    B, T, H, W = roi.shape
    x = roi.reshape(B * T, H, W, 1)
    x = jax.nn.relu(conv2d_nhwc(x, params["conv0"]))
    x = max_pool_2x2(x)
    x = jax.nn.relu(conv2d_nhwc(x, params["conv1"]))
    x = max_pool_2x2(x)
    x = jax.nn.relu(conv2d_nhwc(x, params["conv2"]))
    x = jnp.mean(x, axis=(1, 2))  # (B*T, 24)
    x = dense(x, params["fc"])
    return x.reshape(B, T, -1)


# ----------------------------------------------------------------------------
# BiGRUClassifier
# ----------------------------------------------------------------------------

def init_params(key, cfg: BiGRUConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4 + 2 * cfg.gru_layers)
    in_dim = cfg.x_dim + (cfg.roi_emb if cfg.use_roi else 0)
    layers = []
    d = in_dim
    for li in range(cfg.gru_layers):
        layers.append(
            {
                "fwd": gru_dir_init(keys[4 + 2 * li], d, cfg.hidden, dtype),
                "bwd": gru_dir_init(keys[5 + 2 * li], d, cfg.hidden, dtype),
            }
        )
        d = 2 * cfg.hidden
    params = {
        "gru": layers,
        "pool": {"score": linear_init(keys[1], 2 * cfg.hidden, 1, dtype)},
        "head": {
            "ln": layer_norm_init(2 * cfg.hidden, dtype),
            "fc1": linear_init(keys[2], 2 * cfg.hidden, cfg.head_hidden, dtype),
            "fc2": linear_init(keys[3], cfg.head_hidden, cfg.num_classes, dtype),
        },
    }
    if cfg.use_roi:
        params["roi_cnn"] = init_roi_cnn(keys[0], cfg.roi_emb, dtype)
    return params


def standardize_frames(r: jnp.ndarray) -> jnp.ndarray:
    """Per-frame mean/std standardization over the trailing (H, W) axes
    (train_model_official.py:286-291; torch-std ddof=1)."""
    n = r.shape[-1] * r.shape[-2]
    mu = jnp.mean(r, axis=(-1, -2), keepdims=True)
    var = jnp.sum(jnp.square(r - mu), axis=(-1, -2), keepdims=True) / (n - 1)
    std = jnp.maximum(jnp.sqrt(var), 1e-6)
    return (r - mu) / std


def preprocess_roi(roi_u8: jnp.ndarray, standardize: bool) -> jnp.ndarray:
    """uint8 (B, T, H, W) -> float, /255 and optionally per-frame standardized.

    ``standardize=True`` is the training-path normalization
    (train_model_official.py:286-291, torch-std ddof=1);
    ``standardize=False`` is the live path (live_infer_official.py:126).
    """
    r = roi_u8.astype(jnp.float32) / 255.0
    return standardize_frames(r) if standardize else r


def roi_embedding(
    p_roi: dict,
    roi: jnp.ndarray,
    *,
    standardize: bool,
    train: bool = False,
    roi_impl: str = "xla",
    roi_packed: Optional[dict] = None,
    roi_variant: str = "tiled3",
    roi_f_tile: Optional[int] = None,
    compute_dtype=jnp.float32,
    roi_remat: bool = False,
) -> jnp.ndarray:
    """TinyROICNN embedding with the full impl-dispatch surface.

    The single routing point shared by the official forward and the CTC
    model (inactive/train_model.py:141-150 embeds its ROI with the same
    TinyROICNN): ``roi_impl`` selects 'xla' (plain convs), 'grouped'
    (frames packed into conv channel groups), 'pallas' (conv1+pool1 kernel,
    inference-only) or 'fused' (the parity-packed single-program kernel,
    ops/pallas_cnn2.py; with ``train=True`` the custom-VJP pair,
    ops/pallas_cnn2_grad.py).

    ``roi``: (B, T, H, W) **uint8** frames (preferred — the Pallas impls
    normalize in-kernel and their HBM win is exactly shipping u8), or float
    frames already /255 (the CTC collate contract,
    inactive/train_model.py:109) — float input is xla/grouped-only.
    Returns (B, T, emb) in ``compute_dtype``.
    """
    if roi_impl not in ("xla", "grouped", "pallas", "fused"):
        raise ValueError(f"unknown roi_impl {roi_impl!r} "
                         "(expected 'xla', 'grouped', 'pallas', or 'fused')")
    is_u8 = roi.dtype == jnp.uint8
    if not is_u8 and roi_impl in ("pallas", "fused"):
        raise ValueError(
            f"roi_impl={roi_impl!r} needs raw uint8 frames (it normalizes "
            "in-kernel); got float input — pass the u8 ROI or use "
            "'xla'/'grouped'")
    B, T = roi.shape[:2]
    if roi_impl == "fused" and train:
        if roi_variant == "tiled3_q8":
            raise ValueError(
                "roi_variant='tiled3_q8' is a serving-only quantized mode "
                "(no int8 training contract); use the default variant for "
                "train=True")
        # differentiable fused CNN: recompute-in-VMEM backward emitting
        # weight grads only — bypasses the activation-HBM roofline that
        # binds the XLA train step (docs/TRAIN_PERF.md)
        from ..ops.pallas_cnn2_grad import roi_cnn_fused_train

        fused_kw = {} if roi_f_tile is None else {"f_tile": roi_f_tile}
        return roi_cnn_fused_train(
            roi.reshape(B * T, *roi.shape[2:]), p_roi,
            standardize=standardize, **fused_kw,
        ).reshape(B, T, -1).astype(compute_dtype)
    if roi_impl == "fused":
        from ..ops.pallas_cnn2 import (
            pack_roi_cnn_fused_traceable, roi_cnn_fused)

        if roi_packed is None:
            roi_packed = pack_roi_cnn_fused_traceable(p_roi,
                                                      variant=roi_variant)
        fused_kw = {} if roi_f_tile is None else {"f_tile": roi_f_tile}
        return roi_cnn_fused(
            roi.reshape(B * T, *roi.shape[2:]), roi_packed,
            standardize=standardize,
            compute_dtype=jnp.dtype(compute_dtype),
            variant=roi_variant, **fused_kw,
        ).reshape(B, T, -1).astype(compute_dtype)
    if roi_impl == "pallas" and not train:
        from ..ops.pallas_cnn import pack_roi_cnn_params, roi_cnn_pallas

        if roi_packed is None:
            roi_packed = pack_roi_cnn_params(p_roi)
        return roi_cnn_pallas(
            roi.reshape(B * T, *roi.shape[2:]), roi_packed,
            standardize=standardize,
        ).reshape(B, T, -1).astype(compute_dtype)

    def _embed(p_roi, roi_in):
        if roi_in.dtype == jnp.uint8:
            r = preprocess_roi(roi_in, standardize)
        else:
            r = roi_in.astype(jnp.float32)
            if standardize:
                r = standardize_frames(r)
        r = r.astype(compute_dtype)
        if roi_impl == "grouped":
            from ..ops.grouped_cnn import roi_cnn_grouped

            return roi_cnn_grouped(
                p_roi, r.reshape(B * T, *r.shape[2:])
            ).reshape(B, T, -1).astype(compute_dtype)
        return roi_cnn_forward(p_roi, r)

    if roi_remat and train:
        # recompute the ROI-CNN activations in the backward instead of
        # storing them: the train step is bound by activation HBM traffic,
        # not MXU time (docs/TRAIN_PERF.md) — only the input is saved
        _embed = jax.checkpoint(_embed)
    return _embed(p_roi, roi)


def forward(
    params: dict,
    cfg: BiGRUConfig,
    X: jnp.ndarray,
    lengths: jnp.ndarray,
    roi: Optional[jnp.ndarray] = None,
    *,
    roi_standardize: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    gru_impl: str = "scan",
    roi_impl: str = "xla",
    roi_packed: Optional[dict] = None,
    roi_variant: str = "tiled3",
    roi_f_tile: Optional[int] = None,
    matmul_precision: PrecisionLike = None,
    roi_remat: bool = False,
) -> jnp.ndarray:
    """X: (B, T, D) f32; lengths: (B,) i32; roi: (B, T, H, W) uint8 or None.

    ``roi_remat`` (training only): jax.checkpoint the ROI embedding so the
    conv activations are recomputed in the backward instead of stored —
    bitwise-identical gradients, less activation HBM traffic.

    ``gru_impl``: 'scan' (differentiable, default) or 'pallas' (fused
    sequence kernel, inference-only). ``roi_impl``: 'xla', 'grouped',
    'pallas' (inference-only), or 'fused' (the parity-packed
    single-program TinyROICNN kernel, ops/pallas_cnn2.py; pass
    ``roi_packed`` from the matching pack function to reuse packed weights
    across inference calls). With ``train=True``, 'fused' routes to the
    custom-VJP kernel pair (ops/pallas_cnn2_grad.py) whose backward
    recomputes activations in VMEM instead of storing them in HBM.

    ``matmul_precision``: None = backend default; a string ('high',
    'highest', ...) applies globally to this forward; ``'parity'`` is the
    named per-site mode (PARITY_PRECISION) — the cheapest combination that
    holds on-chip logits <= 1e-3 vs torch (on TPU the default f32 matmul is
    a bf16 decomposition that drifts logits ~2.6e-3; see
    scripts/precision_bisect.py + docs/PRECISION.md); a dict selects
    per-site precisions explicitly (keys 'roi', 'gru_wi', 'gru_wh', 'head').
    Per-site GRU precisions apply to the scan impl (gru_impl='pallas' does
    its own in-kernel f32 math). Returns logits (B, num_classes) f32.
    """
    if roi_impl not in ("xla", "grouped", "pallas", "fused"):
        raise ValueError(f"unknown roi_impl {roi_impl!r} "
                         "(expected 'xla', 'grouped', 'pallas', or 'fused')")
    if gru_impl not in ("scan", "pallas"):
        raise ValueError(f"unknown gru_impl {gru_impl!r} "
                         "(expected 'scan' or 'pallas')")
    if matmul_precision == "parity":
        matmul_precision = PARITY_PRECISION
    if isinstance(matmul_precision, str):
        with jax.default_matmul_precision(matmul_precision):
            return forward(
                params, cfg, X, lengths, roi,
                roi_standardize=roi_standardize, train=train, rng=rng,
                compute_dtype=compute_dtype, gru_impl=gru_impl,
                roi_impl=roi_impl, roi_packed=roi_packed,
                roi_variant=roi_variant, roi_f_tile=roi_f_tile,
                matmul_precision=None, roi_remat=roi_remat,
            )
    site_prec: dict = dict(matmul_precision or {})
    unknown = set(site_prec) - {"roi", "gru_wi", "gru_wh", "head"}
    if unknown:
        raise ValueError(f"unknown matmul_precision sites {sorted(unknown)} "
                         "(expected 'roi', 'gru_wi', 'gru_wh', 'head')")
    X = X.astype(compute_dtype)
    if cfg.use_roi:
        if roi is None:
            raise ValueError("model was built with use_roi=True but got roi=None")
        with _prec_scope(site_prec.get("roi")):
            roi_e = roi_embedding(
                params["roi_cnn"], roi, standardize=roi_standardize,
                train=train, roi_impl=roi_impl, roi_packed=roi_packed,
                roi_variant=roi_variant, roi_f_tile=roi_f_tile,
                compute_dtype=compute_dtype, roi_remat=roi_remat,
            )
        Z = jnp.concatenate([X, roi_e], axis=-1)
    else:
        Z = X

    if train:
        if rng is None:
            raise ValueError("rng is required for the training forward "
                             "(GRU/head dropout)")
        rng, gru_rng, head_rng = jax.random.split(rng, 3)
    else:
        gru_rng = head_rng = None

    if gru_impl == "pallas" and not train:
        from ..ops.pallas_gru import bigru_pallas

        out = bigru_pallas(Z, lengths, params["gru"], bidirectional=True)
    else:
        out, _ = gru_ops.bigru(
            Z,
            lengths,
            params["gru"],
            bidirectional=True,
            dropout_rate=cfg.gru_dropout if cfg.gru_layers > 1 else 0.0,
            train=train,
            rng=gru_rng,
            wi_precision=site_prec.get("gru_wi"),
            wh_precision=site_prec.get("gru_wh"),
        )
    with _prec_scope(site_prec.get("head")):
        pooled = pooling.attn_pool(out, lengths, params["pool"])  # (B, 2H)

        h = layer_norm(pooled, params["head"]["ln"])
        h = jax.nn.relu(dense(h, params["head"]["fc1"]))
        if train:
            h = dropout(h, cfg.head_dropout, head_rng, train)
        logits = dense(h, params["head"]["fc2"])
    return logits.astype(jnp.float32)


def live_forward(params, cfg, X, lengths, roi=None, compute_dtype=jnp.float32,
                 gru_impl: str = "scan", roi_impl: str = "xla",
                 roi_packed: Optional[dict] = None,
                 roi_variant: str = "tiled3",
                 roi_f_tile: Optional[int] = None,
                 matmul_precision: PrecisionLike = None):
    """The live-inference forward (no ROI standardization, no dropout) —
    the parity target against live_infer_official.py:124-138."""
    return forward(
        params,
        cfg,
        X,
        lengths,
        roi,
        roi_standardize=False,
        train=False,
        compute_dtype=compute_dtype,
        gru_impl=gru_impl,
        roi_impl=roi_impl,
        roi_packed=roi_packed,
        roi_variant=roi_variant,
        roi_f_tile=roi_f_tile,
        matmul_precision=matmul_precision,
    )


def train_forward(params, cfg, X, lengths, roi=None, *, train=True, rng=None,
                  compute_dtype=jnp.float32, roi_impl: str = "xla",
                  roi_remat: bool = False,
                  roi_f_tile: Optional[int] = None):
    """The training-path forward (per-frame ROI standardization,
    train_model_official.py:279-310).

    ``roi_impl='grouped'`` is valid here too: the grouped conv is bitwise
    identical to the per-frame path (tests/test_grouped_cnn.py) and
    differentiable (plain XLA grouped convolutions); ``roi_impl='fused'``
    with ``train=True`` uses the custom-VJP kernel pair
    (ops/pallas_cnn2_grad.py). ``roi_remat`` recomputes the ROI-CNN
    activations in the backward (identical grads, less HBM traffic —
    measured in docs/TRAIN_PERF.md; a no-op for 'fused', which never
    stores them).
    """
    return forward(
        params,
        cfg,
        X,
        lengths,
        roi,
        roi_standardize=True,
        train=train,
        rng=rng,
        compute_dtype=compute_dtype,
        roi_impl=roi_impl,
        roi_remat=roi_remat,
        roi_f_tile=roi_f_tile,
    )
