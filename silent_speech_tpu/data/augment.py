"""On-device batched augmentation.

The reference augments per item on the host inside Dataset.__getitem__
(train_model_official.py:144-152: gaussian noise p=0.7 sigma=0.01; drop 1-2
interior frames p=0.35 when T>12) and, in the richer variant
(inactive/train_reduced.py:103-123): time-warp 0.8-1.2x, frame drop, noise,
scale jitter, plus optional mixup (:36-53). Here every augmentation is a
batched jax.random transform over the padded (B, T, D) arrays, vmapped with
per-sample keys, so augmentation runs fused into the jitted train step — zero
host work, static shapes throughout.

Frame dropping with static shapes: a keep-mask is compacted with a stable
argsort of the drop flags, which moves kept frames to the front in original
order; lengths shrink by the drop count. (The reference drops frames from X
only, after which ROI is truncated to the new min length — the same effective
semantics implemented here.)
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    noise_prob: float = 0.7
    noise_std: float = 0.01
    drop_prob: float = 0.35
    drop_max: int = 2
    drop_min_t: int = 12
    # official drops interior frames only (np.random.choice(np.arange(1,T-1)),
    # train_model_official.py:146-152); train_reduced samples from ALL
    # positions incl. endpoints (random.sample(range(T), T-k), :112-114)
    drop_interior_only: bool = True
    # extended (train_reduced) set — disabled by default to match official
    time_warp_prob: float = 0.0
    time_warp_lo: float = 0.8
    time_warp_hi: float = 1.2
    scale_jitter_prob: float = 0.0
    scale_jitter_lo: float = 0.95
    scale_jitter_hi: float = 1.05


OFFICIAL_AUGMENT = AugmentConfig()
REDUCED_AUGMENT = AugmentConfig(
    noise_prob=0.5, noise_std=0.015, drop_prob=0.3, drop_max=3, drop_min_t=15,
    drop_interior_only=False, time_warp_prob=0.5, scale_jitter_prob=0.3,
)


def add_noise(key, X, lengths, prob: float, std: float):
    """Per-clip gaussian feature noise, masked to valid frames."""
    B, T, D = X.shape
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, prob, (B, 1, 1))
    noise = jax.random.normal(k2, X.shape, X.dtype) * std
    valid = (jnp.arange(T)[None, :, None] < lengths[:, None, None])
    return jnp.where(apply & valid, X + noise, X)


def drop_frames(key, X, lengths, cfg: AugmentConfig):
    """Drop 1..drop_max interior frames per clip (prob-gated), compacting.

    Returns (X', lengths'). Interior means indices [1, T_i-2], as the
    reference's np.random.choice(np.arange(1, T-1)).
    """
    B, T, _ = X.shape
    k_gate, k_count, k_scores = jax.random.split(key, 3)
    gate = jax.random.bernoulli(k_gate, cfg.drop_prob, (B,)) & (
        lengths > cfg.drop_min_t
    )
    k = jax.random.randint(k_count, (B,), 1, cfg.drop_max + 1)
    k = jnp.where(gate, k, 0)

    # choose k distinct candidate indices per row: rank random scores over
    # the eligible positions, drop the k smallest-ranked
    pos = jnp.arange(T)[None, :]
    if cfg.drop_interior_only:
        eligible = (pos >= 1) & (pos < (lengths - 1)[:, None])
    else:
        eligible = pos < lengths[:, None]
    # clamp: a non-default config (drop_max within ~2 of drop_min_t) can ask
    # for more drops than eligible positions exist — without this, the rank
    # trick would "drop" ineligible/padding frames (scores=inf rank after the
    # eligible ones) and new_len could reach 0 or negative, poisoning the
    # downstream GRU/pool masks. Also always keep >= 1 frame.
    k = jnp.minimum(k, eligible.sum(axis=1))
    k = jnp.maximum(jnp.minimum(k, lengths.astype(k.dtype) - 1), 0)
    scores = jax.random.uniform(k_scores, (B, T))
    scores = jnp.where(eligible, scores, jnp.inf)
    order = jnp.argsort(scores, axis=1)  # eligible positions in random order
    rank = jnp.argsort(order, axis=1)  # rank of each position in that order
    drop = rank < k[:, None]

    # stable argsort of drop flags -> kept indices first in original order
    perm = jnp.argsort(drop.astype(jnp.int32), axis=1, stable=True)
    Xc = jnp.take_along_axis(X, perm[..., None], axis=1)
    new_len = lengths - k.astype(lengths.dtype)
    valid = pos < new_len[:, None]
    Xc = jnp.where(valid[..., None], Xc, 0.0)
    return Xc, new_len


def time_warp(key, X, lengths, cfg: AugmentConfig):
    """Resample each clip to a random speed in [lo, hi]
    (inactive/train_reduced.py:105-109). Keeps static shape (B, T, D);
    warped length is clipped to T."""
    B, T, _ = X.shape
    k_gate, k_scale = jax.random.split(key)
    gate = jax.random.bernoulli(k_gate, cfg.time_warp_prob, (B,)) & (lengths > 10)
    scale = jax.random.uniform(
        k_scale, (B,), minval=cfg.time_warp_lo, maxval=cfg.time_warp_hi
    )
    # the reference resamples to warp_len = int(T_i * scale) samples THEN
    # pad/trims to max_t (train_reduced.py:105-109 + pad_or_trim), so a
    # slow-down past T must keep the stretched mapping and truncate the tail
    # — mapping with the CLIPPED length would degenerate to the identity for
    # full-length clips and silently erase the scale>1 half of the range
    warp_len = jnp.maximum(
        5, (lengths.astype(jnp.float32) * scale).astype(jnp.int32)
    )
    warp_len = jnp.where(gate, warp_len, lengths)
    new_len = jnp.clip(warp_len, 1, T)

    pos = jnp.arange(T)[None, :].astype(jnp.float32)
    denom = jnp.maximum(warp_len - 1, 1).astype(jnp.float32)[:, None]
    src = (pos * (lengths - 1)[:, None].astype(jnp.float32) / denom).astype(jnp.int32)
    src = jnp.clip(src, 0, T - 1)
    Xw = jnp.take_along_axis(X, src[..., None], axis=1)
    valid = jnp.arange(T)[None, :] < new_len[:, None]
    Xw = jnp.where(valid[..., None], Xw, 0.0)
    Xw = jnp.where(gate[:, None, None], Xw, X)
    return Xw, new_len


def scale_jitter(key, X, lengths, cfg: AugmentConfig):
    B, T, _ = X.shape
    k_gate, k_s = jax.random.split(key)
    gate = jax.random.bernoulli(k_gate, cfg.scale_jitter_prob, (B, 1, 1))
    s = jax.random.uniform(
        k_s, (B, 1, 1), minval=cfg.scale_jitter_lo, maxval=cfg.scale_jitter_hi
    )
    valid = (jnp.arange(T)[None, :, None] < lengths[:, None, None])
    return jnp.where(gate & valid, X * s, X)


def mixup(key, X, y_onehot, alpha: float = 0.2):
    """Batch mixup (inactive/train_reduced.py:36-53) on features and soft
    labels. Returns (X_mix, y_mix). alpha <= 0 is the reference's
    no-mix fallback (lam = 1) — beta(0, 0) would be NaN."""
    if alpha <= 0:
        return X, y_onehot
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, X.shape[0])
    X_mix = lam * X + (1.0 - lam) * X[perm]
    y_mix = lam * y_onehot + (1.0 - lam) * y_onehot[perm]
    return X_mix, y_mix


def augment_batch(key, X, lengths, cfg: AugmentConfig):
    """The composed per-batch pipeline. Order follows train_reduced
    (warp -> drop -> noise -> jitter); with the official config only
    noise+drop are active. Returns (X', lengths')."""
    k_w, k_d, k_n, k_s = jax.random.split(key, 4)
    if cfg.time_warp_prob > 0:
        X, lengths = time_warp(k_w, X, lengths, cfg)
    if cfg.drop_prob > 0:
        X, lengths = drop_frames(k_d, X, lengths, cfg)
    if cfg.noise_prob > 0:
        X = add_noise(k_n, X, lengths, cfg.noise_prob, cfg.noise_std)
    if cfg.scale_jitter_prob > 0:
        X = scale_jitter(k_s, X, lengths, cfg)
    return X, lengths
