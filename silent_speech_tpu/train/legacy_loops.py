"""Legacy training pipelines — the reference's historical model generations.

Each keeps its source pipeline's preprocessing and optimization protocol:

- ``train_reduced``: 5 distinct words, 1-layer BiGRU(h=64) mean-pool, the
  rich augmentation set (time-warp/drop/noise/jitter [+ optional mixup]),
  Adam 1e-3 with ReduceLROnPlateau(factor .5, patience 10)
  (inactive/train_reduced.py).
- ``train_unigru``: activity-quantile silence trimming, fix_dim to the max
  corpus dim, per-clip z-score, optional delta features, T_TARGET=32 windows,
  uni-GRU(h=128) on the final hidden state, AdamW 3e-4 wd 1e-3
  (inactive/train_model_1130pm.py).
- ``train_mlp_quick``: clip -> [mean, std] summary, 3-layer MLP, 70/15/15
  stratified split with a held-out TEST evaluation of the best checkpoint —
  the only reference pipeline with a true test split
  (inactive/train_5_quick.py).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.schema import fix_dim, load_clip, pad_trim_time
from ..data.augment import REDUCED_AUGMENT, augment_batch, mixup
from ..data.corpus import (
    build_label_maps,
    scan_corpus,
    split_by_label,
    stratified_split_3way,
)
from ..models import variants as V
from .checkpoint import save_checkpoint
from .step import make_optimizer

SELECTED_WORDS_5 = ["hello", "water", "thanks", "please", "apple"]


# ----------------------------------------------------------------------------
# shared plumbing
# ----------------------------------------------------------------------------

def _load_padded(files, label_to_id, max_t, x_dim=None):
    Xs, Ls, ys = [], [], []
    for f in files:
        c = load_clip(f)
        X = c.X if x_dim is None else fix_dim(c.X, x_dim)
        Xp, T = pad_trim_time(X, max_t)
        Xs.append(Xp)
        Ls.append(T)
        ys.append(label_to_id[c.label])
    return (np.stack(Xs).astype(np.float32), np.asarray(Ls, np.int32),
            np.asarray(ys, np.int32))


def _epoch_eval(fwd, params, X, y, batch=64):
    ok = 0
    for s in range(0, len(X), batch):
        logits = np.asarray(fwd(params, jnp.asarray(X[s:s + batch])))
        ok += int((logits.argmax(-1) == y[s:s + batch]).sum())
    return ok / max(1, len(X))


# ----------------------------------------------------------------------------
# train_reduced (inactive/train_reduced.py)
# ----------------------------------------------------------------------------

@dataclasses.dataclass
class ReducedConfig:
    clip_dir: str = "clips_npz"
    out_path: str = "word_model_5.ckpt"
    words: tuple = tuple(SELECTED_WORDS_5)
    seed: int = 42
    batch_size: int = 16
    epochs: int = 200
    lr: float = 1e-3
    max_t: int = 60
    hidden: int = 64
    use_mixup: bool = False
    mixup_alpha: float = 0.2
    val_frac: float = 0.15
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    early_stop_patience: int = 40  # inactive/train_reduced.py:260-262
    grad_clip_norm: float = 1.0  # nn.utils.clip_grad_norm_ (:223)


def train_reduced(cfg: ReducedConfig = ReducedConfig(), verbose=True) -> dict:
    from collections import Counter

    index = scan_corpus(cfg.clip_dir, verbose=False)
    keep = [i for i, l in enumerate(index.labels) if l in cfg.words]
    files = [index.files[i] for i in keep]
    labels = [index.labels[i] for i in keep]
    # console contract: inactive/train_reduced.py:158-189
    if verbose:
        print(f"Using {len(files)} clips from {len(set(labels))} words")
        print("Distribution:", dict(Counter(labels)))
    label_to_id, id_to_label = build_label_maps(labels)
    tr_files, va_files = split_by_label(files, labels, cfg.val_frac,
                                        seed=cfg.seed, verbose=False)
    if verbose:
        print(f"Train: {len(tr_files)}, Val: {len(va_files)}")
    Xtr, Ltr, ytr = _load_padded(tr_files, label_to_id, cfg.max_t)
    Xva, _, yva = _load_padded(va_files, label_to_id, cfg.max_t)
    d_in = Xtr.shape[-1]
    num_classes = len(label_to_id)
    if verbose:
        print(f"Input dim: {d_in}")

    key = jax.random.PRNGKey(cfg.seed)
    key, k0 = jax.random.split(key)
    params = V.init_reduced_bigru(k0, d_in, num_classes, hidden=cfg.hidden)

    # Adam + global-norm clip 1.0 (inactive/train_reduced.py:223) with a
    # host-controlled LR scale (ReduceLROnPlateau equivalent)
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adam(learning_rate))
    )(learning_rate=cfg.lr)
    opt_state = opt.init(params)

    def loss_fn(params, X, lengths, y_soft, rng):
        # lengths/rng unused ON PURPOSE: the reference mean-pools over padding
        # too (GRUClassifier.forward, train_reduced.py:141-145) — do not
        # 'fix' this to a masked pool, it would break checkpoint parity
        del lengths, rng
        logits = V.reduced_bigru_forward(params, X)
        loss = jnp.mean(optax.softmax_cross_entropy(logits, y_soft))
        # batch train accuracy vs the (mixup-dominant) labels — feeds the
        # reference's per-epoch 'train' column (train_reduced.py:245)
        acc = jnp.mean((jnp.argmax(logits, -1)
                        == jnp.argmax(y_soft, -1)).astype(jnp.float32))
        return loss, acc

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, X, lengths, y):
        rng, aug_rng, mix_rng = jax.random.split(rng, 3)
        X, lengths = augment_batch(aug_rng, X, lengths, REDUCED_AUGMENT)
        y_soft = jax.nn.one_hot(y, num_classes)
        if cfg.use_mixup:
            X, y_soft = mixup(mix_rng, X, y_soft, cfg.mixup_alpha)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, X, lengths, y_soft, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss, acc

    fwd = jax.jit(V.reduced_bigru_forward)
    sampler = np.random.default_rng(cfg.seed)
    best, best_params = 0.0, jax.tree.map(np.asarray, params)
    # two counters, as in the reference: the save/early-stop patience
    # (train_reduced.py:249,260-262) and ReduceLROnPlateau's internal one
    # (torch semantics: rel threshold 1e-4, reduce when bad > patience)
    # best_sched starts at -inf (torch mode_worse for mode='max'): epoch 1
    # is ALWAYS an improvement, even at 0.0 acc — a 0.0 init would count it
    # bad and reduce the LR one epoch early on degenerate starts
    lr_now, bad_plateau, bad_stop = cfg.lr, 0, 0
    best_sched = float("-inf")
    meta = dict(x_dim=d_in, max_t=cfg.max_t, labels=sorted(label_to_id),
                label_to_id=label_to_id,
                id_to_label={str(k): v for k, v in id_to_label.items()},
                seed=cfg.seed, model="reduced_bigru", hidden=cfg.hidden)
    history = []
    import os as _os

    out_name = _os.path.basename(cfg.out_path)
    for ep in range(1, cfg.epochs + 1):
        order = sampler.permutation(len(Xtr))
        ep_loss, ep_acc, nb = 0.0, 0.0, 0
        for s in range(0, len(Xtr), cfg.batch_size):
            idx = order[s:s + cfg.batch_size]
            params, opt_state, key, loss, tr_acc = step(
                params, opt_state, key, jnp.asarray(Xtr[idx]),
                jnp.asarray(Ltr[idx]), jnp.asarray(ytr[idx]))
            ep_loss += float(loss)
            ep_acc += float(tr_acc)
            nb += 1
        acc = _epoch_eval(fwd, params, Xva, yva)
        history.append(dict(epoch=ep, loss=ep_loss / max(1, nb), val_acc=acc))
        if verbose:
            # per-epoch console contract (train_reduced.py:245)
            print(f"ep {ep:02d} | loss {ep_loss / max(1, nb):.4f} | "
                  f"train {ep_acc / max(1, nb):.3f} | val {acc:.3f} | "
                  f"lr {lr_now:.5f}")
        if acc > best:
            best, bad_stop = acc, 0
            best_params = jax.tree.map(np.asarray, params)
            save_checkpoint(cfg.out_path, best_params, meta)
            if verbose:
                print(f"  saved {out_name} (best)")
        else:
            bad_stop += 1
            if bad_stop >= cfg.early_stop_patience:
                if verbose:
                    print("Early stopping")
                break
        # ReduceLROnPlateau(mode='max'): improvement = acc > best*(1+1e-4);
        # reduce on the (patience+1)-th consecutive bad epoch
        if acc > best_sched * (1.0 + 1e-4):
            best_sched, bad_plateau = acc, 0
        else:
            bad_plateau += 1
            if bad_plateau > cfg.plateau_patience:
                lr_now *= cfg.plateau_factor
                opt_state.hyperparams["learning_rate"] = jnp.asarray(lr_now)
                bad_plateau = 0
    if verbose:
        # final console contract (train_reduced.py:265-266)
        print(f"\nBest validation accuracy: {best:.3f}")
        print(f"Random baseline: {1 / num_classes:.3f}")
    return dict(best_acc=best, params=best_params, meta=meta, history=history)


# ----------------------------------------------------------------------------
# train_unigru (inactive/train_model_1130pm.py)
# ----------------------------------------------------------------------------

@dataclasses.dataclass
class UniGRUConfig:
    clip_dir: str = "clips_npz"
    out_path: str = "word_model.ckpt"
    seed: int = 42
    batch_size: int = 64
    epochs: int = 60
    lr: float = 3e-4
    weight_decay: float = 1e-3
    t_target: int = 32
    margin: int = 2
    quantile: float = 0.60
    min_keep: int = 6
    use_deltas: bool = True
    hidden: int = 128
    train_frac: float = 0.8


def activity_from_X(X: np.ndarray) -> np.ndarray:
    """Openness channel when D is odd, else y-spread
    (inactive/train_model_1130pm.py:57-65)."""
    if X.shape[1] % 2 == 1:
        return X[:, -1].astype(np.float32)
    y = X[:, 1::2]
    return (y.max(axis=1) - y.min(axis=1)).astype(np.float32)


def trim_by_activity(X, t_target, margin=2, q=0.60, min_keep=6):
    a = activity_from_X(X)
    thr = float(np.quantile(a, q))
    active = np.where(a > thr)[0]
    if len(active) < min_keep:
        return pad_trim_time(X, t_target)[0]
    lo = max(int(active[0]) - margin, 0)
    hi = min(int(active[-1]) + margin + 1, X.shape[0])
    return pad_trim_time(X[lo:hi], t_target)[0]


def add_deltas(X: np.ndarray) -> np.ndarray:
    dX = np.zeros_like(X)
    dX[1:] = X[1:] - X[:-1]
    return np.concatenate([X, dX], axis=1)


def zscore_per_clip(X: np.ndarray) -> np.ndarray:
    # single normalization contract shared with the legacy eval pipelines
    from ..infer.evaluator import zscore

    return zscore(X)


def _unigru_preprocess(files, cfg: UniGRUConfig, d_target, label_to_id):
    Xs, ys = [], []
    for f in files:
        c = load_clip(f)
        X = fix_dim(c.X.astype(np.float32), d_target)
        X = trim_by_activity(X, cfg.t_target, cfg.margin, cfg.quantile,
                             cfg.min_keep)
        X = zscore_per_clip(X)
        if cfg.use_deltas:
            X = zscore_per_clip(add_deltas(X))
        Xs.append(X)
        ys.append(label_to_id[c.label])
    return np.stack(Xs).astype(np.float32), np.asarray(ys, np.int32)


def train_unigru(cfg: UniGRUConfig = UniGRUConfig(), verbose=True) -> dict:
    from collections import Counter

    index = scan_corpus(cfg.clip_dir, verbose=False)
    label_to_id, id_to_label = build_label_maps(index.labels)
    d_target = max(index.dims)
    # console contract: inactive/train_model_1130pm.py:162-171
    if verbose:
        print("Words:", sorted(label_to_id))
        print("Counts:", Counter(index.labels))
        print("Using d_target =", d_target)
    rng_py = np.random.default_rng(cfg.seed)
    order = rng_py.permutation(len(index.files))
    n_train = int(cfg.train_frac * len(order))
    tr_files = [index.files[i] for i in order[:n_train]]
    va_files = [index.files[i] for i in order[n_train:]]

    Xtr, ytr = _unigru_preprocess(tr_files, cfg, d_target, label_to_id)
    Xva, yva = _unigru_preprocess(va_files, cfg, d_target, label_to_id)
    d_in = Xtr.shape[-1]
    num_classes = len(label_to_id)

    key = jax.random.PRNGKey(cfg.seed)
    key, k0 = jax.random.split(key)
    params = V.init_unigru_classifier(k0, d_in, num_classes, hidden=cfg.hidden)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
    opt_state = opt.init(params)

    def loss_fn(params, X, y, rng):
        logits = V.unigru_classifier_forward(params, X, train=True, rng=rng)
        onehot = jax.nn.one_hot(y, num_classes)
        loss = jnp.mean(optax.softmax_cross_entropy(logits, onehot))
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, X, y):
        rng, sub = jax.random.split(rng)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, X, y, sub)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss, acc

    fwd = jax.jit(lambda p, X: V.unigru_classifier_forward(p, X))
    best, best_params = 0.0, jax.tree.map(np.asarray, params)
    meta = dict(d_in=d_in, num_classes=num_classes,
                word_to_id=label_to_id,
                id_to_word={str(k): v for k, v in id_to_label.items()},
                t_target=cfg.t_target, d_target=d_target,
                use_deltas=cfg.use_deltas,
                trim=dict(q=cfg.quantile, margin=cfg.margin,
                          min_keep=cfg.min_keep),
                seed=cfg.seed, model="unigru")
    history = []
    sampler = np.random.default_rng(cfg.seed)
    for ep in range(1, cfg.epochs + 1):
        order = sampler.permutation(len(Xtr))
        ep_loss, ep_acc, nb = 0.0, 0.0, 0
        for s in range(0, len(Xtr), cfg.batch_size):
            idx = order[s:s + cfg.batch_size]
            params, opt_state, key, loss, tr_acc = step(
                params, opt_state, key, jnp.asarray(Xtr[idx]),
                jnp.asarray(ytr[idx]))
            ep_loss += float(loss)
            ep_acc += float(tr_acc)
            nb += 1
        acc = _epoch_eval(fwd, params, Xva, yva)
        history.append(dict(epoch=ep, loss=ep_loss / max(1, nb), val_acc=acc))
        if verbose:
            # per-epoch console contract (train_model_1130pm.py:227)
            print(f"ep {ep:03d} | loss {ep_loss / max(1, nb):.4f} | "
                  f"train {ep_acc / max(1, nb):.3f} | val {acc:.3f}")
        if acc > best:
            best = acc
            best_params = jax.tree.map(np.asarray, params)
            save_checkpoint(cfg.out_path, best_params, meta)
            if verbose:
                print(f"  saved {cfg.out_path} (best val {best:.3f})")
    if verbose:
        print("best val:", best)
    return dict(best_acc=best, params=best_params, meta=meta, history=history)


# ----------------------------------------------------------------------------
# train_mlp_quick (inactive/train_5_quick.py)
# ----------------------------------------------------------------------------

@dataclasses.dataclass
class MLPQuickConfig:
    clip_dir: str = "clips_npz"
    out_path: str = "word_model_mlp.ckpt"
    seed: int = 42
    batch_size: int = 32
    epochs: int = 60
    lr: float = 1e-3
    train_frac: float = 0.70
    val_frac: float = 0.15


def train_mlp_quick(cfg: MLPQuickConfig = MLPQuickConfig(), verbose=True) -> dict:
    from collections import Counter

    index = scan_corpus(cfg.clip_dir, verbose=False)
    label_to_id, id_to_label = build_label_maps(index.labels)
    # console contract: inactive/train_5_quick.py:64-66,98
    if verbose:
        by_label = Counter(index.labels)
        print("Label counts:")
        for l in sorted(by_label):
            print(f"  {l:7s}: {by_label[l]}")
    tr_f, va_f, te_f = stratified_split_3way(
        index.files, index.labels, seed=cfg.seed,
        train_frac=cfg.train_frac, val_frac=cfg.val_frac)
    if verbose:
        print(f"Split sizes: train={len(tr_f)} val={len(va_f)} "
              f"test={len(te_f)}")

    def to_feats(files):
        feats, ys = [], []
        for f in files:
            c = load_clip(f)
            feats.append(np.concatenate([c.X.mean(0), c.X.std(0)]))
            ys.append(label_to_id[c.label])
        if not feats:  # tiny corpora can yield an empty test split
            d = 2 * load_clip(index.files[0]).D
            return np.zeros((0, d), np.float32), np.zeros((0,), np.int32)
        return np.stack(feats).astype(np.float32), np.asarray(ys, np.int32)

    Xtr, ytr = to_feats(tr_f)
    Xva, yva = to_feats(va_f)
    Xte, yte = to_feats(te_f)
    in_dim, num_classes = Xtr.shape[-1], len(label_to_id)

    key = jax.random.PRNGKey(cfg.seed)
    key, k0 = jax.random.split(key)
    params = V.init_mlp(k0, in_dim, num_classes)
    opt = make_optimizer(cfg.lr, grad_clip_norm=1e9)
    opt_state = opt.init(params)

    def loss_fn(params, X, y, rng):
        logits = V.mlp_forward(params, X, train=True, rng=rng)
        return jnp.mean(
            optax.softmax_cross_entropy(logits, jax.nn.one_hot(y, num_classes)))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, X, y):
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(params, X, y, sub)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    fwd = jax.jit(lambda p, X: V.mlp_forward(p, X))
    best, best_params = 0.0, jax.tree.map(np.asarray, params)
    meta = dict(in_dim=in_dim, labels=sorted(label_to_id),
                label_to_id=label_to_id,
                id_to_label={str(k): v for k, v in id_to_label.items()},
                seed=cfg.seed, model="summary_mlp")
    sampler = np.random.default_rng(cfg.seed)
    for ep in range(1, cfg.epochs + 1):
        order = sampler.permutation(len(Xtr))
        ep_loss, nb = 0.0, 0
        for s in range(0, len(Xtr), cfg.batch_size):
            idx = order[s:s + cfg.batch_size]
            params, opt_state, key, loss = step(
                params, opt_state, key, jnp.asarray(Xtr[idx]),
                jnp.asarray(ytr[idx]))
            ep_loss += float(loss)
            nb += 1
        acc = _epoch_eval(fwd, params, Xva, yva)
        if verbose:
            # per-epoch console contract (train_5_quick.py:129)
            print(f"ep {ep:02d} | train loss {ep_loss / max(1, nb):.4f} | "
                  f"val acc {acc:.3f}")
        if acc > best:
            best = acc
            best_params = jax.tree.map(np.asarray, params)
            save_checkpoint(cfg.out_path, best_params, meta)
            if verbose:
                print(f"  saved {cfg.out_path} (best so far)")
    # final held-out TEST evaluation with the best checkpoint
    test_acc = _epoch_eval(fwd, best_params, Xte, yte)
    if verbose:
        print(f"TEST acc: {test_acc:.3f}")
    return dict(best_acc=best, test_acc=test_acc, params=best_params, meta=meta)
