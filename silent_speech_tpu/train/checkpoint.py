"""Checkpoint save/load — two interchangeable backends.

- ``npz`` (default): a single `.npz` file holding every leaf array under a
  '/'-joined tree path, plus a JSON metadata blob.
- ``orbax``: a checkpoint *directory* written by orbax.checkpoint (composite
  of a pytree state and a JSON metadata item), with optional async save —
  the idiomatic JAX format for sharded/multi-host arrays (SURVEY.md section 5
  checkpoint bullet).

Both carry the same metadata keys as the reference checkpoints so tooling that
reads them keeps working (train_model_official.py:489-500: x_dim, max_t,
use_roi, roi_w, roi_h, labels, label_to_id, id_to_label, seed; loader-side
gru_layers default live_infer_official.py:209; CTC extras
inactive/train_model.py:258-266). ``load_checkpoint`` auto-detects the backend
(directory = orbax, file = npz), so resume and the Predictor work with either.

Optimizer state can be saved alongside for true resume — a capability the
reference lacks (it only ever saves best-val model weights).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import numpy as np

_META_KEY = "__meta_json__"
_OPT_PREFIX = "__opt__/"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix.rstrip("/") + "#none"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    if not flat:
        return {}
    # leaf?
    if list(flat.keys()) == [""]:
        return flat[""]
    groups: dict[str, dict] = {}
    for k, v in flat.items():
        if k.endswith("#none") and "/" not in k:
            return None
        head, _, rest = k.partition("/")
        if head.endswith("#none") and rest == "":
            groups.setdefault(head[: -len("#none")], {})[""] = None
            continue
        groups.setdefault(head, {})[rest] = v
    if all(k.isdigit() for k in groups):
        return [
            _unflatten_or_none(groups[str(i)]) for i in range(len(groups))
        ]
    return {k: _unflatten_or_none(v) for k, v in groups.items()}


def _unflatten_or_none(sub):
    if list(sub.keys()) == [""] and sub[""] is None:
        return None
    return _unflatten(sub)


def save_checkpoint(
    path: str,
    params: Any,
    meta: dict,
    opt_state_arrays: Optional[Any] = None,
    *,
    format: str = "npz",
    async_save: bool = False,
) -> str:
    """Write params (+ optional optimizer-state pytree) and metadata.

    ``format='orbax'`` writes an orbax checkpoint directory instead of the
    single-file npz; ``async_save`` (orbax only) returns as soon as the arrays
    are staged, committing in the background.
    """
    if format == "orbax":
        return save_checkpoint_orbax(
            path, params, meta, opt_state_arrays, async_save=async_save
        )
    if format != "npz":
        raise ValueError(f"unknown checkpoint format {format!r}")
    payload = {f"p/{k}": v for k, v in _flatten(params).items()}
    if opt_state_arrays is not None:
        payload.update(
            {f"{_OPT_PREFIX}{k}": v for k, v in _flatten(opt_state_arrays).items()}
        )
    payload[_META_KEY] = np.frombuffer(
        json.dumps(meta, default=_json_default).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    # numpy appends .npz to the temp name
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


# ----------------------------------------------------------------------------
# Orbax backend
# ----------------------------------------------------------------------------

_ORBAX_NONE = "__none__"  # orbax drops None pytree leaves; keep a sentinel


def _mask_none(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _mask_none(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_mask_none(v) for v in tree]
    if tree is None:
        return _ORBAX_NONE
    return np.asarray(tree)


def _unmask_none(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _unmask_none(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_unmask_none(v) for v in tree]
    if isinstance(tree, str) and tree == _ORBAX_NONE:
        return None
    return tree


_ASYNC_CHECKPOINTERS: list = []  # keep async writers alive until finalized


def save_checkpoint_orbax(
    path: str,
    params: Any,
    meta: dict,
    opt_state_arrays: Optional[Any] = None,
    *,
    async_save: bool = False,
) -> str:
    import orbax.checkpoint as ocp

    # serialize with any in-flight async save (same-path tmp-dir collisions);
    # the previous save still overlapped the epoch of compute that followed it
    wait_for_async_saves()
    path = os.path.abspath(path)
    # write to a sibling tmp dir and swap only after the save has committed:
    # the previous checkpoint (dir OR npz file — e.g. retraining over an
    # npz-format path) survives any crash during the new save
    tmp = path + ".orbax-tmp"
    _remove_path(tmp)
    state = {"params": _mask_none(params)}
    if opt_state_arrays is not None:
        state["opt"] = _mask_none(opt_state_arrays)
    meta_json = json.loads(json.dumps(meta, default=_json_default))
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        meta=ocp.args.JsonSave(meta_json),
    )
    if async_save:
        import atexit

        if not _ASYNC_CHECKPOINTERS and not getattr(
                wait_for_async_saves, "_atexit_registered", False):
            # a committed-but-unswapped save must not be stranded in the tmp
            # dir if the process exits before the next save/wait (data-loss
            # window: the 'saved' message already printed)
            atexit.register(wait_for_async_saves)
            wait_for_async_saves._atexit_registered = True
        ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
        ckptr.save(tmp, args=args)
        _ASYNC_CHECKPOINTERS.append((ckptr, tmp, path))
    else:
        with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
            ckptr.save(tmp, args=args)
        _swap_into_place(tmp, path)
    return path


def _remove_path(p: str) -> None:
    if os.path.isdir(p):
        shutil.rmtree(p)
    elif os.path.exists(p):
        os.remove(p)


def _swap_into_place(tmp: str, path: str) -> None:
    """Replace ``path`` with ``tmp`` keeping one valid checkpoint on disk at
    every instant: the old checkpoint is renamed aside to a .bak sibling,
    the new one renamed in, then the .bak removed — a crash between any two
    steps leaves either the new checkpoint at ``path`` or the old one at
    ``path``/``path.bak`` (never neither)."""
    bak = path + ".bak"
    _remove_path(bak)  # stale .bak from an earlier crash
    had_old = os.path.exists(path)
    if had_old:
        os.rename(path, bak)
    os.rename(tmp, path)
    if had_old:
        _remove_path(bak)


def wait_for_async_saves() -> None:
    """Block until every pending async orbax save has committed, then swap
    each committed tmp dir into its final path."""
    while _ASYNC_CHECKPOINTERS:
        ckptr, tmp, path = _ASYNC_CHECKPOINTERS.pop()
        ckptr.wait_until_finished()
        ckptr.close()
        _swap_into_place(tmp, path)


def load_checkpoint_orbax(path: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                meta=ocp.args.JsonRestore(),
            ),
        )
    state = _unmask_none(restored["state"])
    meta = dict(restored["meta"])
    return state["params"], meta, state.get("opt")


def load_checkpoint(path: str):
    """Returns (params, meta, opt_state_arrays_or_None).

    Auto-detects the backend: an orbax checkpoint is a directory, the npz
    format is a single file.
    """
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z[_META_KEY]).decode())
        pflat, oflat = {}, {}
        for k in z.files:
            if k == _META_KEY:
                continue
            if k.startswith("p/"):
                pflat[k[2:]] = z[k]
            elif k.startswith(_OPT_PREFIX):
                oflat[k[len(_OPT_PREFIX) :]] = z[k]
    params = _unflatten(pflat)
    opt = _unflatten(oflat) if oflat else None
    return params, meta, opt


def reference_meta(
    *,
    x_dim: int,
    max_t: int,
    use_roi: bool,
    roi_w: int,
    roi_h: int,
    labels: list[str],
    label_to_id: dict[str, int],
    id_to_label: dict[int, str],
    seed: int,
    gru_layers: int = 2,
    **extra,
) -> dict:
    """The reference checkpoint metadata contract."""
    meta = dict(
        x_dim=x_dim,
        max_t=max_t,
        use_roi=use_roi,
        roi_w=roi_w,
        roi_h=roi_h,
        labels=list(labels),
        label_to_id={str(k): int(v) for k, v in label_to_id.items()},
        id_to_label={str(k): str(v) for k, v in id_to_label.items()},
        seed=seed,
        gru_layers=gru_layers,
    )
    meta.update(extra)
    return meta
